"""JSONL / CSV interchange sources (:mod:`lsearch_ray.sources.textio`)
— roundtrip fidelity against the in-memory original, plus the
directory-reset contract re-runs rely on."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from lsearch_ray.sources import textio


def _corpus() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": [f"doc {i} words here" for i in range(40)],
            "n": pa.array([i * 7 for i in range(40)], type=pa.int64()),
        }
    )


def _roundtrip(fmt: str, tmp_path) -> None:
    t = _corpus()
    path = str(tmp_path / f"rt_{fmt}")
    getattr(textio, f"to_{fmt}")(rd.from_arrow(t), path)
    assert os.path.isdir(path) and os.listdir(path)
    back = getattr(textio, f"read_{fmt}")(path)
    got = back.select_columns(["doc_id", "text", "n"]).sort("doc_id").to_pandas()
    assert list(got["doc_id"]) == list(range(40))
    assert list(got["text"]) == list(t["text"].to_pylist())
    assert list(got["n"]) == t["n"].to_pylist()
    assert str(got["n"].dtype) == "int64"


def test_jsonl_roundtrip(tmp_path):
    _roundtrip("jsonl", tmp_path)


def test_csv_roundtrip(tmp_path):
    _roundtrip("csv", tmp_path)


def test_writer_resets_directory(tmp_path):
    path = str(tmp_path / "rt")
    textio.to_jsonl(rd.from_arrow(_corpus()), path)
    stale = set(os.listdir(path))
    # a second write must not mix shard generations
    textio.to_jsonl(rd.from_arrow(_corpus().slice(0, 5)), path)
    back = textio.read_jsonl(path).to_pandas()
    assert len(back) == 5
    assert not (stale & set(os.listdir(path))) or len(os.listdir(path)) <= len(stale)


def test_jsonl_gz_roundtrip_bytes_are_gzip_and_values_exact():
    import glob
    import os

    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.sources.textio import read_jsonl_gz, to_jsonl_gz

    t = pa.table(
        {
            "doc_id": pa.array([3, 1, 2], pa.int64()),
            "text": ["a b", "", "line with spaces"],
        }
    )
    path = "/tmp/lsearch_textio_test_gz"
    to_jsonl_gz(rd.from_arrow(t).repartition(2), path)
    files = glob.glob(os.path.join(path, "*"))
    assert files
    for f in files:  # every shard is a real gzip member
        with open(f, "rb") as fh:
            assert fh.read(2) == b"\x1f\x8b"
    back = (
        read_jsonl_gz(path)
        .sort("doc_id")
        .to_pandas()
    )
    assert list(back["doc_id"]) == [1, 2, 3]
    assert list(back["text"]) == ["", "line with spaces", "a b"]
