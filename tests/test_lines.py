"""CCNet-style line-level boilerplate detection / removal
(:mod:`lsearch_ray.functions.lines`) — hand fixtures with REAL
newline-structured texts plus a pure-Python brute-force reference on a
randomized corpus, and the reflow segmentation against its own
reference."""

from __future__ import annotations

import random
from collections import Counter

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions import (
    boilerplate_lines_ds,
    line_dedup_ds,
    reflow_lines_ds,
)


def _ref_boiler(texts: dict[int, str], min_docs: int):
    """Brute-force: df = distinct docs containing the line; output
    sorted by (df desc, line asc); removal drops member lines in order.
    '' splits to [''] — one empty line — matching the engine/SQL."""
    lines = {d: t.split("\n") for d, t in texts.items()}
    df = Counter()
    for ls in lines.values():
        for ln in set(ls):
            df[ln] += 1
    boiler = sorted(
        ((ln, c) for ln, c in df.items() if c >= min_docs),
        key=lambda x: (-x[1], x[0]),
    )
    dedup = {}
    for d, ls in lines.items():
        kept = [ln for ln in ls if df[ln] < min_docs]
        dedup[d] = ("\n".join(kept), len(ls), len(ls) - len(kept))
    return boiler, dedup


def _run(texts: dict[int, str], min_docs: int, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": [texts[k] for k in sorted(texts)],
        }
    )
    ds = rd.from_arrow(t)
    bl = boilerplate_lines_ds(ds, min_docs=min_docs, **kw).to_pandas()
    ld = line_dedup_ds(ds, min_docs=min_docs, **kw).to_pandas()
    return bl, ld


def _check(texts: dict[int, str], min_docs: int, **kw):
    e_bl, e_ld = _run(texts, min_docs, **kw)
    r_bl, r_ld = _ref_boiler(texts, min_docs)
    assert list(zip(e_bl["line"], e_bl["df"])) == r_bl
    assert list(e_ld["doc_id"]) == sorted(texts)
    for _, row in e_ld.iterrows():
        assert (
            row["text"],
            row["n_lines"],
            row["removed_lines"],
        ) == r_ld[row["doc_id"]], f"doc {row['doc_id']}"


def test_hand_fixture():
    texts = {
        1: "cookie banner\nreal content one\nfooter",
        2: "cookie banner\nreal content two\nfooter",
        3: "unique page\nall original",
        4: "cookie banner",
        5: "",
    }
    bl, ld = _run(texts, 2)
    assert list(zip(bl["line"], bl["df"])) == [
        ("cookie banner", 3),
        ("footer", 2),
    ]
    r = ld.set_index("doc_id")
    assert r.loc[1, "text"] == "real content one"
    assert r.loc[1, "n_lines"] == 3 and r.loc[1, "removed_lines"] == 2
    assert r.loc[2, "text"] == "real content two"
    assert r.loc[3, "text"] == "unique page\nall original"
    assert r.loc[3, "removed_lines"] == 0
    # doc 4 is ALL boilerplate -> empty string, still present
    assert r.loc[4, "text"] == "" and r.loc[4, "removed_lines"] == 1
    # the empty text is ONE empty line with df 1 -> untouched
    assert r.loc[5, "text"] == "" and r.loc[5, "n_lines"] == 1
    assert r.loc[5, "removed_lines"] == 0
    _check(texts, 2)


def test_within_doc_repeat_counts_once():
    # a line repeated inside ONE doc has df 1 (distinct docs) and stays;
    # once a second doc carries it, BOTH occurrences are removed
    texts = {1: "x\ny\nx", 2: "z"}
    _, ld = _run(texts, 2)
    assert ld.set_index("doc_id").loc[1, "text"] == "x\ny\nx"
    texts[2] = "x"
    bl, ld = _run(texts, 2)
    assert list(zip(bl["line"], bl["df"])) == [("x", 2)]
    r = ld.set_index("doc_id")
    assert r.loc[1, "text"] == "y" and r.loc[1, "removed_lines"] == 2
    assert r.loc[2, "text"] == "" and r.loc[2, "removed_lines"] == 1
    _check(texts, 2)


def test_min_docs_threshold():
    texts = {1: "a\nb", 2: "a\nc", 3: "a\nd"}
    bl, ld = _run(texts, 3)
    assert list(zip(bl["line"], bl["df"])) == [("a", 3)]
    assert all(ld["removed_lines"] == 1)
    _check(texts, 3)


def test_randomized_brute_force():
    rng = random.Random(1234)
    pool = [f"line {i}" for i in range(30)]
    for trial in range(3):
        texts = {
            d: "\n".join(
                rng.choice(pool) for _ in range(rng.randrange(0, 12))
            )
            for d in range(40)
        }
        _check(texts, 2, num_partitions=5)
        _check(texts, 3, num_partitions=5)


def _ref_reflow(text: str, k: int) -> str:
    words = text.split(" ")
    return "\n".join(
        " ".join(words[i : i + k]) for i in range(0, len(words), k)
    )


def test_reflow_matches_reference():
    rng = random.Random(99)
    texts = [
        " ".join(rng.choice("abcdefg") for _ in range(rng.randrange(0, 23)))
        for _ in range(50)
    ] + ["", "solo"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
        }
    )
    for k in (1, 3, 5):
        got = (
            reflow_lines_ds(rd.from_arrow(t), words_per_line=k)
            .sort("doc_id")
            .to_pandas()
        )
        assert list(got["text"]) == [_ref_reflow(tx, k) for tx in texts]
