"""Index merge: byte-identical to a direct build over the union corpus."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.corpus import assign_doc_ids, make_corpus
from lsearch_ray.index.build import build_index
from lsearch_ray.index.merge import decode_all_postings, merge_indexes


def _dedup(t: pa.Table) -> pa.Table:
    first = np.sort(np.unique(t["doc_id"].to_numpy(), return_index=True)[1])
    return t.take(pa.array(first))


def _digest(index_dir: str, num_shards: int) -> str:
    h = hashlib.sha256()
    for s in range(num_shards):
        with open(
            os.path.join(index_dir, f"shard={s:05d}", "postings.parquet"), "rb"
        ) as f:
            h.update(f.read())
    return h.hexdigest()


def test_merge_equals_direct_build(tmp_path):
    a = _dedup(assign_doc_ids(make_corpus(300, seed=21)))
    b = _dedup(assign_doc_ids(make_corpus(300, seed=22)))
    # ensure id-disjoint (different seeds → different urls; drop collisions)
    ids_a = set(a["doc_id"].to_pylist())
    mask = [i not in ids_a for i in b["doc_id"].to_pylist()]
    b = b.filter(pa.array(mask))
    union = pa.concat_tables([a, b])

    d_a, d_b, d_u, d_m = (str(tmp_path / n) for n in ["a", "b", "u", "m"])
    build_index(rd.from_arrow(a.select(["doc_id", "text"])), d_a, num_shards=4)
    build_index(rd.from_arrow(b.select(["doc_id", "text"])), d_b, num_shards=4)
    build_index(rd.from_arrow(union.select(["doc_id", "text"])), d_u, num_shards=4)
    meta = merge_indexes([d_a, d_b], d_m)

    assert meta.n_docs == union.num_rows
    assert _digest(d_m, 4) == _digest(d_u, 4)


def test_decode_all_postings_roundtrip(tmp_path):
    corpus = _dedup(assign_doc_ids(make_corpus(200, seed=31)))
    d = str(tmp_path / "idx")
    build_index(rd.from_arrow(corpus.select(["doc_id", "text"])), d, num_shards=2)
    import pyarrow.parquet as pq

    from lsearch_ray.index.build import encode_shard_table

    t = pq.read_table(os.path.join(d, "shard=00000", "postings.parquet"))
    flat = decode_all_postings(t, 128)
    assert flat.num_rows == int(pa.compute.sum(t["df"]).as_py())
    # re-encoding the decoded triples reproduces the same postings
    re_dir = str(tmp_path / "re")
    os.makedirs(re_dir)
    encode_shard_table(flat, re_dir, 0, 128)
    t2 = pq.read_table(os.path.join(re_dir, "shard=00000", "postings.parquet"))
    assert t2.equals(t)


def test_merge_carries_round2_invariants(tmp_path):
    """merge_indexes must carry token-less doc counts, apply tombstones,
    and round-trip positions (the three invariants a merge could drop)."""
    from lsearch_ray.index.golden import golden_index
    from lsearch_ray.index.search import phrase_search, search_index
    from lsearch_ray.index.tombstones import delete_docs

    t1 = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["alpha beta gamma", "", "beta beta delta"],
        }
    )
    t2 = pa.table(
        {
            "doc_id": pa.array([10, 11], type=pa.int64()),
            "text": ["alpha delta", "gamma gamma beta"],
        }
    )
    d1, d2, out = (str(tmp_path / x) for x in ("a", "b", "m"))
    build_index(rd.from_arrow(t1), d1, num_shards=2, positions=True)
    build_index(rd.from_arrow(t2), d2, num_shards=2, positions=True)
    delete_docs(d1, [3])  # masked, uncompacted
    meta = merge_indexes([d1, d2], out)
    # token-less doc 2 counted; deleted doc 3 not
    assert meta.n_docs == 4
    assert meta.has_positions
    golden = golden_index(
        [1, 2, 10, 11], ["alpha beta gamma", "", "alpha delta", "gamma gamma beta"]
    )
    assert meta.avgdl == golden.avgdl
    got = search_index(out, "beta", k=10)
    want = golden.bm25("beta", k=10)
    assert got["doc_id"].to_pylist() == [d for d, _ in want]
    assert got["score"].to_pylist() == [s for _, s in want]
    # positions survived the merge
    ph = phrase_search(out, "alpha beta", k=10)
    assert ph["doc_id"].to_pylist() == [1]
    # mixed positional/non-positional inputs rejected
    d3 = str(tmp_path / "np")
    build_index(rd.from_arrow(t2), d3, num_shards=2)
    with pytest.raises(ValueError):
        merge_indexes([d1, d3], str(tmp_path / "bad"))


def test_merge_via_pyarrow_fs_byte_identical(tmp_path):
    """merge_indexes against a generic pyarrow.fs target matches the
    local-path merge byte for byte."""
    from pyarrow import fs as pafs

    a = _dedup(assign_doc_ids(make_corpus(200, seed=41)))
    b = _dedup(assign_doc_ids(make_corpus(150, seed=43)))
    ids_a = set(a["doc_id"].to_pylist())
    b = b.filter(pa.array([i not in ids_a for i in b["doc_id"].to_pylist()]))
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(rd.from_arrow(a.select(["doc_id", "text"])), d1, num_shards=2)
    build_index(rd.from_arrow(b.select(["doc_id", "text"])), d2, num_shards=2)
    out_local = str(tmp_path / "m_local")
    merge_indexes([d1, d2], out_local)

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    merge_indexes(["a", "b"], "m_fs", filesystem=fs)

    assert _digest(out_local, 2) == _digest(str(tmp_path / "m_fs"), 2)
