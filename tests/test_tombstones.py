"""Deletion (tombstones) + compaction semantics.

Contract: tombstoned docs vanish from ALL query paths immediately; corpus
stats keep counting them until compact_index, after which the index is
byte-identical to a fresh build over the live corpus.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.corpus import assign_doc_ids, make_corpus
from lsearch_ray.index.build import IndexMeta, build_index
from lsearch_ray.index.golden import golden_index
from lsearch_ray.index.search import (
    BatchSearcher,
    QueryEngine,
    phrase_search,
    search_index,
)
from lsearch_ray.index.tombstones import (
    compact_index,
    delete_docs,
    load_tombstones,
)


def _corpus(n=400, seed=13):
    corpus = assign_doc_ids(make_corpus(n, seed=seed))
    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    return corpus.take(pa.array(first))


def _digest(index_dir: str, num_shards: int) -> str:
    h = hashlib.sha256()
    for s in range(num_shards):
        with open(
            os.path.join(index_dir, f"shard={s:05d}", "postings.parquet"), "rb"
        ) as f:
            h.update(f.read())
    return h.hexdigest()


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    corpus = _corpus()
    index_dir = str(tmp_path_factory.mktemp("tomb") / "index")
    build_index(
        rd.from_arrow(corpus.select(["doc_id", "text"])),
        index_dir,
        num_shards=3,
        positions=True,
    )
    golden = golden_index(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist())
    return index_dir, golden, corpus


def _expected_after_delete(golden, query, deleted, k, mode="or"):
    """Masked-at-query-time semantics: live docs keep their scores (stats
    still count deleted docs), deleted docs just drop out of the ranking."""
    full = golden.bm25(query, k=10_000, mode=mode)
    return [(d, s) for d, s in full if d not in deleted][:k]


def test_deleted_docs_vanish_from_all_paths(built):
    index_dir, golden, corpus = built
    q = "the data"
    before = search_index(index_dir, q, k=5)
    assert before.num_rows
    deleted = set(before["doc_id"].to_pylist()[:2])  # kill the top 2
    delete_docs(index_dir, deleted)
    try:
        want = _expected_after_delete(golden, q, deleted, k=5)
        got = search_index(index_dir, q, k=5)
        assert got["doc_id"].to_pylist() == [d for d, _ in want]
        assert got["score"].to_pylist() == [s for _, s in want]
        # streaming path
        qt = pa.table(
            {"query_id": pa.array([0], type=pa.int64()), "query": [q]}
        )
        bs = BatchSearcher(index_dir, k=5)(qt)
        assert bs["doc_id"].to_pylist() == [d for d, _ in want]
        # scatter-gather path
        eng = QueryEngine(index_dir, num_actors=2)
        sg = eng.search(q, k=5)
        assert sg["doc_id"].to_pylist() == [d for d, _ in want]
        assert sg["score"].to_pylist() == [s for _, s in want]
    finally:
        # clear tombstones for the other tests in this module
        for s in range(3):
            p = os.path.join(index_dir, f"shard={s:05d}", "tombstones.parquet")
            if os.path.exists(p):
                os.remove(p)


def test_deleted_docs_vanish_from_phrase(built):
    index_dir, golden, corpus = built
    from lsearch_ray.analyzer import tokenize

    # find a phrase with >= 2 matching docs
    for text in corpus["text"].to_pylist():
        toks = tokenize(text)
        if len(toks) < 2:
            continue
        p = f"{toks[0]} {toks[1]}"
        want = golden.phrase_bm25(p, k=10_000)
        if len(want) >= 2:
            break
    else:
        pytest.skip("no multi-doc phrase")
    victim = want[0][0]
    delete_docs(index_dir, [victim])
    try:
        got = phrase_search(index_dir, p, k=10_000)
        assert victim not in got["doc_id"].to_pylist()
        assert got["doc_id"].to_pylist() == [
            d for d, _ in want if d != victim
        ]
    finally:
        for s in range(3):
            fp = os.path.join(index_dir, f"shard={s:05d}", "tombstones.parquet")
            if os.path.exists(fp):
                os.remove(fp)


def test_compaction_byte_identical_to_fresh_build(tmp_path):
    corpus = _corpus(n=300, seed=29)
    all_ids = corpus["doc_id"].to_pylist()
    victims = set(all_ids[::7])
    d_full = str(tmp_path / "full")
    build_index(
        rd.from_arrow(corpus.select(["doc_id", "text"])),
        d_full,
        num_shards=3,
        positions=True,
    )
    delete_docs(d_full, victims)
    meta_c = compact_index(d_full)
    # fresh build over the live corpus only
    keep_mask = pa.array([i not in victims for i in all_ids])
    live = corpus.filter(keep_mask)
    d_live = str(tmp_path / "live")
    build_index(
        rd.from_arrow(live.select(["doc_id", "text"])),
        d_live,
        num_shards=3,
        positions=True,
    )
    assert _digest(d_full, 3) == _digest(d_live, 3)
    meta_l = IndexMeta.load(d_live)
    assert meta_c.n_docs == meta_l.n_docs
    assert meta_c.avgdl == meta_l.avgdl
    assert len(load_tombstones(d_full)) == 0  # cleared after commit
    # compaction is idempotent
    compact_index(d_full)
    assert _digest(d_full, 3) == _digest(d_live, 3)


def test_delete_then_compact_matches_live_golden(tmp_path):
    corpus = _corpus(n=250, seed=31)
    all_ids = corpus["doc_id"].to_pylist()
    victims = set(all_ids[::5])
    d = str(tmp_path / "idx")
    build_index(
        rd.from_arrow(corpus.select(["doc_id", "text"])), d, num_shards=2
    )
    delete_docs(d, victims)
    compact_index(d)
    texts = corpus["text"].to_pylist()
    live_golden = golden_index(
        [i for i in all_ids if i not in victims],
        [t for i, t in zip(all_ids, texts) if i not in victims],
    )
    for q in ["the data", "word003", "music theory biology"]:
        got = search_index(d, q, k=10)
        want = live_golden.bm25(q, k=10)
        assert got["doc_id"].to_pylist() == [w[0] for w in want], q
        assert got["score"].to_pylist() == [w[1] for w in want], q


def test_deleted_docs_vanish_in_forced_lazy_path(built, monkeypatch):
    """Pin the cutoffs so the pruned lazy branch runs WITH tombstones:
    the θ lead mask and keep_set drop must produce the same masked
    semantics as the exhaustive path."""
    import lsearch_ray.index.search as S

    index_dir, golden, corpus = built
    monkeypatch.setattr(S, "EXHAUSTIVE_CUTOFF", 0)
    monkeypatch.setattr(S, "SPARSE_DECODE_LIMIT", 10)
    q = "the data"
    before = search_index(index_dir, q, k=5)
    deleted = set(before["doc_id"].to_pylist()[:2])
    delete_docs(index_dir, deleted)
    try:
        want = _expected_after_delete(golden, q, deleted, k=5)
        got = search_index(index_dir, q, k=5)
        assert got["doc_id"].to_pylist() == [d for d, _ in want]
        assert got["score"].to_pylist() == [s for _, s in want]
    finally:
        for s in range(3):
            fp = os.path.join(index_dir, f"shard={s:05d}", "tombstones.parquet")
            if os.path.exists(fp):
                os.remove(fp)


def test_compaction_preserves_tokenless_doc_stats(tmp_path):
    """Live token-less docs must stay in n_docs/avgdl through compaction
    (the manifest adjustment path, not a postings recount)."""
    texts = ["", "alpha beta gamma", "", "alpha alpha", "delta beta"]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), type=pa.int64()),
            "text": texts,
        }
    )
    d = str(tmp_path / "tl")
    build_index(rd.from_arrow(t), d, num_shards=2)
    delete_docs(d, [3])  # delete a doc WITH postings
    meta = compact_index(d)
    # fresh build over live corpus (keeps both empty docs)
    live = t.filter(pa.array([i != 3 for i in range(5)]))
    d2 = str(tmp_path / "tl_fresh")
    build_index(rd.from_arrow(live), d2, num_shards=2)
    fresh = IndexMeta.load(d2)
    assert meta.n_docs == fresh.n_docs == 4
    assert meta.avgdl == fresh.avgdl
    # and deleting an EMPTY doc adjusts counts too
    delete_docs(d, [0])
    meta2 = compact_index(d)
    assert meta2.n_docs == 3


def test_compaction_rerun_does_not_double_subtract(tmp_path):
    """Simulate a crash between a shard's manifest commit and its
    tombstone removal: re-running compaction must skip the shard (digest
    match) instead of subtracting the counts again."""
    import shutil

    corpus = _corpus(n=200, seed=41)
    d = str(tmp_path / "idem")
    build_index(
        rd.from_arrow(corpus.select(["doc_id", "text"])), d, num_shards=2
    )
    victims = corpus["doc_id"].to_pylist()[:10]
    delete_docs(d, victims)
    # snapshot tombstone files, compact, then restore them (= the crash
    # window where the manifest committed but the tombstone file survived)
    saved = {}
    for s in range(2):
        p = os.path.join(d, f"shard={s:05d}", "tombstones.parquet")
        if os.path.exists(p):
            saved[s] = p + ".bak"
            shutil.copy(p, saved[s])
    meta1 = compact_index(d)
    for s, bak in saved.items():
        shutil.move(bak, os.path.join(d, f"shard={s:05d}", "tombstones.parquet"))
    meta2 = compact_index(d)
    expected = corpus.num_rows - 10
    assert meta2.n_docs == meta1.n_docs == expected
    assert meta2.avgdl == meta1.avgdl
    assert len(load_tombstones(d)) == 0


def test_fs_compaction_byte_identical_to_local(tmp_path):
    """delete_docs + compact_index against a generic pyarrow.fs target
    (SubTreeFileSystem — the no-rename publish protocol) produce bytes
    identical to the plain local-path maintenance path."""
    from pyarrow import fs as pafs

    corpus = _corpus(n=250, seed=33)
    all_ids = corpus["doc_id"].to_pylist()
    victims = set(all_ids[::6])
    docs = rd.from_arrow(corpus.select(["doc_id", "text"]))

    d_local = str(tmp_path / "local")
    build_index(docs, d_local, num_shards=3, positions=True)
    delete_docs(d_local, victims)
    compact_index(d_local)

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    build_index(docs, "viafs", num_shards=3, filesystem=fs, positions=True)
    delete_docs("viafs", victims, filesystem=fs)
    meta = compact_index("viafs", filesystem=fs)
    d_fs = str(tmp_path / "viafs")

    assert _digest(d_local, 3) == _digest(d_fs, 3)
    assert meta.n_docs == IndexMeta.load(d_local).n_docs
    assert len(load_tombstones("viafs", filesystem=fs)) == 0
