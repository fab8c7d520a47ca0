"""Index build + BM25 rank-identity vs the pure-Python golden reference.

The north-rule correctness gate: top-k doc_ids AND float64 scores from the
distributed engine must equal golden.py exactly (rank-identical).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.corpus import assign_doc_ids, make_corpus
from lsearch_ray.index.build import IndexMeta, build_index
from lsearch_ray.index.golden import golden_index
from lsearch_ray.index.search import BatchSearcher, QueryEngine, search_index

QUERIES = [
    "biology",
    "the data search",
    "word042 chemistry",
    "zzz notfound",
    "index engine query ray",
    "THE Data",  # case fold
    "word001",
    "music history physics chemistry",
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    corpus = assign_doc_ids(make_corpus(800, seed=42))
    # dedupe by normalized url (doc_id is derived from url_norm)
    import pyarrow.compute as pc

    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    corpus = corpus.take(pa.array(first))
    index_dir = str(tmp_path_factory.mktemp("idx") / "index")
    docs = rd.from_arrow(corpus.select(["doc_id", "text"]))
    meta = build_index(docs, index_dir, num_shards=5)
    golden = golden_index(
        corpus["doc_id"].to_pylist(), corpus["text"].to_pylist()
    )
    return index_dir, meta, golden


def test_meta_stats(built):
    index_dir, meta, golden = built
    assert meta.n_docs == golden.n_docs
    assert meta.avgdl == pytest.approx(golden.avgdl, rel=1e-12)
    assert IndexMeta.load(index_dir).n_docs == golden.n_docs


@pytest.mark.parametrize("mode", ["or", "and"])
def test_search_index_rank_identical(built, mode):
    index_dir, meta, golden = built
    for q in QUERIES:
        want = golden.bm25(q, k=10, mode=mode)
        got = search_index(index_dir, q, k=10, mode=mode)
        got_pairs = list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
        assert [d for d, _ in got_pairs] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got_pairs, want):
            assert gs == ws, (q, gd, gs, ws)  # exact float64 equality


def test_batch_searcher_dataset(built):
    index_dir, meta, golden = built
    queries = rd.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
                "query": QUERIES,
            }
        )
    )
    out = queries.map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "k": 10, "mode": "or"},
        batch_format="pyarrow",
        batch_size=3,
        concurrency=2,
    )
    rows = out.take_all()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(QUERIES):
        want = golden.bm25(q, k=10, mode="or")
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q
        assert [r["score"] for r in got] == [s for _, s in want], q


def test_query_engine_scatter_gather(built):
    index_dir, meta, golden = built
    eng = QueryEngine(index_dir, num_actors=3)
    for q in QUERIES:
        want = golden.bm25(q, k=10, mode="or")
        got = eng.search(q, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q
        assert got["score"].to_pylist() == [s for _, s in want], q


def test_resume_skips_completed_and_is_byte_identical(built, tmp_path):
    """FIXTURES.md §4: delete half the shards, rerun → identical bytes."""
    import hashlib
    import shutil

    corpus = assign_doc_ids(make_corpus(300, seed=1))
    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    corpus = corpus.take(pa.array(first))
    docs = rd.from_arrow(corpus.select(["doc_id", "text"]))

    d1 = str(tmp_path / "idx1")
    build_index(docs, d1, num_shards=4)

    def digest(d):
        h = hashlib.sha256()
        for s in range(4):
            with open(os.path.join(d, f"shard={s:05d}", "postings.parquet"), "rb") as f:
                h.update(f.read())
        return h.hexdigest()

    full = digest(d1)
    # wipe shards 1 and 3, resume
    for s in (1, 3):
        shutil.rmtree(os.path.join(d1, f"shard={s:05d}"))
    meta2 = build_index(docs, d1, num_shards=4, resume=True)
    assert digest(d1) == full
    assert meta2.n_docs == corpus.num_rows


def test_empty_query(built):
    index_dir, _, _ = built
    out = search_index(index_dir, "!!! ???", k=10)
    assert out.num_rows == 0


def test_documents_table_end_to_end(built):
    """Same gate over the driver's documents.parquet (sf0.001)."""
    path = "/root/testdata/sf0.001/documents.parquet"
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    index_dir = "/tmp/lsr_test_docs_index"
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    build_index(docs, index_dir, num_shards=3)
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["doc_id", "text"])
    golden = golden_index(t["doc_id"].to_pylist(), t["text"].to_pylist())
    # pick some real terms from the corpus
    sample_text = t["text"][0].as_py()
    q = " ".join(sample_text.split()[:2])
    want = golden.bm25(q, k=10)
    got = search_index(index_dir, q, k=10)
    assert got["doc_id"].to_pylist() == [d for d, _ in want]
    assert got["score"].to_pylist() == [s for _, s in want]


def test_batch_searcher_cache_eviction(built):
    """Cache over capacity must keep the current batch's terms (a
    wholesale clear() used to KeyError on already-cached terms)."""
    index_dir, meta, golden = built
    s = BatchSearcher(index_dir, k=5, max_cached_terms=2)
    batch = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": ["the data search index"],
        }
    )
    out1 = s(batch)
    out2 = s(batch)  # second call: all terms cached, over capacity
    assert out1.equals(out2)
    assert len(s.cache) <= 4


def test_query_negation_all_paths(built):
    """-term clauses exclude docs containing the term, rank-identically
    across golden / one-shot / scatter-gather paths."""
    index_dir, meta, golden = built
    eng = QueryEngine(index_dir, num_actors=2)
    for q in ["the -data", "biology -the", "data search -zzz", "-the"]:
        want = golden.bm25(q, k=10)
        got = search_index(index_dir, q, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q
        assert got["score"].to_pylist() == [s for _, s in want], q
        got2 = eng.search(q, k=10)
        assert got2["doc_id"].to_pylist() == [d for d, _ in want], q
    # excluded docs really are gone
    plain = set(search_index(index_dir, "the", k=1000)["doc_id"].to_pylist())
    negated = set(search_index(index_dir, "the -data", k=1000)["doc_id"].to_pylist())
    with_data = set(search_index(index_dir, "data", k=1000)["doc_id"].to_pylist())
    assert negated == plain - with_data


def test_resume_from_triples_checkpoint_skips_stage_a(tmp_path):
    """With keep_triples=True, resuming after a stage-B loss must NOT
    re-scan the corpus: passing an unreadable docs dataset proves stage A
    is skipped (its checkpoint marker is honored)."""
    import shutil

    corpus = assign_doc_ids(make_corpus(200, seed=2))
    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    corpus = corpus.take(pa.array(first))
    d = str(tmp_path / "idx")
    build_index(
        rd.from_arrow(corpus.select(["doc_id", "text"])),
        d,
        num_shards=3,
        keep_triples=True,
    )
    shutil.rmtree(os.path.join(d, "shard=00001"))
    # a dataset that raises if anyone consumes it (read_parquet validates
    # paths eagerly, so poison a lazy map instead)
    def boom(b):
        raise RuntimeError("stage A must not re-run on resume")

    poison = rd.range(1).map_batches(boom, batch_format="pyarrow")
    meta = build_index(poison, d, num_shards=3, resume=True, keep_triples=True)
    assert meta.n_docs == corpus.num_rows


def test_query_engine_search_many(built):
    index_dir, meta, golden = built
    eng = QueryEngine(index_dir, num_actors=2)
    out = eng.search_many(QUERIES, k=10)
    by_q: dict[int, list] = {}
    for r in out.to_pylist():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(QUERIES):
        want = golden.bm25(q, k=10)
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q
        assert [r["score"] for r in got] == [s for _, s in want], q


def test_build_index_via_pyarrow_fs_byte_identical(tmp_path):
    """The stage-A external shuffle + encode + finalize run against a
    generic ``pyarrow.fs`` target (SubTreeFileSystem — NOT a
    LocalFileSystem, so the no-rename object-store publish protocol is
    exercised end to end) and produce byte-identical index artifacts."""
    import hashlib

    from pyarrow import fs as pafs

    corpus = assign_doc_ids(make_corpus(300, seed=9))
    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    corpus = corpus.take(pa.array(first))
    docs = rd.from_arrow(corpus.select(["doc_id", "text"]))

    local_dir = str(tmp_path / "idx_local")
    build_index(docs, local_dir, num_shards=4)

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    build_index(docs, "idx_fs", num_shards=4, filesystem=fs)
    fs_dir = str(tmp_path / "idx_fs")

    def digest(d, rel):
        with open(os.path.join(d, rel), "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    for s in range(4):
        rel = os.path.join(f"shard={s:05d}", "postings.parquet")
        assert digest(local_dir, rel) == digest(fs_dir, rel), rel
    assert digest(local_dir, os.path.join("termstats", "part-0.parquet")) == digest(
        fs_dir, os.path.join("termstats", "part-0.parquet")
    )
    assert IndexMeta.load(fs_dir).__dict__ == IndexMeta.load(local_dir).__dict__
    # no leftover tmp artifacts on the fs target
    leftovers = [
        p
        for p in os.listdir(fs_dir)
        if p.startswith(".") and p != ".triples_complete"
    ]
    assert leftovers == []
    got = search_index(fs_dir, "biology data", k=5)
    want = search_index(local_dir, "biology data", k=5)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()


def test_serving_via_pyarrow_fs_rank_identical(tmp_path):
    """EVERY serving path reads the index through a generic ``pyarrow.fs``
    (SubTreeFileSystem — not a LocalFileSystem, so the fs branch is truly
    exercised): one-shot, extended grammar, phrase, the BatchSearcher
    actor pool, scatter-gather QueryEngine, and fs-side tombstones. All
    rank- and score-identical to plain local-path serving."""
    from pyarrow import fs as pafs

    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.index.search import phrase_search
    from lsearch_ray.index.tombstones import delete_docs, load_tombstones

    corpus = assign_doc_ids(make_corpus(300, seed=11))
    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    corpus = corpus.take(pa.array(first))
    docs = rd.from_arrow(corpus.select(["doc_id", "text"]))
    local_dir = str(tmp_path / "idx")
    build_index(docs, local_dir, num_shards=4, positions=True)

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    some_text = corpus["text"][0].as_py()
    toks = tokenize(some_text)
    phrase = f"{toks[0]} {toks[1]}"
    queries = ["biology data", "the data search", f'"{phrase}" data']

    # one-shot + extended grammar
    for q in queries:
        got = search_index("idx", q, k=10, filesystem=fs)
        want = search_index(local_dir, q, k=10)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist(), q
        assert got["score"].to_pylist() == want["score"].to_pylist(), q

    # phrase serving
    got = phrase_search("idx", phrase, k=10, filesystem=fs)
    want = phrase_search(local_dir, phrase, k=10)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()

    # BatchSearcher actor pool (fs pickles through fn_constructor_kwargs)
    qt = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": queries,
        }
    )
    out = (
        rd.from_arrow(qt)
        .map_batches(
            BatchSearcher,
            fn_constructor_kwargs={"index_dir": "idx", "k": 10, "filesystem": fs},
            batch_format="pyarrow",
            concurrency=2,
        )
        .to_pandas()
    )
    for qid, q in enumerate(queries):
        got_q = out[out["query_id"] == qid].sort_values("rank")
        want = search_index(local_dir, q, k=10)
        assert got_q["doc_id"].tolist() == want["doc_id"].to_pylist(), q
        assert got_q["score"].tolist() == want["score"].to_pylist(), q

    # scatter-gather engine over fs-held shards
    eng = QueryEngine("idx", num_actors=2, filesystem=fs)
    for q in queries:
        got = eng.search(q, k=10)
        want = search_index(local_dir, q, k=10)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist(), q
        assert got["score"].to_pylist() == want["score"].to_pylist(), q

    # fs-side tombstones mask immediately in fs serving
    victim = int(want["doc_id"][0].as_py())
    n = delete_docs("idx", [victim], filesystem=fs)
    assert n == 1
    assert victim in load_tombstones("idx", filesystem=fs).tolist()
    after = search_index("idx", queries[-1], k=10, filesystem=fs)
    assert victim not in after["doc_id"].to_pylist()


def test_routed_stream_rank_identical(built):
    """route_queries_by_head_term reorders the stream only: per-query
    (rank, doc_id, score) rows are identical to the unrouted pool."""
    from lsearch_ray.index.search import BatchSearcher, route_queries_by_head_term

    queries = QUERIES * 3  # repeats exercise the per-actor caches
    qt = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": queries,
        }
    )

    def run(routed: bool):
        ds = rd.from_arrow(qt).repartition(4)
        if routed:
            # index_dir engages the hot-term spread path (skew guard)
            ds = route_queries_by_head_term(
                ds, num_routes=4, index_dir=built[0], hot_df_fraction=0.01
            )
        rows = ds.map_batches(
            BatchSearcher,
            fn_constructor_kwargs={"index_dir": built[0], "k": 10},
            batch_format="pyarrow",
            batch_size=6,
            concurrency=2,
        ).take_all()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score"])
            )
        return {q: sorted(v) for q, v in by_q.items()}

    plain, routed = run(False), run(True)
    assert set(plain) == set(routed)
    for qid in plain:
        assert plain[qid] == routed[qid], queries[qid]
