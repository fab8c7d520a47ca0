"""Block-max-pruned scoring must be rank-identical to exhaustive/golden."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.corpus import assign_doc_ids, make_corpus
from lsearch_ray.index.build import IndexMeta, build_index
from lsearch_ray.index.golden import golden_index
from lsearch_ray.index.search import (
    _postings_files,
    global_dfs,
    load_postings_with_skips,
    score_query_blockmax,
)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    corpus = assign_doc_ids(make_corpus(1200, seed=9))
    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    corpus = corpus.take(pa.array(first))
    index_dir = str(tmp_path_factory.mktemp("bm") / "index")
    # small block_size so multi-block terms exist at this corpus size
    build_index(
        rd.from_arrow(corpus.select(["doc_id", "text"])),
        index_dir,
        num_shards=3,
        block_size=16,
    )
    golden = golden_index(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist())
    return index_dir, golden


QUERIES = [
    "the",
    "the data",
    "biology chemistry physics",
    "word003 the of",
    "zzz the",
    "index search engine query term",
    "word100",
]


@pytest.mark.parametrize("mode", ["or", "and"])
def test_blockmax_rank_identical(built, mode):
    index_dir, golden = built
    meta = IndexMeta.load(index_dir)
    files = _postings_files(index_dir, meta.num_shards)
    from lsearch_ray.analyzer import tokenize

    for q in QUERIES:
        terms = sorted(set(tokenize(q)))
        postings = load_postings_with_skips(files, terms)
        dfs = global_dfs({t: [(f[0],) for f in frags] for t, frags in postings.items()})
        docs, scores = score_query_blockmax(q, postings, dfs, meta, k=10, mode=mode)
        want = golden.bm25(q, k=10, mode=mode)
        assert docs.tolist() == [d for d, _ in want], (q, mode)
        assert scores.tolist() == [s for _, s in want], (q, mode)


def test_blockmax_prunes(built):
    """The bound pass must actually exclude docs for a selective query
    (sanity that pruning is active, not a no-op)."""
    index_dir, golden = built
    meta = IndexMeta.load(index_dir)
    files = _postings_files(index_dir, meta.num_shards)
    postings = load_postings_with_skips(files, ["the"])
    dfs = global_dfs({t: [(f[0],) for f in frags] for t, frags in postings.items()})
    # k=3 on the head term: θ>0 so bound filtering engages
    docs, scores = score_query_blockmax("the", postings, dfs, meta, k=3)
    want = golden.bm25("the", k=3)
    assert docs.tolist() == [d for d, _ in want]


def test_lazy_blockmax_rank_identical(built, monkeypatch):
    """True skip-pointer decoding (decode only surviving blocks) must be
    bit-identical to golden across modes, with the pruned path FORCED
    (cutoff pinned to 0 so the small corpus takes the lazy branch)."""
    import lsearch_ray.index.search as S

    index_dir, golden = built
    meta = IndexMeta.load(index_dir)
    files = _postings_files(index_dir, meta.num_shards)
    monkeypatch.setattr(S, "EXHAUSTIVE_CUTOFF", 0)
    monkeypatch.setattr(S, "SPARSE_DECODE_LIMIT", 40)
    from lsearch_ray.analyzer import tokenize

    for mode in ["or", "and"]:
        for q in QUERIES:
            terms = sorted(set(tokenize(q)))
            postings = S.load_postings_lazy(files, terms, meta.block_size)
            dfs = S.global_dfs_lazy(postings)
            docs, scores = S.score_query_blockmax_lazy(
                q, postings, dfs, meta, k=10, mode=mode
            )
            want = golden.bm25(q, k=10, mode=mode)
            assert docs.tolist() == [d for d, _ in want], (q, mode)
            assert scores.tolist() == [s for _, s in want], (q, mode)


def test_lazy_blockmax_skips_decoding(built, monkeypatch):
    """On a selective head-term query the lazy path must leave some blocks
    of the head term's posting list undecoded."""
    import lsearch_ray.index.search as S

    index_dir, golden = built
    meta = IndexMeta.load(index_dir)
    files = _postings_files(index_dir, meta.num_shards)
    monkeypatch.setattr(S, "EXHAUSTIVE_CUTOFF", 0)
    monkeypatch.setattr(S, "SPARSE_DECODE_LIMIT", 40)
    decoded_blocks = {"n": 0, "total": 0}
    orig = S.LazyPostings.decode_blocks

    def counting(self, sel):
        decoded_blocks["n"] += len(sel)
        decoded_blocks["total"] += self.n_blocks
        return orig(self, sel)

    monkeypatch.setattr(S.LazyPostings, "decode_blocks", counting)
    # rare term + head term (word054: df≈1147 → ~24 blocks/shard at
    # block_size 16): θ from the rare term prunes most head blocks
    q = "word003 word054"
    postings = S.load_postings_lazy(files, ["word003", "word054"], meta.block_size)
    dfs = S.global_dfs_lazy(postings)
    docs, scores = S.score_query_blockmax_lazy(q, postings, dfs, meta, k=3, mode="or")
    want = golden.bm25(q, k=3)
    assert docs.tolist() == [d for d, _ in want]
    assert scores.tolist() == [s for _, s in want]
    assert 0 < decoded_blocks["n"] < decoded_blocks["total"], decoded_blocks
