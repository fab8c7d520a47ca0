"""Positional index + phrase queries: rank/score-identical to golden."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.analyzer import term_counts_table, term_positions
from lsearch_ray.corpus import assign_doc_ids, make_corpus
from lsearch_ray.index.build import IndexMeta, build_index
from lsearch_ray.index.codec import (
    decode_positions_column,
    decode_posting_column,
    encode_shard_postings,
)
from lsearch_ray.index.golden import golden_index
from lsearch_ray.index.search import phrase_search, search_index


def test_term_counts_positions_match_pure_python():
    texts = ["the cat sat on the mat", "a b a b a", "", "one-token"]
    t = pa.table(
        {"doc_id": pa.array(range(4), type=pa.int64()), "text": texts}
    )
    out = term_counts_table(t, positions=True)
    got: dict[tuple[int, str], list[int]] = {}
    for i in range(out.num_rows):
        got[(out["doc_id"][i].as_py(), out["term"][i].as_py())] = out["pos"][
            i
        ].as_py()
    for d, text in enumerate(texts):
        for term, want in term_positions(text).items():
            assert got[(d, term)] == want, (d, term)
    # positions invariant under batch splitting
    split = pa.concat_tables(
        [
            term_counts_table(t.slice(0, 2), positions=True),
            term_counts_table(t.slice(2), positions=True),
        ]
    )
    assert split.sort_by([("doc_id", "ascending"), ("term", "ascending")]).equals(
        out.sort_by([("doc_id", "ascending"), ("term", "ascending")])
    )


def test_positions_codec_roundtrip():
    rng = np.random.RandomState(1)
    rows = []
    for term, n in [("a", 300), ("bb", 2), ("c", 128)]:
        docs = np.unique(rng.randint(0, 10**6, size=n * 2))[:n]
        for d in docs:
            tf = int(rng.randint(1, 6))
            pos = np.sort(rng.choice(500, size=tf, replace=False))
            rows.append((term, int(d), tf, int(rng.randint(1, 300)), pos))
    rows.sort(key=lambda r: (r[0], r[1]))
    t = encode_shard_postings(
        pa.array([r[0] for r in rows]),
        np.array([r[1] for r in rows]),
        np.array([r[2] for r in rows]),
        np.array([r[3] for r in rows]),
        block_size=64,
        positions=np.concatenate([r[4] for r in rows]),
    )
    from lsearch_ray.index.codec import build_doc_table

    dtab = build_doc_table(np.array([r[1] for r in rows], dtype=np.int64))
    for i in range(t.num_rows):
        term = t["term"][i].as_py()
        _, tf, _ = decode_posting_column(
            t["docs"][i].as_py(), t["tfs"][i].as_py(), t["dls"][i].as_py(),
            dtab, 64,
        )
        offs, flat = decode_positions_column(t["poss"][i].as_py(), tf)
        want_rows = [r for r in rows if r[0] == term]
        for j, wr in enumerate(want_rows):
            assert np.array_equal(flat[offs[j] : offs[j + 1]], wr[4]), (term, j)


@pytest.fixture(scope="module")
def positional_index(tmp_path_factory):
    corpus = assign_doc_ids(make_corpus(800, seed=21))
    first = np.sort(np.unique(corpus["doc_id"].to_numpy(), return_index=True)[1])
    corpus = corpus.take(pa.array(first))
    index_dir = str(tmp_path_factory.mktemp("ph") / "index")
    build_index(
        rd.from_arrow(corpus.select(["doc_id", "text"])),
        index_dir,
        num_shards=3,
        block_size=16,
        positions=True,
    )
    golden = golden_index(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist())
    texts = dict(zip(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist()))
    return index_dir, golden, texts


def test_phrase_search_rank_identical(positional_index):
    index_dir, golden, texts = positional_index
    # real bigrams from the corpus + absent/degenerate phrases
    from lsearch_ray.analyzer import tokenize

    phrases = set()
    for text in list(texts.values())[:40]:
        toks = tokenize(text)
        if len(toks) >= 2:
            phrases.add(f"{toks[0]} {toks[1]}")
            phrases.add(f"{toks[len(toks)//2]} {toks[len(toks)//2+1]}")
        if len(toks) >= 3:
            phrases.add(" ".join(toks[:3]))
    phrases |= {"zzz qqq", "the", "word003 word004 word005 word006"}
    checked_nonempty = 0
    for p in sorted(phrases):
        got = phrase_search(index_dir, p, k=10)
        want = golden.phrase_bm25(p, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], p
        assert got["score"].to_pylist() == [s for _, s in want], p
        checked_nonempty += bool(want)
    assert checked_nonempty >= 10  # the corpus really exercises matches


def test_phrase_order_matters(positional_index):
    index_dir, golden, texts = positional_index
    from lsearch_ray.analyzer import tokenize

    # find a doc with two adjacent distinct tokens; reversed order must not
    # match that adjacency (unless the text also contains the reverse)
    for text in texts.values():
        toks = tokenize(text)
        for i in range(len(toks) - 1):
            a, b = toks[i], toks[i + 1]
            if a != b:
                fwd = phrase_search(index_dir, f"{a} {b}", k=100)
                rev = phrase_search(index_dir, f"{b} {a}", k=100)
                want_f = {d for d, _ in golden.phrase_bm25(f"{a} {b}", k=100)}
                want_r = {d for d, _ in golden.phrase_bm25(f"{b} {a}", k=100)}
                assert set(fwd["doc_id"].to_pylist()) == want_f
                assert set(rev["doc_id"].to_pylist()) == want_r
                return
    pytest.skip("no adjacent distinct pair found")


def test_phrase_requires_positional_index(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": ["alpha beta", "beta alpha"],
        }
    )
    d = str(tmp_path / "np_idx")
    build_index(rd.from_arrow(t), d, num_shards=1)
    with pytest.raises(ValueError):
        phrase_search(d, "alpha beta")


def test_positional_build_keeps_bm25_rank_identity(positional_index):
    """positions=True must not change non-phrase scoring."""
    index_dir, golden, _ = positional_index
    for q in ["the data", "word003", "biology music theory"]:
        got = search_index(index_dir, q, k=10)
        want = golden.bm25(q, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q
        assert got["score"].to_pylist() == [s for _, s in want], q


def test_batch_phrase_searcher_streams(positional_index):
    """BatchPhraseSearcher through a real Ray actor-pool pipeline matches
    the driver-side phrase_search per query."""
    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.index.search import BatchPhraseSearcher

    index_dir, golden, texts = positional_index
    phrases = []
    for text in list(texts.values())[:12]:
        toks = tokenize(text)
        if len(toks) >= 2:
            phrases.append(f"{toks[0]} {toks[1]}")
    phrases.append("zzz qqq")
    qt = pa.table(
        {
            "query_id": pa.array(range(len(phrases)), type=pa.int64()),
            "phrase": phrases,
        }
    )
    out = (
        rd.from_arrow(qt)
        .repartition(2)
        .map_batches(
            BatchPhraseSearcher,
            fn_constructor_kwargs={"index_dir": index_dir, "k": 10},
            batch_format="pyarrow",
            concurrency=2,
        )
        .to_pandas()
    )
    for qid, p in enumerate(phrases):
        got = out[out["query_id"] == qid].sort_values("rank")
        want = golden.phrase_bm25(p, k=10)
        assert got["doc_id"].tolist() == [d for d, _ in want], p
        assert got["score"].tolist() == [s for _, s in want], p


def test_batch_phrase_searcher_accepts_query_schema(positional_index):
    """The BatchSearcher input schema (query_id, query) with quoted
    phrases drives BatchPhraseSearcher identically to the phrase column —
    one query table can feed either serving path."""
    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.index.search import BatchPhraseSearcher

    index_dir, golden, texts = positional_index
    phrases = []
    for text in list(texts.values())[:6]:
        toks = tokenize(text)
        if len(toks) >= 2:
            phrases.append(f"{toks[0]} {toks[1]}")
    qt = pa.table(
        {
            "query_id": pa.array(range(len(phrases)), type=pa.int64()),
            "query": [f'"{p}"' for p in phrases],  # quoted, BatchSearcher-style
        }
    )
    out = (
        rd.from_arrow(qt)
        .map_batches(
            BatchPhraseSearcher,
            fn_constructor_kwargs={"index_dir": index_dir, "k": 10},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert list(out.columns) == ["query_id", "rank", "doc_id", "score"]
    for qid, p in enumerate(phrases):
        got = out[out["query_id"] == qid].sort_values("rank")
        want = golden.phrase_bm25(p, k=10)
        assert got["doc_id"].tolist() == [d for d, _ in want], p
        assert got["score"].tolist() == [s for _, s in want], p


def test_batch_phrase_searcher_requires_positions(tmp_path):
    from lsearch_ray.index.search import BatchPhraseSearcher

    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": ["alpha beta"],
        }
    )
    d = str(tmp_path / "np2")
    from lsearch_ray.index.build import build_index as bi

    bi(rd.from_arrow(t), d, num_shards=1)
    with pytest.raises(ValueError):
        BatchPhraseSearcher(d)


def test_parse_query_full_grammar():
    from lsearch_ray.analyzer import parse_query, parse_query_full

    inc, exc, ph, nph = parse_query_full('"the data" engine -spark -"bad seq"')
    assert inc == sorted({"the", "data", "engine"})
    assert exc == ["spark"]
    assert ph == [["the", "data"]]
    assert nph == [["bad", "seq"]]
    # single-word quotes degrade to plain terms; unquoted text unchanged
    assert parse_query_full('"solo" x')[:2] == parse_query("solo x")
    assert parse_query_full("plain -neg query")[:2] == parse_query(
        "plain -neg query"
    )


def test_extended_query_grammar_matches_golden(positional_index):
    """Mixed quoted-phrase queries through search_index AND BatchSearcher
    match golden.bm25_full exactly."""
    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.index.search import BatchSearcher

    index_dir, golden, texts = positional_index
    some = [t for t in texts.values() if len(tokenize(t)) >= 4][:6]
    queries = []
    for text in some:
        toks = tokenize(text)
        queries.append(f'"{toks[0]} {toks[1]}" {toks[3]}')
        queries.append(f'{toks[2]} -"{toks[0]} {toks[1]}"')
    queries.append('"zzz impossible" word003')
    checked = 0
    for q in queries:
        want = golden.bm25_full(q, k=10)
        got = search_index(index_dir, q, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q
        assert got["score"].to_pylist() == [s for _, s in want], q
        checked += bool(want)
    assert checked >= 6
    # streaming path
    qt = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": queries,
        }
    )
    out = BatchSearcher(index_dir, k=10)(qt)
    df = out.to_pandas()
    for qid, q in enumerate(queries):
        want = golden.bm25_full(q, k=10)
        got = df[df["query_id"] == qid].sort_values("rank")
        assert got["doc_id"].tolist() == [d for d, _ in want], q
        assert got["score"].tolist() == [s for _, s in want], q


def test_extended_query_requires_positions(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": ["alpha beta gamma"],
        }
    )
    d = str(tmp_path / "np3")
    build_index(rd.from_arrow(t), d, num_shards=1)
    with pytest.raises(ValueError):
        search_index(d, '"alpha beta"')
    # plain queries still fine on non-positional indexes
    assert search_index(d, "alpha").num_rows == 1


def test_query_engine_extended_grammar(positional_index):
    """QueryEngine (scatter-gather actors) honors quoted phrases with the
    same golden-defined semantics as the other serving paths."""
    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.index.search import QueryEngine

    index_dir, golden, texts = positional_index
    eng = QueryEngine(index_dir, num_actors=2)
    some = [t for t in texts.values() if len(tokenize(t)) >= 4][:4]
    checked = 0
    for text in some:
        toks = tokenize(text)
        q = f'"{toks[0]} {toks[1]}" {toks[3]}'
        want = golden.bm25_full(q, k=10)
        got = eng.search(q, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q
        assert got["score"].to_pylist() == [s for _, s in want], q
        checked += bool(want)
    assert checked >= 2


def test_grammar_parity_across_all_serving_paths(positional_index):
    """One mixed-grammar battery (plain, negation, quoted phrase, negated
    phrase, combinations, empty/miss cases) through ALL THREE serving
    paths — search_index, BatchSearcher (actor pool), QueryEngine
    (scatter-gather) — asserting bit-identical (doc_id, score) lists
    against golden.bm25_full. The full extended grammar is a uniform
    capability of every path."""
    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.index.search import BatchSearcher, QueryEngine

    index_dir, golden, texts = positional_index
    toks_by_doc = [tokenize(t) for t in texts.values() if len(tokenize(t)) >= 5]
    t0, t1, t2, t3, _ = toks_by_doc[0][:5]
    u0, u1 = toks_by_doc[1][:2]
    queries = [
        f"{t0} {t2}",                       # plain OR
        f"{t1}",                            # single term
        f"{t0} -{u1}",                      # negation
        f'"{t0} {t1}"',                     # pure phrase
        f'"{t0} {t1}" {t3}',                # phrase + loose
        f'{t2} -"{u0} {u1}"',               # negated phrase
        f'"{t0} {t1}" -{u0} {t3}',          # phrase + negation + loose
        f'"{t0} {t1}" -"{u0} {u1}"',        # phrase + negated phrase
        '"zzz qqq" word001',                # miss phrase
        '""',                               # degenerate
    ]
    want = {q: golden.bm25_full(q, k=10) for q in queries}
    assert sum(bool(w) for w in want.values()) >= 5

    # path 1: one-shot
    for q in queries:
        got = search_index(index_dir, q, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want[q]], ("si", q)
        assert got["score"].to_pylist() == [s for _, s in want[q]], ("si", q)

    # path 2: BatchSearcher through a real actor-pool Dataset pipeline
    qt = rd.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(len(queries)), type=pa.int64()),
                "query": queries,
            }
        )
    )
    rows = qt.map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "k": 10},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=2,
    ).take_all()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(queries):
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want[q]], ("bs", q)
        assert [r["score"] for r in got] == [s for _, s in want[q]], ("bs", q)

    # path 3: QueryEngine scatter-gather actors
    eng = QueryEngine(index_dir, num_actors=2)
    for q in queries:
        got = eng.search(q, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in want[q]], ("qe", q)
        assert got["score"].to_pylist() == [s for _, s in want[q]], ("qe", q)
    many = eng.search_many(queries, k=10)
    by_q2: dict[int, list] = {}
    for r in many.to_pylist():
        by_q2.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(queries):
        got = sorted(by_q2.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want[q]], ("qm", q)
