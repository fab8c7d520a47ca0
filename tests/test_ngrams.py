"""Word n-gram operators: gram extraction, corpus counts, decontamination.

The reference engine has no n-gram surface (SURVEY.md §2.9 training-data
gap families); semantics are pinned here against a pure-Python reference
using the same tokenizer contract as the oracle-proven ``tf_triples``
(`[a-z0-9]+` runs of the ASCII-lowered text).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.functions.ngrams import (
    GRAM_SEP,
    benchmark_grams,
    decontaminate_ds,
    doc_ngrams,
    ngram_counts_ds,
)


def _pyref(s: str, n: int) -> list[str]:
    toks = re.findall(r"[a-z0-9]+", s.lower())
    return [GRAM_SEP.join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


TEXTS = [
    "The quick brown fox",
    "a b",
    "",
    "one",
    "x1 y2 z3 w4",
    "Hello, WORLD... hello;world hello",
    "tabs\tand\nnewlines split too",
    "café naïve résumé",  # non-ASCII bytes are separators
]


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_doc_ngrams_matches_python_reference(n):
    parents, grams = doc_ngrams(pa.array(TEXTS), n)
    got: dict[int, list[str]] = {}
    for p, g in zip(parents, grams.to_pylist()):
        got.setdefault(int(p), []).append(g)
    for i, s in enumerate(TEXTS):
        assert got.get(i, []) == _pyref(s, n), (n, i)


def test_doc_ngrams_empty_and_short():
    parents, grams = doc_ngrams(pa.array(["", "   ", "!!"]), 2)
    assert len(parents) == 0 and len(grams) == 0
    parents, grams = doc_ngrams(pa.array([], type=pa.string()), 3)
    assert len(parents) == 0
    with pytest.raises(ValueError):
        doc_ngrams(pa.array(["x"]), 0)


def test_doc_ngrams_no_cross_row_windows():
    # adjacent rows ending/starting with tokens must not form grams
    parents, grams = doc_ngrams(pa.array(["a b", "c d"]), 2)
    assert grams.to_pylist() == [f"a{GRAM_SEP}b", f"c{GRAM_SEP}d"]
    assert parents.tolist() == [0, 1]


def test_doc_ngrams_sliced_batch_offset():
    # Ray hands zero-copy block slices; the extractor must honor offsets
    base = pa.array(["pad pad pad", "a b c", "d e f"])
    sl = base.slice(1, 2)
    parents, grams = doc_ngrams(sl, 2)
    assert grams.to_pylist() == [
        f"a{GRAM_SEP}b",
        f"b{GRAM_SEP}c",
        f"d{GRAM_SEP}e",
        f"e{GRAM_SEP}f",
    ]
    assert parents.tolist() == [0, 0, 1, 1]


def _count_ref(texts: list[str], n: int) -> dict[str, int]:
    out: dict[str, int] = {}
    for s in texts:
        for g in _pyref(s, n):
            out[g.replace(GRAM_SEP, " ")] = out.get(g.replace(GRAM_SEP, " "), 0) + 1
    return out


def test_ngram_counts_ds():
    texts = [
        "big data big data big",
        "data big data",
        "small data set",
        "big data wins",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(3)
    top = ngram_counts_ds(ds, n=2, k=4)
    ref = _count_ref(texts, 2)
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(top["gram"].to_pylist(), top["n"].to_pylist())) == expected


def test_ngram_counts_k_larger_than_vocab():
    ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a b c"]}))
    top = ngram_counts_ds(ds, n=2, k=100)
    assert top["gram"].to_pylist() == ["a b", "b c"]
    assert top["n"].to_pylist() == [1, 1]


def test_decontaminate_ds():
    bench_texts = ["the secret eval question about rayon", "unused probe"]
    corpus_texts = [
        "clean document with no overlap at all",
        "contains the secret eval question about rayon verbatim",
        "the secret eval is mentioned and also eval question about rayon",
        "another clean one",
    ]
    bench = rd.from_arrow(pa.table({"doc_id": [100, 101], "text": bench_texts}))
    corpus = rd.from_arrow(
        pa.table({"doc_id": list(range(4)), "text": corpus_texts})
    ).repartition(2)
    grams = benchmark_grams(bench, 3)
    assert isinstance(grams, list)
    out = decontaminate_ds(corpus, grams, n=3).sort("doc_id").take_all()
    got = {r["doc_id"]: r["n_shared"] for r in out}

    bench_set = {g for t in bench_texts for g in _pyref(t, 3)}
    exp = {}
    for i, t in enumerate(corpus_texts):
        k = len(set(_pyref(t, 3)) & bench_set)
        if k:
            exp[i] = k
    assert got == exp
    assert 1 in got and 0 not in got and 3 not in got


def test_decontaminate_counts_distinct_grams_once():
    # the same benchmark gram repeated in a doc counts once
    bench = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x y z"]}))
    corpus = rd.from_arrow(
        pa.table({"doc_id": [7], "text": ["x y z and x y z and x y z"]})
    )
    grams = benchmark_grams(bench, 3)
    out = decontaminate_ds(corpus, grams, n=3).take_all()
    assert [(r["doc_id"], r["n_shared"]) for r in out] == [(7, 1)]


def test_decontaminate_empty_gram_set():
    corpus = rd.from_arrow(pa.table({"doc_id": [0], "text": ["some text here"]}))
    out = decontaminate_ds(corpus, [], n=3).take_all()
    assert out == []


def test_doc_repetition_stats():
    from lsearch_ray.functions.ngrams import doc_repetition_stats

    texts = [
        "a b a b a b",  # bigrams: ab ba ab ba ab -> total 5, distinct 2, top 3
        "x y z",  # xy yz -> 3-1=2 total, 2 distinct, top 1
        "solo",  # no bigrams
        "",
        "w w w w",  # ww ww ww -> total 3, distinct 1, top 3
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(2)
    out = {
        r["doc_id"]: (r["total_grams"], r["distinct_grams"], r["top_gram_n"])
        for r in doc_repetition_stats(ds, n=2).take_all()
    }
    assert out == {
        0: (5, 2, 3),
        1: (2, 2, 1),
        2: (0, 0, 0),
        3: (0, 0, 0),
        4: (3, 1, 3),
    }


def test_doc_repetition_matches_python_reference():
    from collections import Counter

    from lsearch_ray.functions.ngrams import doc_repetition_stats

    texts = [t for t in TEXTS if t] + ["big data big data big data big"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    out = {
        r["doc_id"]: (r["total_grams"], r["distinct_grams"], r["top_gram_n"])
        for r in doc_repetition_stats(ds, n=3).take_all()
    }
    for i, t in enumerate(texts):
        c = Counter(_pyref(t, 3))
        exp = (sum(c.values()), len(c), max(c.values()) if c else 0)
        assert out[i] == exp, (i, t)


def test_skipgram_pairs_window_and_boundaries():
    from lsearch_ray.functions.ngrams import GRAM_SEP, skipgram_pairs

    texts = pa.array(["a b c d", "x y"])
    got = sorted(skipgram_pairs(texts, 2).to_pylist())
    sep = GRAM_SEP
    want = sorted(
        [
            f"a{sep}b", f"b{sep}c", f"c{sep}d",  # d=1 row 0
            f"a{sep}c", f"b{sep}d",              # d=2 row 0
            f"x{sep}y",                          # d=1 row 1 (no d=2)
        ]
    )
    assert got == want


def test_skipgram_counts_matches_bruteforce():
    import itertools

    from lsearch_ray.functions.ngrams import skipgram_counts_ds

    texts = ["the cat sat on the mat", "the cat ran", "on the mat the cat"]
    t = pa.table({"text": texts})
    out = skipgram_counts_ds(rd.from_arrow(t).repartition(2), window=2, k=50)
    counts = {}
    for s in texts:
        toks = s.split()
        for i, j in itertools.combinations(range(len(toks)), 2):
            if 1 <= j - i <= 2:
                counts[(toks[i], toks[j])] = counts.get((toks[i], toks[j]), 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = list(zip(zip(out["w1"].to_pylist(), out["w2"].to_pylist()),
                   out["n"].to_pylist()))
    assert got == [((a, b), n) for (a, b), n in want]


def test_bigram_lm_matches_pure_python():
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.functions.ngrams import bigram_lm_ds

    texts = [
        "a b a b c",
        "a b c a b",
        "b c a b a",
        "c a b a b",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(2)
    out = bigram_lm_ds(ds, k=10, min_count=2)

    from collections import Counter
    uni, big = Counter(), Counter()
    for t in texts:
        toks = tokenize(t)
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    expect = sorted(
        (
            (w1, w2, n, (n * 10**6) // uni[w1])
            for (w1, w2), n in big.items()
            if n >= 2
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:10]
    got = list(
        zip(
            out["w1"].to_pylist(),
            out["w2"].to_pylist(),
            out["n"].to_pylist(),
            out["p_micro"].to_pylist(),
        )
    )
    assert got == expect


def test_term_clusters_disjoint_vocabularies():
    import ray.data as rd

    from lsearch_ray.functions.ngrams import term_clusters_ds

    # two sublanguages that never co-occur → two PMI components
    docs_a = ["alpha beta gamma alpha beta gamma alpha beta"] * 10
    docs_b = ["delta epsilon zeta delta epsilon zeta delta epsilon"] * 10
    tab = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": docs_a + docs_b,
        }
    )
    out = (
        term_clusters_ds(rd.from_arrow(tab).repartition(3), min_count=5)
        .to_pandas()
        .set_index("term")["comp_term"]
        .to_dict()
    )
    assert out == {
        "alpha": "alpha",
        "beta": "alpha",
        "gamma": "alpha",
        "delta": "delta",
        "epsilon": "delta",
        "zeta": "delta",
    }


def test_term_clusters_edge_free_terms_self_label():
    import ray.data as rd

    from lsearch_ray.functions.ngrams import term_clusters_ds

    # below min_count → no edges → every term labels itself
    tab = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": ["one two three"],
        }
    )
    out = (
        term_clusters_ds(rd.from_arrow(tab), min_count=5)
        .to_pandas()
        .set_index("term")["comp_term"]
        .to_dict()
    )
    assert out == {"one": "one", "two": "two", "three": "three"}


def _bigram_nll_reference(texts: list[str]) -> dict[int, tuple[int, int]]:
    """Sequential replay of the bigram-NLL contract: per-doc bigram
    counts, corpus n2/n1, floor(-ln(n2/n1)*1e6+0.5) per bigram."""
    import math
    import re
    from collections import Counter

    per: list[Counter] = []
    n2: Counter = Counter()
    for t in texts:
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        c = Counter(zip(toks, toks[1:]))
        per.append(c)
        n2.update(c)
    n1: Counter = Counter()
    for (w1, _), n in n2.items():
        n1[w1] += n
    out = {}
    for i, c in enumerate(per):
        if not c:
            continue
        nll = sum(
            k * math.floor(-math.log(n2[g] / n1[g[0]]) * 1e6 + 0.5)
            for g, k in c.items()
        )
        out[i] = (sum(c.values()), nll)
    return out


def test_bigram_nll_matches_reference_and_paths_agree():
    import ray.data as rd

    from lsearch_ray.functions.ngrams import bigram_nll_ds

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "",
        "single",
        "the cat sat on the mat again and again",
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        }
    )
    want = _bigram_nll_reference(texts)
    got = (
        bigram_nll_ds(rd.from_arrow(tab).repartition(3))
        .to_pandas()
        .set_index("doc_id")
    )
    assert {
        int(i): (int(r["n_bigrams"]), int(r["nll_micro"]))
        for i, r in got.iterrows()
    } == want
    # distributed-cost path = broadcast path, bit-identical
    got_dist = (
        bigram_nll_ds(
            rd.from_arrow(tab).repartition(3),
            broadcast_costs=False,
            num_partitions=4,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.sort_index().equals(got_dist)


def test_ngram_novelty_flags_unique_grams():
    import ray.data as rd

    from lsearch_ray.functions.ngrams import ngram_novelty_ds

    texts = [
        "alpha beta gamma delta",   # grams: a-b-g (shared), b-g-d (unique)
        "alpha beta gamma epsilon", # a-b-g (shared), b-g-e (unique)
        "zeta eta theta",           # z-e-t (unique)
        "short one",                # no 3-gram -> no row
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        }
    )
    got = (
        # num_partitions sized to the 4-cpu test session (wide hash
        # joins deadlock when partitions ≫ cpus)
        ngram_novelty_ds(rd.from_arrow(tab).repartition(2), n=3, num_partitions=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == [0, 1, 2]
    assert got.loc[0, "distinct_grams"] == 2
    assert got.loc[0, "novel_grams"] == 1
    assert got.loc[0, "novelty_micro"] == 500000
    assert got.loc[2, "distinct_grams"] == 1
    assert got.loc[2, "novel_grams"] == 1
    assert got.loc[2, "novelty_micro"] == 1000000


def test_vocab_hash_join_fallback_parity():
    """Forcing max_broadcast_rows=0 routes the unigram lookup through
    partitioned hash joins (and term_clusters through hashed node ids +
    min-lex recovery); results must be value-identical to the broadcast
    path."""
    import ray.data as rd

    from lsearch_ray.functions.ngrams import (
        bigram_lm_ds,
        pmi_bigrams_ds,
        term_clusters_ds,
    )

    texts = [
        "alpha beta gamma alpha beta gamma alpha beta",
        "delta epsilon zeta delta epsilon zeta delta epsilon",
        "a b a b c a b c a b",
        "b c a b a c a b a b",
    ] * 4
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(tab).repartition(3)

    pmi_b = pmi_bigrams_ds(ds, k=15, min_count=2).to_pandas()
    pmi_h = pmi_bigrams_ds(
        ds, k=15, min_count=2, max_broadcast_rows=0
    ).to_pandas()
    assert pmi_b.equals(pmi_h)

    lm_b = bigram_lm_ds(ds, k=15, min_count=2).to_pandas()
    lm_h = bigram_lm_ds(ds, k=15, min_count=2, max_broadcast_rows=0).to_pandas()
    assert lm_b.equals(lm_h)

    tc_b = (
        term_clusters_ds(ds, min_count=3)
        .to_pandas()
        .set_index("term")["comp_term"]
        .to_dict()
    )
    tc_h = (
        term_clusters_ds(ds, min_count=3, max_broadcast_rows=0)
        .to_pandas()
        .set_index("term")["comp_term"]
        .to_dict()
    )
    assert tc_b == tc_h


def test_pmi_empty_and_pairless_corpus():
    """Regression: an empty corpus (or one with zero adjacent pairs —
    every doc a single token) must return an EMPTY (w1, w2, n,
    pmi_micro) result, not crash on int(None) from Dataset.sum or
    math.log(0)."""
    import ray.data as rd

    from lsearch_ray.functions.ngrams import pmi_scored_pairs_ds

    empty = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    out = pmi_scored_pairs_ds(empty)
    assert out.schema().names == ["w1", "w2", "n", "pmi_micro"]
    assert out.count() == 0

    single = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["alpha", "beta"]),
            }
        )
    )
    out = pmi_scored_pairs_ds(single).to_pandas()
    assert len(out) == 0


def test_oov_rate_by_slice_matches_reference():
    """OOV mass per slice vs a pure-Python replay: top-k ties broken by
    term ascending, token-less slices present with zeros, floor
    fixed-point exact."""
    from collections import Counter

    import ray.data as rd

    from lsearch_ray.functions.ngrams import oov_rate_by_slice_ds

    texts = [
        "cat dog cat bird", "dog dog fish", "cat newt", "",
        "zebra yak xerus walrus", "cat dog",
    ]
    langs = ["en", "en", "de", "fr", "de", "en"]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    got = (
        oov_rate_by_slice_ds(
            rd.from_arrow(tab).repartition(3), k=3, slice_col="lang"
        )
        .to_pandas()
        .set_index("lang")
    )

    toks = [(lang, w) for lang, t in zip(langs, texts) for w in t.split()]
    counts = Counter(w for _, w in toks)
    vocab = set(
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    )
    for lang in ["en", "de", "fr"]:
        mine = [w for lg, w in toks if lg == lang]
        oov = sum(1 for w in mine if w not in vocab)
        row = got.loc[lang]
        assert int(row["total_tokens"]) == len(mine), lang
        assert int(row["oov_tokens"]) == oov, lang
        want_micro = oov * 10**6 // len(mine) if mine else 0
        assert int(row["oov_micro"]) == want_micro, lang
    assert got.index.tolist() == ["de", "en", "fr"]


def test_vocab_growth_matches_python_reference():
    """Curve equals the per-prefix distinct-token count of a sequential
    replay, including empty buckets and a sparse / offset doc_id range."""
    from lsearch_ray.functions.ngrams import vocab_growth_ds

    texts = [
        "alpha beta gamma",
        "beta delta",
        "",  # contributes nothing
        "alpha epsilon zeta",
        "zeta eta",
        "theta",
        "beta beta beta",  # no new vocab
        "iota kappa",
    ]
    ids = [3, 5, 6, 11, 12, 20, 21, 30]  # sparse, non-zero-based
    n_buckets = 4
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    out = (
        vocab_growth_ds(rd.from_arrow(tbl), n_buckets=n_buckets)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )

    lo, hi = min(ids), max(ids)
    span = hi - lo + 1
    thrs = [lo + (span * i + n_buckets - 1) // n_buckets for i in range(1, n_buckets + 1)]
    for i, thr in enumerate(thrs):
        vocab = set()
        for did, s in zip(ids, texts):
            if did < thr:
                vocab.update(re.findall(r"[a-z0-9]+", s.lower()))
        row = out.iloc[i]
        assert int(row["bucket"]) == i + 1
        assert int(row["doc_id_lt"]) == thr
        assert int(row["vocab_size"]) == len(vocab)
    # curve is monotone and ends at the full vocabulary
    assert list(out["vocab_size"]) == sorted(out["vocab_size"])


def test_kn_bigram_lm_matches_python_reference():
    """Kneser-Ney probabilities equal a sequential replay (exact
    integer micro contract, d = 3/4)."""
    from collections import Counter

    from lsearch_ray.functions.ngrams import kn_bigram_lm_ds

    texts = [
        "the cat sat on the mat",
        "the cat ran on the mat",
        "the dog sat on a log",
        "a cat and a dog",
        "the cat sat on the mat again",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = kn_bigram_lm_ds(
        rd.from_arrow(tbl), k=10, min_count=2
    ).to_pylist()

    big = Counter()
    for s in texts:
        toks = re.findall(r"[a-z0-9]+", s.lower())
        for i in range(len(toks) - 1):
            big[(toks[i], toks[i + 1])] += 1
    nt = len(big)
    c1 = Counter()
    n1p = Counter()
    n1m = Counter()
    for (w1, w2), n in big.items():
        c1[w1] += n
        n1p[w1] += 1
        n1m[w2] += 1
    sel = sorted(
        ((w1, w2, n) for (w1, w2), n in big.items() if n >= 2),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:10]
    expected = [
        {
            "w1": w1,
            "w2": w2,
            "n": n,
            "pkn_micro": (
                10**6 * (max(4 * n - 3, 0) * nt + 3 * n1p[w1] * n1m[w2])
            )
            // (4 * c1[w1] * nt),
        }
        for w1, w2, n in sel
    ]
    assert out == expected
    # interpolated KN is a proper smoothing: every probability < 1
    assert all(0 < r["pkn_micro"] < 10**6 for r in out)


def test_grouped_vocab_growth_matches_python_reference():
    """Per-group curves over the shared global ladder, zero-vocab cells
    included, equal to a sequential replay."""
    from lsearch_ray.functions.ngrams import grouped_vocab_growth_ds

    rows = [
        (0, "en", "alpha beta"),
        (3, "de", "gamma"),
        (5, "en", "beta delta"),
        (9, "de", ""),
        (11, "en", "epsilon"),
        (12, "zz", ""),  # group with no tokens at all
    ]
    n_buckets = 3
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": [r[1] for r in rows],
            "text": [r[2] for r in rows],
        }
    )
    out = [
        (r.lang, int(r.bucket), int(r.doc_id_lt), int(r.vocab_size))
        for r in grouped_vocab_growth_ds(
            rd.from_arrow(tbl), n_buckets=n_buckets
        )
        .to_pandas()
        .sort_values(["lang", "bucket"])
        .itertuples()
    ]
    ids = [r[0] for r in rows]
    lo, hi = min(ids), max(ids)
    span = hi - lo + 1
    thrs = [lo + (span * i + n_buckets - 1) // n_buckets for i in range(1, n_buckets + 1)]
    expected = []
    for g in sorted({r[1] for r in rows}):
        for i, thr in enumerate(thrs, 1):
            vocab = set()
            for did, lang, s in rows:
                if lang == g and did < thr:
                    vocab.update(re.findall(r"[a-z0-9]+", s.lower()))
            expected.append((g, i, thr, len(vocab)))
    assert out == expected
    # the token-less group has all-zero cells but IS present
    assert [(v) for g, _, _, v in expected if g == "zz"] == [0, 0, 0]
