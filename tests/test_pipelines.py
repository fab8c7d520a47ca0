"""Pure-Dataset fulltext pipelines vs golden reference (rounded scores)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from lsearch_ray.index.golden import golden_index
from lsearch_ray.pipelines import bm25_topk_dataset, doc_stats, term_df

PATH = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(PATH, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def golden():
    t = pq.read_table(PATH, columns=["doc_id", "text"])
    return golden_index(t["doc_id"].to_pylist(), t["text"].to_pylist())


def test_doc_stats(docs, golden):
    s = doc_stats(docs)
    assert s["n_docs"] == golden.n_docs
    assert s["avgdl"] == pytest.approx(golden.avgdl, rel=1e-12)


def test_term_df(docs, golden):
    got = {r["term"]: r["df"] for r in term_df(docs).take_all()}
    want = {t: len(p) for t, p in golden.postings.items()}
    assert got == want


@pytest.mark.parametrize("mode", ["or", "and"])
def test_bm25_dataset_matches_golden(docs, golden, mode):
    for q in ["scan merge", "hash join order", "window", "absent zzz scan"]:
        want = golden.bm25(q, k=10, mode=mode)
        got = bm25_topk_dataset(docs, q, k=10, mode=mode)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], (q, mode)
        for gs, (_, ws) in zip(got["score"].to_pylist(), want):
            assert gs == pytest.approx(ws, abs=5e-5)


def test_bm25_prefix_matches_expanded_or_query(docs, golden):
    """Prefix BM25 == OR-BM25 over the top-cap expansion terms, with the
    expansion ordered (df desc, term asc) like Lucene's rewrite; a
    binding cap (4 < the 6 's'-terms) must drop the low-df tail."""
    from lsearch_ray.pipelines import bm25_prefix_topk_dataset

    for pre, cap in [("s", 4), ("s", 50), ("win", 10)]:
        ranked = sorted(
            ((len(p), t) for t, p in golden.postings.items()
             if t.startswith(pre)),
            key=lambda x: (-x[0], x[1]),
        )[:cap]
        terms = [t for _, t in ranked]
        assert terms, (pre, cap)
        got = bm25_prefix_topk_dataset(docs, pre, k=10, max_expansions=cap)
        want = golden.bm25(" ".join(terms), k=10, mode="or")
        assert got["doc_id"].to_pylist() == [d for d, _ in want], (pre, cap)
        for gs, (_, ws) in zip(got["score"].to_pylist(), want):
            assert gs == pytest.approx(ws, abs=5e-5)


def test_facet_counts_matches_brute_force(docs, golden):
    from lsearch_ray.pipelines import facet_counts_ds

    import pyarrow.parquet as pq

    t = pq.read_table(PATH, columns=["doc_id", "text", "lang"])
    langs = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    full = rd.from_arrow(t)
    for q in ["scan merge", "window", "absent zzz", ""]:
        terms = set(q.split())
        want: dict[str, int] = {}
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if terms & set(txt.split()):
                want[langs[d]] = want.get(langs[d], 0) + 1
        got = facet_counts_ds(full, q, facet_col="lang").take_all()
        assert {r["facet"]: r["n_docs"] for r in got} == want, q
        assert [r["facet"] for r in got] == sorted(want)


def test_facet_counts_null_facet_buckets_as_empty():
    from lsearch_ray.pipelines import facet_counts_ds

    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["hit one", "hit two", "miss"],
            "lang": pa.array(["en", None, "en"], type=pa.string()),
        }
    )
    got = facet_counts_ds(rd.from_arrow(t), "hit", facet_col="lang").take_all()
    assert {r["facet"]: r["n_docs"] for r in got} == {"": 1, "en": 1}


def test_bm25_prefix_no_match_and_empty_prefix(docs):
    from lsearch_ray.pipelines import bm25_prefix_topk_dataset

    assert bm25_prefix_topk_dataset(docs, "zzz", k=5).num_rows == 0
    assert bm25_prefix_topk_dataset(docs, "  ", k=5).num_rows == 0


def test_tfidf_top_terms_matches_python_reference():
    import math
    import re
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.pipelines.fulltext import tfidf_top_terms

    texts = [
        "apple banana apple cherry",
        "banana cherry cherry date",
        "apple apple apple unique",
        "date egg fig",
        "fig fig egg banana apple",
    ]
    n_docs = len(texts)
    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    df = Counter(w for ws in toks for w in set(ws))

    def ref_topk(k):
        out = []
        for i, ws in enumerate(toks):
            tf = Counter(ws)
            scored = [
                (np.floor(c * math.log(n_docs / df[w]) * 1e4 + 0.5) / 1e4, w)
                for w, c in tf.items()
            ]
            scored.sort(key=lambda sw: (-sw[0], sw[1]))
            for rnk, (s, w) in enumerate(scored[:k], start=1):
                out.append((i, w, rnk, s))
        return out

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(n_docs)), "text": texts})
    ).repartition(2)
    for broadcast in (True, False):
        got = (
            tfidf_top_terms(ds, k=2, broadcast_df=broadcast, num_partitions=4)
            .sort(["doc_id", "rnk"])
            .take_all()
        )
        rows = [(r["doc_id"], r["term"], r["rnk"], r["tfidf"]) for r in got]
        assert rows == ref_topk(2), broadcast


def test_tfidf_k_larger_than_terms():
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.pipelines.fulltext import tfidf_top_terms

    ds = rd.from_arrow(pa.table({"doc_id": [0, 1], "text": ["a b", "a"]}))
    got = tfidf_top_terms(ds, k=10).sort(["doc_id", "rnk"]).take_all()
    # doc 0 has 2 terms, doc 1 has 1; every term present once
    assert [(r["doc_id"], r["rnk"]) for r in got] == [(0, 1), (0, 2), (1, 1)]


def test_bm25_prf_expands_and_reweights(docs):
    """PRF vs a transparent reimplementation on the same corpus: the
    expansion terms must be the top-Σtf non-query terms of the feedback
    docs, and the round-2 scores must equal a weighted bm25_topk_dataset
    call over the union term set."""
    from collections import Counter

    import pyarrow.parquet as pq

    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.pipelines.fulltext import bm25_prf_topk_dataset

    query = "scan merge sort"
    fb_k, n_exp, w = 4, 2, 0.5
    out = bm25_prf_topk_dataset(
        docs, query, k=10, fb_k=fb_k, n_exp=n_exp, exp_weight=w
    )

    # reference expansion: harvest feedback docs in plain Python
    r1 = bm25_topk_dataset(docs, query, k=fb_k)
    fb = set(r1["doc_id"].to_pylist())
    tab = pq.read_table(PATH, columns=["doc_id", "text"])
    orig = set(tokenize(query))
    cnt = Counter()
    for i, txt in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()):
        if i in fb:
            for t in tokenize(txt):
                if t not in orig:
                    cnt[t] += 1
    exp = [t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))][:n_exp]
    assert len(exp) == n_exp

    expect = bm25_topk_dataset(
        docs,
        " ".join(sorted(orig) + exp),
        k=10,
        weights={t: w for t in exp},
    )
    assert out.to_pydict() == expect.to_pydict()


def test_bm25_prf_empty_query(docs):
    from lsearch_ray.pipelines.fulltext import bm25_prf_topk_dataset

    out = bm25_prf_topk_dataset(docs, "...", k=5)
    assert out.num_rows == 0


def test_rrf_fuse_hand_example():
    """Pure-driver fusion arithmetic on a hand-checked example."""
    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import rrf_fuse

    a = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"doc_id": pa.array([3, 1], pa.int64())})
    out = rrf_fuse([a, b], k=10, rrf_k=60)
    got = dict(zip(out["doc_id"].to_pylist(), out["rrf_micro"].to_pylist()))
    s = 10**6
    assert got == {
        1: s // 61 + s // 62,
        2: s // 62,
        3: s // 63 + s // 61,
    }
    # ordering: score DESC, id ASC — doc 1 (32522) > doc 3 (32266) > doc 2
    assert out["doc_id"].to_pylist() == [1, 3, 2]


def test_rrf_fuse_truncates_to_k():
    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import rrf_fuse

    a = pa.table({"doc_id": pa.array(list(range(20)), pa.int64())})
    out = rrf_fuse([a], k=5)
    # single list: fused order == input order, truncated
    assert out["doc_id"].to_pylist() == [0, 1, 2, 3, 4]


def test_more_like_this_matches_numpy_reference(docs):
    """TF-IDF cosine against a transparent numpy reference on the real
    sf0.001 corpus (same w = tf·(lnN−lndf) weights, same rounding)."""
    import math
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from lsearch_ray.analyzer import tokenize
    from lsearch_ray.pipelines.fulltext import more_like_this_dataset

    src = 7
    out = more_like_this_dataset(docs, src, k=5)

    tab = pq.read_table(PATH, columns=["doc_id", "text"])
    ids = tab["doc_id"].to_pylist()
    texts = tab["text"].to_pylist()
    tfs = {i: Counter(tokenize(t)) for i, t in zip(ids, texts)}
    n = len(ids)
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    idf = {t: math.log(n) - math.log(d) for t, d in df.items()}
    w = {i: {t: c * idf[t] for t, c in cnt.items()} for i, cnt in tfs.items()}
    sn = math.sqrt(sum(x * x for x in w[src].values()))
    scores = {}
    for i in ids:
        if i == src:
            continue
        dot = sum(w[i][t] * w[src][t] for t in w[i] if t in w[src])
        if dot == 0.0:
            continue
        nd = math.sqrt(sum(x * x for x in w[i].values()))
        scores[i] = math.floor(dot / (nd * sn) * 1e6 + 0.5) / 1e6
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(out["doc_id"].to_pylist(), out["cos_sim"].to_pylist()))
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gi, gv), (ei, ev) in zip(got, expect):
        assert gv == pytest.approx(ev, abs=2e-6)


def test_more_like_this_missing_source(docs):
    from lsearch_ray.pipelines.fulltext import more_like_this_dataset

    out = more_like_this_dataset(docs, 10**9, k=5)
    assert out.num_rows == 0


def test_more_like_this_zero_norm_guard():
    """All-idf-zero docs have undefined cosine: a corpus where the
    source's every term is in every doc returns empty instead of NaN."""
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.pipelines.fulltext import more_like_this_dataset

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["the the", "the cat", "the dog"]),
            }
        )
    )
    out = more_like_this_dataset(ds, 0, k=5)
    assert out.num_rows == 0


def test_curate_corpus_end_to_end_invariants():
    """Composed training-data pipeline (gate → exact dedup → near-dup
    components → cluster split → per-split packing): survivor ids are
    unique near-dup cluster minima, the split label replays the
    component-keyed hash rule, and bins are contiguous per split."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.dedup import exact_dedup_by_content
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs
    from lsearch_ray.functions.sampling import hash_split_labels
    from lsearch_ray.functions.textstats import quality_filter_ds
    from lsearch_ray.pipelines.curation import curate_corpus_ds

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = curate_corpus_ds(docs).to_pandas()
    assert out["doc_id"].is_unique and len(out)

    # independent survivor reference: gate -> exact dedup -> component
    # minima over the exposed pair stage
    gated = quality_filter_ds(docs, keep_all=True)
    exact = exact_dedup_by_content(gated, "text", "doc_id").materialize()
    pairs = ngram_jaccard_pairs(exact, threshold=0.8)
    labels = component_labels_ds(
        exact.select_columns(["doc_id"]), pairs, "doc_id"
    ).to_pandas()
    want_ids = set(
        labels[labels["doc_id"] == labels["component"]]["doc_id"]
    )
    assert set(out["doc_id"]) == want_ids

    # split labels replay hash_split_labels over the component
    comp_of = dict(zip(labels["doc_id"], labels["component"]))
    comps = pa.array(
        [comp_of[d] for d in out["doc_id"]], pa.int64()
    )
    assert list(out["grp"]) == hash_split_labels(comps).to_pylist()

    # per split: bin ids start at 0 and are contiguous
    for g, sub in out.groupby("grp"):
        bins = np.sort(sub["bin_id"].unique())
        assert bins[0] == 0 and (np.diff(bins) == 1).all()


def test_bm25f_matches_python_replay_and_boosts_title_hits():
    """BM25F equals a sequential replay of the weighted-tf/dl formula,
    and a title hit outranks an identical body-only hit."""
    import math
    import re

    import numpy as np
    import pyarrow as pa

    from lsearch_ray.index.build import B, K1
    from lsearch_ray.pipelines.fulltext import bm25f_topk_dataset

    texts = [
        "apple banana cherry date egg fig grape",  # 'apple' in title
        "banana cherry date egg fig grape apple",  # 'apple' in body only
        "apple apple banana cherry date egg apple",  # title + body hits
        "nothing relevant here at all friends",
        "apple pie",  # short doc, all title
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = bm25f_topk_dataset(rd.from_arrow(tbl), "apple", k=5)
    got = {
        int(i): float(s)
        for i, s in zip(out["doc_id"].to_pylist(), out["score"].to_pylist())
    }

    T, TW = 5, 2
    toks = [re.findall(r"[a-z0-9]+", s.lower()) for s in texts]
    wdl = [len(t) + TW * min(len(t), T) for t in toks]
    avgdl = sum(wdl) / len(texts)
    df = sum(1 for t in toks if "apple" in t)
    idf = math.log(1.0 + (len(texts) - df + 0.5) / (df + 0.5))
    expected = {}
    for d, t in enumerate(toks):
        tf = t.count("apple")
        if not tf:
            continue
        tft = t[:T].count("apple")
        wtf = tf + TW * tft
        score = idf * wtf * (K1 + 1.0) / (
            wtf + K1 * (1.0 - B + B * wdl[d] / avgdl)
        )
        expected[d] = round(score, 4)
    assert got == {d: np.float64(s) for d, s in expected.items()}
    # title occurrence beats the identical doc with a body-only hit
    assert got[0] > got[1]


def test_bm25_fuzzy_matches_expanded_or_query():
    """Fuzzy retrieval equals plain OR-BM25 over the manually computed
    edit-1 expansion set; the rewrite cap binds by (df desc, term)."""
    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import bm25_fuzzy_topk_dataset

    texts = [
        "cat hat mat cat",
        "hat rat sat",
        "cart cat chat cap",
        "dog dig dug",
        "cat nap",
        "zebra lion",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    ds = rd.from_arrow(tbl)
    out = bm25_fuzzy_topk_dataset(ds, "cat", k=10, max_expansions=3)

    def lev1(a: str, b: str) -> bool:
        if abs(len(a) - len(b)) > 1:
            return False
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1] <= 1

    import re

    df: dict[str, set[int]] = {}
    for did, s in enumerate(texts):
        for t in re.findall(r"[a-z0-9]+", s.lower()):
            df.setdefault(t, set()).add(did)
    matches = sorted(
        ((t, len(d)) for t, d in df.items() if lev1("cat", t)),
        key=lambda x: (-x[1], x[0]),
    )
    assert len(matches) > 3  # the cap binds in this fixture
    expansion = " ".join(t for t, _ in matches[:3])
    expected = bm25_topk_dataset(ds, expansion, k=10)
    assert out.to_pydict() == expected.to_pydict()

    # no dictionary term within distance 1 → empty result
    none = bm25_fuzzy_topk_dataset(ds, "qqqqqq", k=10)
    assert none.num_rows == 0


def test_index_profile_matches_python_reference():
    import re

    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import index_profile_ds

    texts = [
        "a a b c",
        "a b d",
        "a e",
        "a f g h",
        "a b c d e f g h i j k l m",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = index_profile_ds(rd.from_arrow(tbl)).to_pandas()

    df: dict[str, set[int]] = {}
    for did, s in enumerate(texts):
        for t in re.findall(r"[a-z0-9]+", s.lower()):
            df.setdefault(t, set()).add(did)
    buckets: dict[int, list[int]] = {}
    for t, docs in df.items():
        buckets.setdefault(len(docs).bit_length() - 1, []).append(len(docs))
    expected = {
        b: (len(v), sum(v)) for b, v in buckets.items()
    }
    got = {
        int(r.df_bucket): (int(r.n_terms), int(r.n_postings))
        for r in out.itertuples()
    }
    assert got == expected
    # 'a' is in all 5 docs -> bucket 2 exists; singletons -> bucket 0
    assert 2 in got and 0 in got


def test_bm25_collapse_drops_lower_ranked_near_dups():
    """Exact/near-dup docs collapse to their best-ranked representative;
    distinct docs pass through; result equals a Python replay."""
    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import (
        bm25_collapse_topk_dataset,
        bm25_topk_dataset,
    )

    dup = "merge sort scan pipeline shuffle partition " * 4
    texts = [
        dup,                       # cluster {0,1}: identical
        dup,
        "merge only here with other words around it now",
        "sort things quickly using quicksort and mergesort today",
        "scan the table fully then merge sort the output rows",
        "unrelated content about gardens and flowers and bees",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    ds = rd.from_arrow(tbl)
    q = "merge sort scan"
    pool_tbl = bm25_topk_dataset(ds, q, k=6)
    pool = list(
        zip(pool_tbl["doc_id"].to_pylist(), pool_tbl["score"].to_pylist())
    )
    # docs 0 and 1 are identical → same cluster; both match the query
    assert {0, 1} <= {d for d, _ in pool}

    out = bm25_collapse_topk_dataset(ds, q, k=6, pool=6)
    got = list(zip(out["doc_id"].to_pylist(), out["score"].to_pylist()))

    # replay: first-of-cluster wins in (score desc, id asc) pool order
    comp = {0: 0, 1: 0}  # the only near-dup cluster (J = 1.0)
    seen = set()
    expected = []
    for d, s in pool:
        c = comp.get(d, d)
        if c in seen:
            continue
        seen.add(c)
        expected.append((d, s))
    assert got == expected
    assert 0 in {d for d, _ in got} and 1 not in {d for d, _ in got}


def test_regex_rank_matches_python_reference():
    import re

    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import regex_rank_ds

    texts = ["sort the set", "no matches here", "sat sit sort", "st"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = regex_rank_ds(rd.from_arrow(tbl), "s[a-z]*t", k=10)
    got = list(zip(out["doc_id"].to_pylist(), out["score"].to_pylist()))
    expected = sorted(
        (
            (i, 1 + len(re.findall(r"s[a-z]*t", s)))
            for i, s in enumerate(texts)
        ),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert got == expected


def test_related_terms_matches_python_reference():
    import re
    from collections import Counter

    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import related_terms_ds

    texts = [
        "scan the table then scan rows",
        "scan table scan table",
        "merge after scan table",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = related_terms_ds(rd.from_arrow(tbl), "scan", k=3)
    got = list(zip(out["w2"].to_pylist(), out["n"].to_pylist()))
    big = Counter()
    for s in texts:
        toks = re.findall(r"[a-z0-9]+", s.lower())
        for a, b in zip(toks, toks[1:]):
            if a == "scan":
                big[b] += 1
    expected = sorted(big.items(), key=lambda x: (-x[1], x[0]))[:3]
    assert got == expected == [("table", 3), ("rows", 1), ("the", 1)]


def test_complete_prefix_matches_python_reference():
    import re

    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import complete_prefix_ds

    texts = ["sort set sun sort", "sun sort sea", "moon sun", "set sort"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    ds = rd.from_arrow(tbl)
    out = complete_prefix_ds(ds, "s", k=3)
    got = list(zip(out["term"].to_pylist(), out["df"].to_pylist()))
    df: dict[str, set[int]] = {}
    for did, s in enumerate(texts):
        for t in re.findall(r"[a-z0-9]+", s.lower()):
            df.setdefault(t, set()).add(did)
    expected = sorted(
        ((t, len(d)) for t, d in df.items() if t.startswith("s")),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    assert got == expected == [("sort", 3), ("sun", 3), ("set", 2)]
    assert complete_prefix_ds(ds, "", k=3).num_rows == 0


def test_percolate_matches_python_reference():
    import re

    import pyarrow as pa

    from lsearch_ray.pipelines.fulltext import percolate_ds

    texts = [
        "merge sort scan",          # matches q1 (merge+sort)
        "merge only",               # none
        "sort and merge again",     # q1
        "unrelated words",          # none
        "",                         # none
    ]
    queries = {1: "merge sort", 2: "scan", 3: "", 4: "zzz absent"}
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    got = sorted(
        (int(r["doc_id"]), int(r["query_id"]))
        for r in percolate_ds(rd.from_arrow(tbl), queries).take_all()
    )
    expected = []
    for did, s in enumerate(texts):
        toks = set(re.findall(r"[a-z0-9]+", s.lower()))
        for qid, q in queries.items():
            terms = set(re.findall(r"[a-z0-9]+", q.lower()))
            if terms and terms <= toks:
                expected.append((did, qid))
    assert got == sorted(expected)
    assert (0, 1) in got and (0, 2) in got and (2, 1) in got
    # empty query never matches; absent terms never match
    assert all(q not in (3, 4) for _, q in got)
