"""Grouped top-k, unigram-LM NLL scoring, and PMI collocations — each
pinned against a pure-Python/pandas reference on multi-block inputs
(groups deliberately spread across blocks so the partial-prune + shuffle
composition, not per-batch luck, is what's under test)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.grouped import grouped_topk_ds
from lsearch_ray.functions.ngrams import pmi_bigrams_ds
from lsearch_ray.pipelines.fulltext import unigram_nll


def _multiblock(df: pd.DataFrame, n_blocks: int = 7):
    """Dataset with rows round-robined across n_blocks blocks, so every
    group straddles block boundaries."""
    parts = [df.iloc[i::n_blocks] for i in range(n_blocks)]
    return rd.from_blocks([pa.Table.from_pandas(p, preserve_index=False) for p in parts])


def test_grouped_topk_matches_pandas_window():
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "g": rng.choice(["en", "de", "fr", "zz"], size=n),
            "id": np.arange(n, dtype=np.int64),
            # small value range → plenty of ties, exercising the id tiebreak
            "v": rng.integers(0, 12, size=n).astype(np.int64),
        }
    )
    k = 4
    got = (
        grouped_topk_ds(_multiblock(df), "g", "v", id_col="id", k=k, num_partitions=5)
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["g", "v", "id"], ascending=[True, False, True]).copy()
    ref["rn"] = ref.groupby("g").cumcount() + 1
    ref = ref[ref["rn"] <= k].reset_index(drop=True)
    assert list(got["g"]) == list(ref["g"])
    assert list(got["id"]) == list(ref["id"])
    assert list(got["v"]) == list(ref["v"])
    assert list(got["rn"]) == list(ref["rn"])


def test_grouped_topk_group_smaller_than_k():
    df = pd.DataFrame(
        {
            "g": ["a", "a", "b"],
            "id": np.array([1, 2, 3], dtype=np.int64),
            "v": np.array([5, 5, 9], dtype=np.int64),
        }
    )
    got = (
        grouped_topk_ds(rd.from_pandas(df), "g", "v", id_col="id", k=10)
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    # ties on v=5 break by id asc
    assert list(got["id"]) == [1, 2, 3]
    assert list(got["rn"]) == [1, 2, 1]


def _toks(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "machine learning of machine learning",
    "the the the rare token here",
    "",
    "on on on the mat",
]


def test_unigram_nll_matches_pyref():
    df = pd.DataFrame(
        {"doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS}
    )
    got = (
        unigram_nll(_multiblock(df, 3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tot = Counter()
    for t in TEXTS:
        tot.update(_toks(t))
    total = sum(tot.values())
    cost = {
        w: math.floor(-math.log(c / total) * 1e6 + 0.5) for w, c in tot.items()
    }
    exp = []
    for i, t in enumerate(TEXTS):
        ws = _toks(t)
        if not ws:
            continue  # token-less docs have no triples on either side
        exp.append((i, len(ws), sum(cost[w] for w in ws)))
    assert list(got["doc_id"]) == [e[0] for e in exp]
    assert list(got["n_tokens"]) == [e[1] for e in exp]
    assert list(got["nll_micro"]) == [e[2] for e in exp]


def test_unigram_nll_hash_join_path_matches_broadcast():
    df = pd.DataFrame(
        {"doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS}
    )
    a = (
        unigram_nll(_multiblock(df, 3), broadcast_costs=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        unigram_nll(_multiblock(df, 3), broadcast_costs=False, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pmi_bigrams_matches_pyref():
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = []
    for _ in range(40):
        ws = list(rng.choice(vocab, size=rng.integers(3, 12)))
        texts.append(" ".join(ws))
    # a glued collocation that PMI must surface on top
    texts += ["hong kong"] * 6
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    k, mc = 10, 2
    got = pmi_bigrams_ds(_multiblock(df, 4), k=k, min_count=mc).to_pandas()

    uni = Counter()
    big = Counter()
    for t in texts:
        ws = _toks(t)
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    t1, b2 = sum(uni.values()), sum(big.values())
    const = 2 * math.log(t1) - math.log(b2)
    rows = []
    for (w1, w2), n2 in big.items():
        if n2 < mc:
            continue
        pmi = math.log(n2) - math.log(uni[w1]) - math.log(uni[w2]) + const
        rows.append((w1, w2, n2, math.floor(pmi * 1e6 + 0.5)))
    ref = (
        pd.DataFrame(rows, columns=["w1", "w2", "n", "pmi_micro"])
        .sort_values(
            ["pmi_micro", "w1", "w2"], ascending=[False, True, True]
        )
        .head(k)
        .reset_index(drop=True)
    )
    assert got.to_dict("list") == ref.to_dict("list")
    assert got.iloc[0]["w1"] == "hong" and got.iloc[0]["w2"] == "kong"


def test_grouped_quantiles_matches_numpy_lower():
    from lsearch_ray.functions.quantiles import grouped_quantiles_ds

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=n),
            # integer-valued floats → heavy ties
            "v": rng.integers(0, 9, size=n).astype(np.float64),
        }
    )
    # non-finite rows must be excluded from ranks AND counts; a singleton
    # group must answer every q with its one value
    df = pd.concat(
        [
            df,
            pd.DataFrame(
                {"g": ["a", "b", "solo"], "v": [np.nan, np.inf, 42.0]}
            ),
        ],
        ignore_index=True,
    )
    qs = [0.5, 0.9, 0.99]
    got = (
        grouped_quantiles_ds(_multiblock(df, 5), "g", "v", qs, num_partitions=4)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    rows = []
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy()[np.isfinite(sub["v"].to_numpy())])
        for q in qs:
            rows.append((g, q, vals[int(math.floor(q * (len(vals) - 1)))]))
    ref = (
        pd.DataFrame(rows, columns=["g", "q", "value"])
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


def test_grouped_rank_percentile_ties_and_run_boundaries():
    """Ties share the lowest rank; accumulated first-occurrence ranks
    must NOT leak across group boundaries (group A's high ranks vs group
    B's early positions)."""
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.grouped import grouped_rank_percentile_ds

    rows = [
        # group a: values 1,1,2,2,2,9  -> ranks 0,0,2,2,2,5 (n=6)
        ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 2.0), ("a", 9.0),
        # group b: values 3,3,4        -> ranks 0,0,2       (n=3)
        ("b", 3.0), ("b", 3.0), ("b", 4.0),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array([g for g, _ in rows]),
                "v": pa.array([v for _, v in rows], pa.float64()),
                "rid": pa.array(range(len(rows)), pa.int64()),
            }
        )
    ).repartition(3)
    out = (
        grouped_rank_percentile_ds(ds, "g", "v", id_cols=["rid"],
                                   num_partitions=2)
        .to_pandas()
        .sort_values("rid")
    )
    s = 10**6
    expect = [0, 0, 2 * s // 6, 2 * s // 6, 2 * s // 6, 5 * s // 6,
              0, 0, 2 * s // 3]
    assert list(out["pct_micro"]) == expect


def test_grouped_rank_percentile_rejects_null_values():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from lsearch_ray.functions.grouped import grouped_rank_percentile_ds

    ds = rd.from_arrow(
        pa.table({"g": ["a", "a"], "v": pa.array([1.0, None], pa.float64())})
    )
    with pytest.raises(Exception, match="has nulls"):
        grouped_rank_percentile_ds(ds, "g", "v").to_pandas()


def test_grouped_rank_percentile_rejects_nan():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from lsearch_ray.functions.grouped import grouped_rank_percentile_ds

    ds = rd.from_arrow(
        pa.table(
            {"g": ["a", "a", "a"],
             "v": pa.array([1.0, float("nan"), float("nan")], pa.float64())}
        )
    )
    with pytest.raises(Exception, match="non-finite"):
        grouped_rank_percentile_ds(ds, "g", "v").to_pandas()
