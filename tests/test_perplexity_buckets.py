"""CCNet-style perplexity bucketing
(:func:`lsearch_ray.pipelines.fulltext.perplexity_buckets_ds`) and the
integer-rank grouped order statistics it rides on
(:func:`lsearch_ray.functions.quantiles.grouped_rank_values_ds`) —
pure-Python brute-force references."""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.quantiles import grouped_rank_values_ds
from lsearch_ray.pipelines.fulltext import perplexity_buckets_ds


def _ref_buckets(texts: dict[int, tuple[str, str]], n_buckets: int):
    """Brute-force: unigram LM costs in integer micro-nats, ppl_milli by
    floor division, per-group thresholds at integer ranks, ties to the
    lower bucket. Token-less docs excluded."""
    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        for d, (txt, _) in texts.items()
    }
    tot = Counter()
    for ts in toks.values():
        tot.update(ts)
    T = sum(tot.values())
    cost = {w: math.floor(-math.log(c / T) * 1e6 + 0.5) for w, c in tot.items()}
    rows = {}
    for d, ts in toks.items():
        if not ts:
            continue
        nll = sum(cost[t] for t in ts)
        rows[d] = ((nll * 1000) // len(ts), len(ts), texts[d][1])
    out = {}
    by_g: dict[str, list[int]] = {}
    for d, (ppl, _, g) in rows.items():
        by_g.setdefault(g, []).append(ppl)
    thr = {}
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        thr[g] = [vals[(b * (n - 1)) // n_buckets] for b in range(1, n_buckets)]
    for d, (ppl, nt, g) in rows.items():
        bucket = sum(1 for t in thr[g] if t < ppl)
        out[d] = (g, nt, ppl, bucket)
    return out


def test_buckets_against_reference():
    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee", "rare1", "rare2"]
    weights = [30, 20, 10, 5, 3, 1, 1]
    texts = {}
    for d in range(80):
        n = rng.randrange(0, 25)
        txt = " ".join(rng.choices(vocab, weights=weights)[0] for _ in range(n))
        texts[d] = (txt, rng.choice(["en", "fr", "de"]))
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), type=pa.int64()),
                "text": [texts[k][0] for k in sorted(texts)],
                "lang": [texts[k][1] for k in sorted(texts)],
            }
        )
    )
    got = perplexity_buckets_ds(ds, n_buckets=3).sort("doc_id").to_pandas()
    ref = _ref_buckets(texts, 3)
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        g, nt, ppl, bucket = ref[int(r["doc_id"])]
        assert (r["lang"], int(r["n_tokens"]), int(r["ppl_milli"])) == (
            g,
            nt,
            ppl,
        )
        assert int(r["bucket"]) == bucket
    # every group uses all of its non-degenerate bucket range
    for g, sub in got.groupby("lang"):
        assert set(sub["bucket"]) <= {0, 1, 2}
        assert 0 in set(sub["bucket"])


def test_integer_rank_no_float_hazard():
    """floor((1/3)·(n−1)) in float64 rounds 0.999… down; the integer
    rank (1·(n−1))//3 must hit rank 1 exactly when n−1 == 3."""
    t = pa.table(
        {
            "g": ["x"] * 4,
            "v": pa.array([10, 20, 30, 40], type=pa.int64()),
        }
    )
    out = grouped_rank_values_ds(
        rd.from_arrow(t), "g", "v", [(1, 3), (2, 3)], num_partitions=2
    ).take_all()
    got = {(r["num"], r["den"]): r["value"] for r in out}
    assert got == {(1, 3): 20, (2, 3): 30}
    # dtype preserved end to end
    assert all(isinstance(r["value"], (int, np.integer)) for r in out)


def test_ties_fall_to_lower_bucket():
    # one group, 6 docs, engineered equal-ppl ties at the t1 threshold:
    # identical texts have identical ppl
    texts = {d: ("same same same", "en") for d in range(4)}
    texts[4] = ("rare1 rare1 rare1", "en")
    texts[5] = ("rare2 rare2 rare2 same", "en")
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), type=pa.int64()),
                "text": [texts[k][0] for k in sorted(texts)],
                "lang": [texts[k][1] for k in sorted(texts)],
            }
        )
    )
    got = perplexity_buckets_ds(ds, n_buckets=3).sort("doc_id").to_pandas()
    ref = _ref_buckets(texts, 3)
    for _, r in got.iterrows():
        assert int(r["bucket"]) == ref[int(r["doc_id"])][3]
    # the four tied docs share one bucket
    tied = got[got["doc_id"] < 4]["bucket"].unique()
    assert len(tied) == 1


def test_n_buckets_validation():
    import pytest

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "text": ["a"],
                "lang": ["en"],
            }
        )
    )
    with pytest.raises(ValueError):
        perplexity_buckets_ds(ds, n_buckets=1)
