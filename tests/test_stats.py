"""Round-4 statistics/sampling/eval additions: grouped Pearson correlation
(exact fixed-point), dyadic time-decay top-k, grouped MAD, hash-rank /
negative-pair sampling, and the LSH-vs-exact recall harness — each checked
against a trivial sequential replay, under multiple partitionings."""

from math import isqrt

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.functions.ann_lsh import (
    _bucket_of,
    _neighbor_buckets,
    _planes,
    ann_recall_table,
)
from lsearch_ray.functions.quantiles import grouped_mad_ds
from lsearch_ray.functions.sampling import (
    _key_hash63,
    hash_rank_ds,
    negative_pairs_ds,
)
from lsearch_ray.functions.stats import US_PER_DAY, decayed_topk_ds, grouped_corr_ds


def _ref_corr_micro(x, y, scale=1_000_000):
    n = len(x)
    sx, sy = int(sum(x)), int(sum(y))
    sxx = int(sum(v * v for v in x))
    syy = int(sum(v * v for v in y))
    sxy = int(sum(a * b for a, b in zip(x, y)))
    num = n * sxy - sx * sy
    den = isqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    if den == 0:
        return 0
    mag = (abs(num) * scale) // den
    return -mag if num < 0 else mag


@pytest.mark.parametrize("blocks", [1, 4])
def test_grouped_corr_matches_bigint_replay(blocks):
    rng = np.random.RandomState(7)
    n = 400
    key = rng.choice(["a", "b", "c"], size=n)
    x = rng.randint(0, 50, size=n).astype(np.int64)
    # group a: strong positive; b: negative; c: random
    y = np.where(
        key == "a", x * 2 + rng.randint(0, 5, n), np.where(key == "b", 100 - x, rng.randint(0, 100, n))
    ).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"k": key, "x": x, "y": y})
    ).repartition(blocks)
    out = grouped_corr_ds(ds, "k", "x", "y").to_pandas().set_index("k")
    for g in "abc":
        m = key == g
        assert out.loc[g, "n"] == m.sum()
        assert out.loc[g, "corr_micro"] == _ref_corr_micro(x[m].tolist(), y[m].tolist())
    assert out.loc["a", "corr_micro"] > 900_000
    assert out.loc["b", "corr_micro"] == -1_000_000


def test_grouped_corr_zero_variance_and_nulls():
    tab = pa.table(
        {
            "k": ["z", "z", "z", None, "w"],
            "x": pa.array([5, 5, 5, 1, None], pa.int64()),
            "y": pa.array([1, 2, 3, 1, 2], pa.int64()),
        }
    )
    out = grouped_corr_ds(rd.from_arrow(tab), "k", "x", "y").to_pandas()
    assert set(out["k"]) == {"z"}  # null key and null-x rows dropped
    assert out.set_index("k").loc["z", "corr_micro"] == 0  # zero x-variance


@pytest.mark.parametrize("blocks", [1, 3])
def test_decayed_topk_weights_and_horizon(blocks):
    anchor = 1_706_745_600_000_000
    rows = [
        # (user, age_days, value) → weight 2^(4-age) with horizon 4
        (1, 0, 1.0),   # w=16 → 1600
        (1, 4, 2.0),   # w=1  → 200
        (2, 2, 3.0),   # w=4  → 1200
        (2, 5, 99.0),  # beyond horizon → 0
        (3, -1, 99.0),  # after anchor → 0
        (3, 1, 0.125),  # cents = floor(12.5+0.5)=13, w=8 → 104
    ]
    ts = [anchor - d * US_PER_DAY - 1 if d >= 0 else anchor + US_PER_DAY for _, d, _ in rows]
    # note: "- 1" keeps age exactly d after floor division
    tab = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "v": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    out = (
        decayed_topk_ds(
            rd.from_arrow(tab).repartition(blocks),
            "u",
            "ts",
            "v",
            anchor_us=anchor,
            horizon_days=4,
            scale=100,
            k=10,
        )
        .to_pandas()
        .set_index("u")["score"]
        .to_dict()
    )
    # ages land at d (delta = d days + 1µs → floor = d)... except they
    # shift to d only when delta//day == d: delta = d*day + 1 → age == d
    assert out == {1: 100 * 16 + 200 * 1, 2: 300 * 4, 3: 13 * 8}


def test_decayed_topk_orders_and_limits():
    anchor = 1_706_745_600_000_000
    tab = pa.table(
        {
            "u": pa.array(list(range(30)), pa.int64()),
            "ts": pa.array([anchor - US_PER_DAY] * 30, pa.timestamp("us")),
            "v": pa.array([float(i % 3) for i in range(30)], pa.float64()),
        }
    )
    out = decayed_topk_ds(
        rd.from_arrow(tab), "u", "ts", "v", anchor_us=anchor, horizon_days=2, k=5
    ).to_pandas()
    assert len(out) == 5
    # score desc, user asc on ties: users 2,5,8,11,14 all score 200*2
    assert out["u"].tolist() == [2, 5, 8, 11, 14]


def _lower_median(vals):
    s = np.sort(np.asarray(vals, dtype=np.float64))
    return float(s[int(np.floor(0.5 * (len(s) - 1)))])


@pytest.mark.parametrize("blocks", [1, 4])
def test_grouped_mad_matches_replay(blocks):
    rng = np.random.RandomState(11)
    key = rng.choice(["p", "q"], size=200)
    v = rng.randn(200) * 10
    v[0] = np.nan  # excluded both passes
    tab = pa.table({"g": key, "value": v})
    out = (
        grouped_mad_ds(rd.from_arrow(tab).repartition(blocks), "g", "value")
        .to_pandas()
        .set_index("g")
    )
    for g in "pq":
        vals = v[(key == g) & np.isfinite(v)]
        med = _lower_median(vals)
        assert out.loc[g, "median"] == med
        assert out.loc[g, "mad"] == _lower_median(np.abs(vals - med))


@pytest.mark.parametrize("blocks", [1, 5])
def test_hash_rank_is_hash_order_permutation(blocks):
    ids = np.array([3, 1, 4, 159, 26, 53, 589, 793, 2384, 0], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(blocks)
    out = hash_rank_ds(ds, "doc_id", range_bits=3, num_partitions=3).to_pandas()
    h = _key_hash63(pa.array(ids))
    order = np.lexsort((ids, h))
    expect = {int(ids[i]): r for r, i in enumerate(order)}
    got = dict(zip(out["doc_id"], out["rk"]))
    assert got == expect


@pytest.mark.parametrize("blocks", [1, 4])
def test_negative_pairs_matches_ring_replay(blocks):
    ids = np.arange(50, dtype=np.int64) * 7  # non-contiguous
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(blocks)
    out = negative_pairs_ds(ds, "doc_id", k=2).to_pandas()
    h = _key_hash63(pa.array(ids))
    order = np.lexsort((ids, h))
    ring = ids[order]
    n = len(ids)
    stride = n // 3
    expect = set()
    for r, i in enumerate(ring):
        for j in (1, 2):
            partner = ring[(r + j * stride) % n]
            if partner != i:
                expect.add((int(i), j, int(partner)))
    got = set(zip(out["doc_id"], out["j"], out["neg_id"]))
    assert got == expect
    # sorted output contract
    assert out[["doc_id", "j"]].values.tolist() == sorted(
        out[["doc_id", "j"]].values.tolist()
    )


def test_negative_pairs_degenerate_sizes():
    for n in (0, 1, 2):
        ids = pa.array(np.arange(n, dtype=np.int64))
        ds = rd.from_arrow(pa.table({"doc_id": ids}))
        out = negative_pairs_ds(ds, "doc_id", k=2).to_pandas()
        # n<=2: stride = n//3 = 0 → every partner is self → dropped
        assert len(out) == 0


def _recall_corpus(n=120, d=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in m], pa.list_(pa.float32())
            ),
        }
    ), m


@pytest.mark.parametrize("blocks", [1, 4])
def test_ann_recall_matches_brute_force_replay(blocks):
    tab, m = _recall_corpus()
    qids = [0, 5]
    q = m[qids].astype(np.float64)
    out = ann_recall_table(
        rd.from_arrow(tab).repartition(blocks),
        q,
        qids,
        k=10,
        nplanes=8,
        nprobe_hamming=1,
        seed=99,
    ).to_pandas()
    planes = _planes(m.shape[1], 8, 99)
    mm = m.astype(np.float64)
    sims_all = (mm / np.linalg.norm(mm, axis=1, keepdims=True)) @ (
        q / np.linalg.norm(q, axis=1, keepdims=True)
    ).T
    bkt = _bucket_of(mm, planes)
    for row, qi in zip(out.itertuples(), range(len(qids))):
        s = sims_all[:, qi]
        exact = sorted(range(len(s)), key=lambda i: (-s[i], i))[:10]
        probe = set(_neighbor_buckets(int(_bucket_of(q[qi : qi + 1], planes)[0]), 8, 1))
        cand = [i for i in range(len(s)) if int(bkt[i]) in probe]
        approx = set(sorted(cand, key=lambda i: (-s[i], i))[:10])
        expect = sum(1 for i in exact if i in approx) * 100 // 10
        assert row.recall_pct == expect
        assert row.n_exact == 10
    assert out["query_id"].tolist() == qids


def test_ann_recall_full_probe_is_total():
    tab, m = _recall_corpus(n=40, d=8, seed=5)
    out = ann_recall_table(
        rd.from_arrow(tab),
        m[:2].astype(np.float64),
        [0, 1],
        k=10,
        nplanes=4,
        nprobe_hamming=2,  # hamming-2 over 4 planes probes most buckets
        seed=1,
    ).to_pandas()
    assert (out["recall_pct"] <= 100).all() and (out["recall_pct"] >= 0).all()
    # the self-vector is always in both arms (its own bucket is probed)
    assert (out["n_exact"] == 10).all()
