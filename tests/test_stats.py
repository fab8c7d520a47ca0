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
    # the ranking contract rounds to 4 decimals before ordering
    sims_all = np.round(
        (mm / np.linalg.norm(mm, axis=1, keepdims=True))
        @ (q / np.linalg.norm(q, axis=1, keepdims=True)).T,
        4,
    )
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


# ---------------------------------------------------------------------------
# batch 2: z-score outliers, weighted median, session sizes, hourly gap-fill


from lsearch_ray.functions.joins import session_size_hist_ds
from lsearch_ray.functions.quantiles import grouped_weighted_median_ds
from lsearch_ray.functions.stats import zscore_outliers_ds
from lsearch_ray.functions.windows import gapfill_hourly_counts_ds


def _ref_outliers(ids, keys, vals, scale=100, z=3):
    out = []
    by_g = {}
    for i, gk, v in zip(ids, keys, vals):
        if np.isfinite(v):
            by_g.setdefault(gk, []).append((i, int(np.floor(v * scale + 0.5))))
    for gk, rows in by_g.items():
        n = len(rows)
        s = sum(x for _, x in rows)
        sxx = sum(x * x for _, x in rows)
        rr = z * z * (n * sxx - s * s)
        for i, x in rows:
            t = n * x - s
            if t * t > rr:
                out.append((i, gk, x))
    return sorted(out)


@pytest.mark.parametrize("blocks", [1, 4])
def test_zscore_outliers_matches_integer_replay(blocks):
    rng = np.random.RandomState(2)
    n = 300
    keys = rng.choice(["a", "b"], size=n)
    vals = rng.randn(n) * 5 + 50
    vals[::97] = 500.0  # planted anomalies
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"id": ids, "g": keys, "v": vals})
    ).repartition(blocks)
    out = zscore_outliers_ds(ds, "g", "id", "v").to_pandas()
    got = sorted(zip(out["id"], out["g"], out["cents"]))
    assert got == _ref_outliers(ids.tolist(), keys.tolist(), vals.tolist())
    assert len(got) >= 3  # the planted anomalies are found


def test_zscore_outliers_large_magnitude_exact():
    # cents ~1e9: (n·x − S)² ≈ 1e19 exceeds float64's 2^53 integer range,
    # so a float z-score would be inexact — the big-int replay must match
    base = 1.1e7  # → x ≈ 1.1e9 cents (within the int64 square bound)
    vals = np.array([base, base + 0.01, base - 0.01, base * 1.5], dtype=np.float64)
    ids = np.arange(len(vals), dtype=np.int64)
    keys = ["g"] * len(vals)
    ds = rd.from_arrow(pa.table({"id": ids, "g": keys, "v": vals}))
    out = zscore_outliers_ds(ds, "g", "id", "v", z=1).to_pandas()
    got = sorted(zip(out["id"], out["g"], out["cents"]))
    assert got == _ref_outliers(ids.tolist(), keys, vals.tolist(), z=1)
    assert [i for i, _, _ in got] == [3]


def test_zscore_outliers_raises_beyond_square_bound():
    # x² would wrap int64 silently — the quantizer must refuse instead
    vals = np.array([1e14, 2e14], dtype=np.float64)
    ids = np.arange(2, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": ids, "g": ["g", "g"], "v": vals}))
    with pytest.raises(Exception, match="int64 square bound"):
        zscore_outliers_ds(ds, "g", "id", "v").to_pandas()


def _ref_wmedian(vals, ws):
    order = np.argsort(vals, kind="mergesort")
    v, w = np.asarray(vals)[order], np.asarray(ws)[order]
    cum = np.cumsum(w)
    tot = cum[-1]
    return float(v[np.argmax(2 * cum >= tot)])


@pytest.mark.parametrize("blocks", [1, 4])
def test_grouped_weighted_median_matches_replay(blocks):
    rng = np.random.RandomState(4)
    n = 500
    g = rng.choice(["x", "y", "z"], size=n)
    v = rng.randint(0, 40, size=n).astype(np.float64)  # many ties
    w = rng.randint(1, 10, size=n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v, "w": w})).repartition(blocks)
    out = (
        grouped_weighted_median_ds(ds, "g", "v", "w")
        .to_pandas()
        .set_index("g")["wmedian"]
    )
    for gk in "xyz":
        m = g == gk
        assert out[gk] == _ref_wmedian(v[m], w[m])


def test_grouped_weighted_median_point_mass():
    # one huge weight dominates: median is that value regardless of order
    tab = pa.table(
        {
            "g": ["a"] * 4,
            "v": pa.array([1.0, 2.0, 3.0, 4.0]),
            "w": pa.array([1, 100, 1, 1], pa.int64()),
        }
    )
    out = grouped_weighted_median_ds(rd.from_arrow(tab), "g", "v", "w").to_pandas()
    assert out["wmedian"].tolist() == [2.0]


def _ref_session_sizes(users, tss, eids, gap_s=1800.0):
    import pandas as pd

    df = pd.DataFrame({"u": users, "ts": tss, "e": eids}).sort_values(
        ["u", "ts", "e"], kind="mergesort"
    )
    sizes = {}
    prev_u, prev_ts, cur = None, None, 0
    lens = []
    for u, ts in zip(df["u"], df["ts"]):
        if prev_u != u or (ts - prev_ts) / np.timedelta64(1, "s") > gap_s:
            if cur:
                lens.append(cur)
            cur = 0
        cur += 1
        prev_u, prev_ts = u, ts
    if cur:
        lens.append(cur)
    for L in lens:
        sizes[L] = sizes.get(L, 0) + 1
    return sizes


@pytest.mark.parametrize("blocks", [1, 4])
def test_session_size_hist_matches_replay(blocks):
    rng = np.random.RandomState(9)
    n = 400
    users = rng.randint(0, 20, size=n).astype(np.int64)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    tss = base + rng.randint(0, 86_400 * 3, size=n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    eids = np.arange(n, dtype=np.int64)
    tab = pa.table(
        {
            "user_id": pa.array(users),
            "ts": pa.array(tss),
            "event_id": pa.array(eids),
        }
    )
    out = (
        session_size_hist_ds(rd.from_arrow(tab).repartition(blocks))
        .to_pandas()
        .set_index("session_len")["n_sessions"]
        .to_dict()
    )
    assert out == _ref_session_sizes(users, tss, eids)


def test_gapfill_hourly_dense_grid():
    base = np.datetime64("2024-03-01T00:30:00", "us")
    rows = [
        ("a", base),
        ("a", base + np.timedelta64(3, "h")),
        ("b", base + np.timedelta64(1, "h")),
        ("b", base + np.timedelta64(1, "h") + np.timedelta64(5, "m")),
    ]
    tab = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    out = gapfill_hourly_counts_ds(rd.from_arrow(tab)).to_pandas()
    # grid: hours 00..03 × keys {a,b} = 8 cells
    assert len(out) == 8
    got = {
        (r.event_type, str(r.hour), r.n) for r in out.itertuples()
    }
    assert ("a", "2024-03-01 00:00:00", 1) in got
    assert ("a", "2024-03-01 01:00:00", 0) in got
    assert ("b", "2024-03-01 01:00:00", 2) in got
    assert ("b", "2024-03-01 03:00:00", 0) in got
    assert out["n"].sum() == 4


def test_session_size_hist_null_rows_excluded():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    tab = pa.table(
        {
            "user_id": pa.array([1, 1, None, None, 2], pa.int64()),
            "ts": pa.array(
                [base, base + np.timedelta64(1, "m"), base, base, None],
                pa.timestamp("us"),
            ),
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        }
    )
    out = (
        session_size_hist_ds(rd.from_arrow(tab))
        .to_pandas()
        .set_index("session_len")["n_sessions"]
        .to_dict()
    )
    # only user 1's two-event session survives (nulls excluded, user 2's
    # single row has a null ts)
    assert out == {2: 1}


def test_ann_recall_duplicate_embeddings_tiebreak():
    # duplicate vectors tie exactly at every rank — the per-batch top-k
    # must keep the LOWEST ids so the merge matches row_number order
    row = np.ones(8, dtype=np.float64)
    m = np.tile(row, (30, 1))
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(30, dtype=np.int64)),
            "embedding": pa.array(
                [r.astype(np.float32) for r in m], pa.list_(pa.float32())
            ),
        }
    )
    out = ann_recall_table(
        rd.from_arrow(tab).repartition(4),
        m[:1],
        [0],
        k=10,
        nplanes=4,
        nprobe_hamming=0,
        seed=1,
    ).to_pandas()
    # all sims equal → both arms are ids 0..9 → recall 100
    assert out["recall_pct"].tolist() == [100]


def test_embed_project_matches_numpy_replay():
    from lsearch_ray.functions.ann_lsh import project_embeddings_ds

    tab, m = _recall_corpus(n=50, d=12, seed=8)
    out = (
        project_embeddings_ds(
            rd.from_arrow(tab).repartition(3), out_dim=5, seed=77
        )
        .sort(["vec_id", "dim"])
        .to_pandas()
    )
    from lsearch_ray.functions.ann_lsh import quantize_micro

    # the stored column is float32 — replay the same round-trip; both
    # sides quantize to the 1e-6 grid before the (exact int64) dot
    qm = quantize_micro(m.astype(np.float32).astype(np.float64))
    qp = quantize_micro(_planes(12, 5, 77))
    expect = (qm @ qp).reshape(-1)
    assert len(out) == 50 * 5
    assert out["coord_pico"].to_numpy().tolist() == expect.tolist()
    assert out["dim"].tolist()[:5] == [0, 1, 2, 3, 4]


def test_hourly_anomalies_flags_burst_and_stall():
    import ray.data as rd

    from lsearch_ray.functions.windows import hourly_anomalies_ds

    # type 'a': steady 2 events/hour for 12 hours, then a 40-event burst
    # hour; type 'b': steady 3/hour throughout (no anomaly)
    rows_ts, rows_ty = [], []
    base = 1_700_000_000_000_000  # µs epoch
    hour = 3_600_000_000
    for h in range(13):
        n_a = 40 if h == 12 else 2
        for i in range(n_a):
            rows_ts.append(base + h * hour + i)
            rows_ty.append("a")
        for i in range(3):
            rows_ts.append(base + h * hour + i)
            rows_ty.append("b")
    tab = pa.table(
        {
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            "event_type": pa.array(rows_ty, pa.string()),
        }
    )
    out = hourly_anomalies_ds(rd.from_arrow(tab).repartition(3)).to_pandas()
    # only the burst hour of type 'a' deviates beyond 3 sigma
    assert list(out["event_type"]) == ["a"]
    assert list(out["n_events"]) == [40]
    # sequential replay of the integer inequality on type 'a'
    import math

    xs = [2] * 12 + [40]
    n, s = len(xs), sum(xs)
    sxx = sum(v * v for v in xs)
    rr = 9 * (n * sxx - s * s)
    s0 = int(math.floor(math.sqrt(float(rr))))
    q = s0 + 1 if (s0 + 1) ** 2 <= rr else (s0 - 1 if s0 * s0 > rr else s0)
    flagged = [v for v in xs if v * n > s + q or v * n < s - q]
    assert flagged == [40]


def test_rfm_segments_matches_python_reference():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.stats import rfm_segments_ds

    base = pd.Timestamp("2026-01-01").value // 1000  # epoch us
    rows = [
        # (user, ts_offset_hours, value)
        (1, 0, 10.0), (1, 5, 2.5),
        (2, 100, 1.0),
        (3, 50, 100.0), (3, 60, 0.0), (3, 70, 1.25),
        (4, 200, -3.5),
        (5, 10, 0.001), (5, 300, 0.002),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + r[1] * 3600 * 10**6 for r in rows],
                pa.timestamp("us"),
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    out = {
        int(r["user_id"]): r
        for r in rfm_segments_ds(rd.from_arrow(tbl)).take_all()
    }

    prof = {}
    for u, off, v in rows:
        p = prof.setdefault(u, [0, 0, 0])
        p[0] = max(p[0], base + off * 3600 * 10**6)
        p[1] += 1
        p[2] += int(np.floor(v * 1_000_000))
    n = len(prof)

    def terciles(vals):
        s = sorted(vals)
        return s[(1 * (n - 1)) // 3], s[(2 * (n - 1)) // 3]

    t_r = terciles(p[0] for p in prof.values())
    t_f = terciles(p[1] for p in prof.values())
    t_m = terciles(p[2] for p in prof.values())
    for u, (ts, fq, mon) in prof.items():
        r = (ts > t_r[0]) + (ts > t_r[1])
        f = (fq > t_f[0]) + (fq > t_f[1])
        m = (mon > t_m[0]) + (mon > t_m[1])
        got = out[u]
        assert (
            int(got["last_ts"]),
            int(got["freq"]),
            int(got["monetary_micro"]),
            int(got["r"]),
            int(got["f"]),
            int(got["m"]),
            int(got["rfm"]),
        ) == (ts, fq, mon, r, f, m, 100 * r + 10 * f + m), u
    # negative spend floors correctly: -3.5 -> -3500000
    assert int(out[4]["monetary_micro"]) == -3_500_000
