"""Distributed second-moment statistics: grouped Pearson correlation and
dyadic time-decayed aggregation.

Both are exact-integer contracts so any engine replays them bit-for-bit:

- :func:`grouped_corr_ds` works on caller-quantized int64 ``x``/``y``
  columns. Per-batch partial moment sums (n, Σx, Σy, Σx², Σy², Σxy) via a
  pyarrow group_by combiner, ONE small groupby-sum shuffle (one row per
  group), then a per-group finisher computing
  ``corr_micro = sign(num) * (|num| * 10^6 // isqrt(vx * vy))`` in
  arbitrary-precision Python ints (num = n·Σxy − Σx·Σy, vx = n·Σx² − Σx²,
  vy analogous). |num| ≤ isqrt(vx·vy) by Cauchy-Schwarz so the result is
  a true micro-correlation in [−10^6, 10^6]; a zero-variance group (or an
  empty one) reports 0 by contract. The finisher runs inside map_batches
  over the aggregated (one-row-per-group) dataset — O(groups) Python after
  full vectorized aggregation, never per input row.

- :func:`decayed_topk_ds` scores each key by
  ``Σ floor(value·scale + 0.5) · 2^(horizon − age_days)`` over rows with
  ``0 ≤ age_days ≤ horizon`` (``age_days = (anchor_us − ts_us) //
  86400e6``; rows after the anchor or past the horizon weigh 0) — dyadic
  exponential decay, pure int64. Per-batch group_by partials, one
  groupby-sum, per-block top-k prune before the final k-row sort.
  Overflow bound: per-row contribution ≤ scale·max|value|·2^horizon; keep
  ``horizon`` small enough that a key's sum fits int64 (the default
  horizon=24 leaves ~2^19 rows of headroom at value≤10^4, scale=100).

Reference scope note: the reference engine has no statistics surface
(SURVEY §2.9 — analytics family the new engine adds).
"""

from __future__ import annotations

from math import isqrt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US_PER_DAY = 86_400_000_000


def _rename(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


def grouped_corr_ds(ds, key_col: str, x_col: str, y_col: str, *, scale: int = 1_000_000):
    """Per-group Pearson correlation of two int64 columns, exact
    fixed-point. Returns a Dataset of (key_col, n, corr_micro) —
    ``corr_micro`` = correlation in millionths, floor of the magnitude
    (sign applied after, so SQL's truncating ``//`` matches). Null keys
    and null x/y rows are dropped.

    Domain contract: per-row ``x²``/``y²`` must fit int64 —
    ``|x| > isqrt(2^63−1)`` raises rather than silently wrapping (the
    SQL twin computes in int128; a wrapped numpy product would diverge
    with no error). The per-group moment sums must also fit int64
    (quantize with a smaller scale for huge groups)."""
    from ray.data.aggregate import Sum

    x_cap = isqrt(2**63 - 1)

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key_col, x_col, y_col])
        valid = pc.and_(
            pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[x_col])),
            pc.is_valid(t[y_col]),
        )
        t = t.filter(valid)
        x = pc.cast(t[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        for arr in (x, y):
            if len(arr) and int(np.abs(arr).max()) > x_cap:
                raise ValueError(
                    "grouped_corr_ds: |x| or |y| exceeds the int64 "
                    "square bound — quantize with a smaller scale"
                )
        moments = pa.table(
            {
                key_col: t[key_col],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )
        g = moments.group_by(key_col).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
        )
        return _rename(g, {f"{c}_sum": c for c in ("n", "sx", "sy", "sxx", "syy", "sxy")})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
    )

    def finish(t: pa.Table) -> pa.Table:
        # one row per group here: exact big-int math, O(groups) not O(rows)
        out_corr = []
        n_l = t["n"].to_pylist()
        sx_l, sy_l = t["sx"].to_pylist(), t["sy"].to_pylist()
        sxx_l, syy_l, sxy_l = (
            t["sxx"].to_pylist(),
            t["syy"].to_pylist(),
            t["sxy"].to_pylist(),
        )
        for n, sx, sy, sxx, syy, sxy in zip(n_l, sx_l, sy_l, sxx_l, syy_l, sxy_l):
            num = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            den = isqrt(vx * vy)
            if den == 0:
                out_corr.append(0)
            else:
                mag = (abs(num) * scale) // den
                out_corr.append(-mag if num < 0 else mag)
        return pa.table(
            {
                key_col: t[key_col],
                "n": t["n"].cast(pa.int64()),
                "corr_micro": pa.array(out_corr, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def decayed_topk_ds(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    anchor_us: int,
    horizon_days: int = 24,
    scale: int = 100,
    k: int = 20,
):
    """Top-k keys by dyadic time-decayed value sum (see module doc).
    Returns a Dataset of (key_col, score) — the k highest scores,
    ties broken by ascending key. Non-finite values and null keys/ts
    drop; rows newer than the anchor or older than the horizon weigh 0."""
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.ngrams import _block_topk

    if horizon_days < 0 or horizon_days > 62:
        raise ValueError("decayed_topk_ds: horizon_days must be in [0, 62]")

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key_col, ts_col, value_col])
        t = t.filter(pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col])))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        t = t.filter(pa.array(fin))
        v = v[fin]
        cents = np.floor(v * scale + 0.5).astype(np.int64)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        delta = np.int64(anchor_us) - ts
        # floor==truncate on the non-negative deltas; negatives are masked
        age = delta // np.int64(US_PER_DAY)
        ok = (delta >= 0) & (age <= horizon_days)
        shift = np.where(ok, np.int64(horizon_days) - np.where(ok, age, 0), 0)
        w = np.where(ok, np.left_shift(np.int64(1), shift), np.int64(0))
        contrib = pa.table({key_col: t[key_col], "score": pa.array(cents * w)})
        g = contrib.group_by(key_col).aggregate([("score", "sum")])
        return _rename(g, {"score_sum": "score"})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("score", alias_name="score"))
    )
    sort_keys = [("score", "descending"), (key_col, "ascending")]
    pruned = agg.map_batches(
        lambda t: _block_topk(t, k, sort_keys), batch_format="pyarrow"
    )
    return pruned.sort(["score", key_col], descending=[True, False]).limit(k)


def zscore_outliers_ds(
    ds,
    key_col: str,
    id_col: str,
    value_col: str,
    *,
    scale: int = 100,
    z: int = 3,
):
    """Per-group z-score anomaly flags with EXACT integer arithmetic:
    row x (fixed-point, ``floor(v·scale + 0.5)``) is an outlier in its
    group iff ``(n·x − S)² > z²·(n·Sxx − S²)`` — algebraically identical
    to ``(x − μ)² > z²·σ²`` (population σ) but with every quantity an
    integer, so there is no float variance to diverge on.

    The quadratic test is reduced to two per-group int64 bounds computed
    once on the driver in arbitrary-precision Python
    (``x ≥ hi_num//n + 1`` or ``x ≤ ceil(lo_num/n) − 1`` with
    ``hi/lo = S ± isqrt(z²·(n·Sxx − S²))`` — exact for integer x), so
    the row-filter pass never multiplies n·x — the product that silently
    overflows first on skewed domains (one huge x among billions of
    rows). Domain contract: per-row ``x²`` and the per-group int64 moment
    sums must fit int64 — ``|x| > isqrt(2^63−1)`` raises rather than
    wrapping. Group cardinality must be driver-sized (event types,
    languages); the moment aggregation itself is a per-batch combiner.

    Returns a Dataset of (id_col, key_col, cents) — the outlier rows —
    sorted by id. Null keys/non-finite values are excluded.
    """
    from ray.data.aggregate import Sum

    ds = ds.materialize()  # consumed twice: moments pass + flag pass
    x_cap = isqrt(2**63 - 1)

    def quantize(v: np.ndarray) -> np.ndarray:
        x = np.floor(v * scale + 0.5).astype(np.int64)
        if len(x) and int(np.abs(x).max()) > x_cap:
            raise ValueError(
                "zscore_outliers_ds: |value·scale| exceeds the int64 "
                "square bound — reduce scale"
            )
        return x

    def moments(b: pa.Table) -> pa.Table:
        t = b.select([key_col, value_col])
        t = t.filter(pc.is_valid(t[key_col]))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        t = t.filter(pa.array(fin))
        x = quantize(v[fin])
        m = pa.table(
            {
                key_col: t[key_col],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "s": pa.array(x),
                "sxx": pa.array(x * x),
            }
        )
        g = m.group_by(key_col).aggregate(
            [("n", "sum"), ("s", "sum"), ("sxx", "sum")]
        )
        return _rename(g, {"n_sum": "n", "s_sum": "s", "sxx_sum": "sxx"})

    rows = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "s", "sxx")])
        .take_all()
    )
    hi_min: dict = {}
    lo_max: dict = {}
    for r in rows:
        n, s, sxx = int(r["n"]), int(r["s"]), int(r["sxx"])
        rr = z * z * (n * sxx - s * s)
        q = isqrt(rr)
        hi_min[r[key_col]] = (s + q) // n + 1
        lo_max[r[key_col]] = -((-(s - q)) // n) - 1  # ceil(lo/n) - 1

    def flag(b: pa.Table) -> pa.Table:
        t = b.select([id_col, key_col, value_col])
        t = t.filter(pc.is_valid(t[key_col]))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        t = t.filter(pa.array(fin))
        x = quantize(v[fin])
        grp = t[key_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        uniq = pc.unique(grp)
        hi = np.array([hi_min[u.as_py()] for u in uniq], dtype=np.int64)
        lo = np.array([lo_max[u.as_py()] for u in uniq], dtype=np.int64)
        idx = pc.index_in(grp, value_set=uniq).to_numpy(zero_copy_only=False)
        idx = idx.astype(np.int64)
        mask = (x >= hi[idx]) | (x <= lo[idx])
        t = t.filter(pa.array(mask))
        return pa.table(
            {
                id_col: t[id_col],
                key_col: t[key_col],
                "cents": pa.array(x[mask]),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow").sort(id_col)


def rfm_segments_ds(
    events_ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_partitions: int = 32,
):
    """RFM user segmentation (the classic recency/frequency/monetary
    tercile analysis): per user, last-event time, event count and
    monetary mass, each bucketed 0-2 by EXACT corpus-wide tercile
    order statistics — bucket = count of thresholds strictly below the
    user's value (a user at a threshold falls to the lower bucket, the
    perplexity-buckets convention), so bucket 2 = most recent / most
    frequent / highest spend. ``rfm = 100·r + 10·f + m``.

    Exactness contract: monetary mass is per-event floor-micro
    (``floor(value·10⁶)`` — a double multiply + floor both engines
    replay bit-identically) summed as int64; recency is epoch-µs; the
    thresholds come from the exact integer-rank order statistics
    (quantiles.grouped_rank_values_ds over a constant group — one
    value shuffle per metric, a 2-row threshold table broadcast into
    the final map). One user-keyed combiner shuffle builds the profile
    table; nothing user-shaped reaches the driver.

    Returns (user_id, last_ts:int64 epoch-µs, freq:int64,
    monetary_micro:int64, r, f, m, rfm) sorted by user_id.
    """
    from ray.data.aggregate import Count, Max, Sum

    from lsearch_ray.functions.quantiles import grouped_rank_values_ds

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64())
        val = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        mon = np.floor(val * 1_000_000).astype(np.int64)
        return pa.table(
            {
                user_col: b[user_col].cast(pa.int64()),
                "ts_us": us,
                "mon": pa.array(mon),
            }
        )

    prof = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(user_col)
        .aggregate(
            Max("ts_us", alias_name="last_ts"),
            Count(alias_name="freq"),
            Sum("mon", alias_name="monetary_micro"),
        )
        .materialize()
    )

    fracs = [(1, 3), (2, 3)]

    def with_const(col: str):
        return prof.map_batches(
            lambda b, c=col: pa.table(
                {
                    "g": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                    "v": b[c].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    thresholds: dict[str, tuple[int, int]] = {}
    for col in ("last_ts", "freq", "monetary_micro"):
        rows = grouped_rank_values_ds(
            with_const(col), "g", "v", fracs,
            num_partitions=num_partitions,
        ).take_all()  # 2 rows
        by_num = {int(r["num"]): int(r["value"]) for r in rows}
        thresholds[col] = (by_num[1], by_num[2])

    def finish(b: pa.Table) -> pa.Table:
        def bucket(col: str) -> np.ndarray:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
            t1, t2 = thresholds[col]
            return (v > t1).astype(np.int64) + (v > t2).astype(np.int64)

        r = bucket("last_ts")
        f = bucket("freq")
        m = bucket("monetary_micro")
        return pa.table(
            {
                user_col: b[user_col],
                "last_ts": b["last_ts"].cast(pa.int64()),
                "freq": b["freq"].cast(pa.int64()),
                "monetary_micro": b["monetary_micro"].cast(pa.int64()),
                "r": pa.array(r),
                "f": pa.array(f),
                "m": pa.array(m),
                "rfm": pa.array(100 * r + 10 * f + m),
            }
        )

    return prof.map_batches(finish, batch_format="pyarrow").sort(user_col)
