"""Exact distributed quantiles by iterative histogram refinement.

SURVEY §2.9 aggregation family extension (the reference has only running
means, cli.rs:34-43). A sort-based quantile is an all-to-all shuffle of
the whole column; this operator instead finds the EXACT order statistic
with a few streaming passes whose driver state is one histogram:

1. one aggregate pass for (count, min, max);
2. each round, active quantiles are grouped by their CURRENT [lo, hi]
   range and one ``map_batches`` partial-histogram pass per DISTINCT
   range serves every quantile in it (all qs start from the same global
   range, so round 1 is always a single pass — not one per q) + a tiny
   groupby-sum; each quantile's target bucket becomes its next range
   (rank rebased by the mass below it);
3. once a quantile's in-range row count ≤ ``collect_limit`` its
   survivors are collected (again one pass per distinct range) and the
   answer read off with one ``np.partition``.

Convergence: each round shrinks a quantile's candidate row count to the
largest single bucket's mass; for continuous-ish values 2-3 rounds reach
the collect threshold. Constant-width rounds can stall only when one
value repeats beyond ``collect_limit`` — detected (range stops
shrinking with lo == hi impossible to split) and answered exactly with
that value. A range that stops narrowing WITHOUT collapsing to a point
(adjacent-float mass) is resolved by count-bracket bisection — streaming
``count(x <= mid)`` passes locate the smallest value whose cumulative
count exceeds the rank — so the collect pass NEVER pulls more than
``collect_limit`` rows to the driver, even on adversarial tie columns.

The result is the value at 0-indexed rank ``floor(q * (n-1))`` of the
sorted column (numpy ``'lower'`` convention) — tie-order-independent,
hence exactly SQL-expressible (ORDER BY + OFFSET).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _finite_f64(batch: pa.Table, col: str) -> np.ndarray:
    """The shared column prologue: ``col`` as a float64 ndarray with
    non-finite values (NaN/±inf) dropped — the operator's value domain."""
    v = batch[col]
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
    return vals[np.isfinite(vals)]


def _minmax_table(vals: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "lo": pa.array([float(vals.min()) if len(vals) else np.inf]),
            "hi": pa.array([float(vals.max()) if len(vals) else -np.inf]),
        }
    )


def _split_edges(lo: float, hi: float, n_buckets: int) -> np.ndarray:
    """Bucket edges over [lo, hi]; when the width overflows float64
    (lo=-1e308, hi=1e308 → linspace yields nan/inf edges), fall back to
    one overflow-free bisection (mid = lo/2 + hi/2) — coarser, but the
    next round's range is finite-width and refines normally."""
    edges = np.linspace(lo, hi, n_buckets + 1)
    if np.isfinite(edges).all():
        return edges
    return np.array([lo, lo / 2.0 + hi / 2.0, hi], dtype=np.float64)


def _histogram_pass(ds, col: str, edges: np.ndarray) -> np.ndarray:
    """Bucket counts of ``col`` over ``edges`` (one streaming pass)."""
    from ray.data.aggregate import Sum

    n_buckets = len(edges) - 1

    def hist_partial(b: pa.Table) -> pa.Table:
        vals = _finite_f64(b, col)
        vals = vals[(vals >= edges[0]) & (vals <= edges[-1])]
        # bucket i covers [edges[i], edges[i+1]); last bucket closed
        idx = np.clip(
            np.searchsorted(edges, vals, side="right") - 1, 0, n_buckets - 1
        )
        uniq, cnt = np.unique(idx, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(uniq.astype(np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    counts = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        counts[int(r["bucket"])] = int(r["c"])
    return counts


# telemetry: rows pulled driver-side by the most recent exact_quantiles
# collect pass (max over its ranges) — lets tests assert the driver-row
# budget holds on tie-heavy fixtures
LAST_COLLECTED_ROWS: int = 0


def _count_le(ds, col: str, v: float) -> int:
    """ONE streaming pass: how many finite rows have value <= v."""
    from ray.data.aggregate import Sum

    def cnt(b: pa.Table) -> pa.Table:
        vals = _finite_f64(b, col)
        return pa.table(
            {"n": pa.array([int((vals <= v).sum())], type=pa.int64())}
        )

    agg = ds.map_batches(cnt, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n")
    )
    return int(agg["n"] or 0)


def _rank_value_by_counts(ds, col: str, lo: float, hi: float, rank: int) -> float:
    """The global rank-th (0-indexed) order statistic, known to lie in
    [lo, hi], via float bisection on ``count(x <= mid)`` — NO row
    collection, so tie runs of any size cost only O(log ulps-in-range)
    streaming count passes (the stalled ranges this serves are already
    narrowed to a few ulps, so a handful in practice).

    Invariant: the answer is the smallest v with count(x <= v) > rank;
    that v is always a data value (a smaller float would have the same
    cumulative count, contradicting minimality)."""
    a, b = float(lo), float(hi)
    while a < b:
        mid = a / 2.0 + b / 2.0  # overflow-free midpoint
        if not (a <= mid < b):
            mid = a  # adjacent floats: probe the lower endpoint
        if _count_le(ds, col, mid) > rank:
            b = mid
        else:
            a = float(np.nextafter(mid, np.inf))
    return a


def exact_quantiles(
    ds,
    col: str,
    qs: list[float],
    *,
    n_buckets: int = 2048,
    collect_limit: int = 200_000,
    max_rounds: int = 64,
) -> pa.Table:
    """Exact order statistics for each q in ``qs`` (see module doc).

    Returns a table (q: float64, value: float64) in input q order.
    """
    # NaN-aware (count, min, max) in ONE streaming pass: Ray's Count
    # counts NaN rows (they are not null) and Min/Max can propagate NaN,
    # which would desynchronize n from the histogram passes (those filter
    # NaN via the range predicate) and index past the histogram. The
    # contract: quantiles are over the column's FINITE values.
    def stats_partial(b: pa.Table) -> pa.Table:
        vals = _finite_f64(b, col)
        return _minmax_table(vals).append_column(
            "n", pa.array([len(vals)], type=pa.int64())
        )

    from ray.data.aggregate import Max, Min, Sum

    agg = ds.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Min("lo", alias_name="lo"), Max("hi", alias_name="hi")
    )
    n = int(agg["n"] or 0)
    if n == 0:
        return pa.table(
            {
                "q": pa.array([float(q) for q in qs], type=pa.float64()),
                "value": pa.array([float("nan")] * len(qs), type=pa.float64()),
            }
        )
    glo, ghi = float(agg["lo"]), float(agg["hi"])
    # per-quantile state: target rank, current range, mass below lo,
    # rows inside the range, resolved answer (None while active);
    # "give_up" marks ranges refinement cannot shrink (repeated value
    # wider than a point) so they stop burning histogram passes
    state = [
        {
            "rank": int(math.floor(q * (n - 1))),
            "lo": glo,
            "hi": ghi,
            "below": 0,
            "inside": n,
            "answer": glo if glo == ghi else None,
            "give_up": False,
        }
        for q in qs
    ]

    def minmax_in_range(lo: float, hi: float, last: bool) -> tuple[float, float]:
        """(min, max) of the finite values in [lo, hi) — the stall probe."""

        def mm(b: pa.Table) -> pa.Table:
            vals = _finite_f64(b, col)
            m = (vals >= lo) & ((vals <= hi) if last else (vals < hi))
            return _minmax_table(vals[m])

        a = ds.map_batches(mm, batch_format="pyarrow").aggregate(
            Min("lo", alias_name="lo"), Max("hi", alias_name="hi")
        )
        return float(a["lo"]), float(a["hi"])

    for _ in range(max_rounds):
        active = [
            s
            for s in state
            if s["answer"] is None
            and not s["give_up"]
            and s["inside"] > collect_limit
        ]
        if not active:
            break
        # ONE histogram pass per DISTINCT range serves every quantile in
        # it (round 1: all qs share the global range → a single pass)
        by_range: dict[tuple[float, float], list[dict]] = {}
        for s in active:
            by_range.setdefault((s["lo"], s["hi"]), []).append(s)
        # stalled members queue up per DISTINCT range so the stall probe
        # (a full streaming pass) runs once per range, shared — the same
        # dedup the histogram pass gets
        stalled_by_range: dict[tuple[float, float], list[dict]] = {}
        for (lo, hi), members in by_range.items():
            edges = _split_edges(lo, hi, n_buckets)
            counts = _histogram_pass(ds, col, edges)
            cum = np.cumsum(counts)
            for s in members:
                tgt = s["rank"] - s["below"]
                b_idx = int(np.searchsorted(cum, tgt + 1))
                new_inside = int(counts[b_idx])
                new_below = s["below"] + (int(cum[b_idx - 1]) if b_idx else 0)
                new_lo = float(edges[b_idx])
                new_hi = float(edges[b_idx + 1])
                if new_lo == new_hi:
                    # zero-width bucket: only one representable value
                    s["answer"] = new_lo
                    continue
                stalled = (
                    new_inside == s["inside"]
                    and new_lo == s["lo"]
                    and new_hi == s["hi"]
                )
                s["lo"], s["hi"] = new_lo, new_hi
                s["below"], s["inside"] = new_below, new_inside
                if stalled:
                    stalled_by_range.setdefault(
                        (s["lo"], s["hi"]), []
                    ).append(s)
        for (lo, hi), members in stalled_by_range.items():
            # mass concentrated: probe the ACTUAL value range in the
            # bucket — a point mass answers immediately, a tighter span
            # keeps refining, no tightening means refinement is done
            # (adjacent-float mass; resolved below by count-bracket
            # bisection, never a driver-side collect)
            mn, mx = minmax_in_range(lo, hi, hi == ghi)
            if mn == mx:
                for s in members:
                    s["answer"] = mn
                continue
            # half-open upper bound that still contains mx; clamp the
            # max-float edge case where nextafter overflows to inf
            th = float(np.nextafter(mx, np.inf))
            if not np.isfinite(th):
                th = ghi  # hi == ghi → the collect/probe treat it closed
            tight = (mn, th)
            for s in members:
                if tight == (s["lo"], s["hi"]):
                    s["give_up"] = True
                else:
                    s["lo"], s["hi"] = tight

    # collect pass: again one pass per distinct remaining range; ranges
    # whose row count exceeds the driver budget (refinement gave up —
    # massive tie runs) are resolved by count-bracket bisection instead,
    # so LAST_COLLECTED_ROWS never exceeds collect_limit
    global LAST_COLLECTED_ROWS
    LAST_COLLECTED_ROWS = 0
    pending: dict[tuple[float, float], list[dict]] = {}
    for s in state:
        if s["answer"] is None:
            pending.setdefault((s["lo"], s["hi"]), []).append(s)
    for (lo, hi), members in pending.items():
        last = hi == ghi  # last bucket is closed at the global max
        if any(s["inside"] > collect_limit for s in members):
            for s in members:
                s["answer"] = _rank_value_by_counts(
                    ds, col, lo, hi, s["rank"]
                )
            continue

        def in_range(b: pa.Table, lo=lo, hi=hi, last=last) -> pa.Table:
            m = pc.and_(
                pc.greater_equal(b[col], pa.scalar(lo)),
                pc.less_equal(b[col], pa.scalar(hi))
                if last
                else pc.less(b[col], pa.scalar(hi)),
            )
            return b.filter(m).select([col])

        vals = (
            ds.map_batches(in_range, batch_format="pyarrow")
            .to_pandas()[col]
            .to_numpy()
            .astype(np.float64)
        )
        LAST_COLLECTED_ROWS = max(LAST_COLLECTED_ROWS, len(vals))
        for s in members:
            k_in = s["rank"] - s["below"]
            s["answer"] = float(np.partition(vals, k_in)[k_in])

    return pa.table(
        {
            "q": pa.array([float(q) for q in qs], type=pa.float64()),
            "value": pa.array(
                [s["answer"] for s in state], type=pa.float64()
            ),
        }
    )


def grouped_quantiles_ds(
    ds,
    group_col: str,
    value_col: str,
    qs: list[float],
    *,
    num_partitions: int = 64,
):
    """Exact per-group order statistics: for each group and each q, the
    value at 0-indexed rank ``floor(q * (n_g - 1))`` of the group's sorted
    FINITE values (the same 'lower' convention as ``exact_quantiles``, so
    the result is tie-order-independent and SQL-expressible).

    Returns a Dataset of (group_col, q, value).

    Scale plan: ONE hash-partition shuffle on the group column (shared
    ``partition_ids`` arithmetic) carrying only (group, value); within a
    partition a single mergesort + run-boundary gather answers every
    (group, q) — vectorized across all groups at once, no per-group
    Python. Assumes any single group's rows fit one reduce task (per-user
    / per-domain shapes); a group spanning a large fraction of the corpus
    should use the driver-coordinated ``exact_quantiles`` histogram
    refinement instead, which never shuffles.
    """
    import pandas as pd

    from lsearch_ray.functions.dedup import arrow_out, partition_ids

    qs = [float(q) for q in qs]

    def add_part(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col])
        vals = t[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        finite = np.isfinite(vals.to_numpy(zero_copy_only=False).astype(np.float64))
        t = t.filter(pa.array(finite))
        return t.append_column(
            "__part", pa.array(partition_ids(t, [group_col], num_partitions))
        )

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([group_col, value_col], kind="mergesort")
        grp = g[group_col].to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)
        n = len(grp)
        if n == 0:
            return arrow_out(
                pd.DataFrame(
                    {
                        group_col: g[group_col].iloc[0:0],
                        "q": np.empty(0, dtype=np.float64),
                        "value": np.empty(0, dtype=np.float64),
                    }
                )
            )
        new_run = np.concatenate(([True], grp[1:] != grp[:-1]))
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, n))
        out_g, out_q, out_v = [], [], []
        for q in qs:
            # vectorized across ALL groups in the partition at once
            ranks = np.floor(q * (counts - 1)).astype(np.int64)
            idx = starts + ranks
            out_g.append(grp[starts])
            out_q.append(np.full(len(starts), q, dtype=np.float64))
            out_v.append(vals[idx])
        return arrow_out(
            pd.DataFrame(
                {
                    group_col: np.concatenate(out_g),
                    "q": np.concatenate(out_q),
                    "value": np.concatenate(out_v),
                }
            )
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pandas")
    )


def grouped_rank_values_ds(
    ds,
    group_col: str,
    value_col: str,
    fracs: list[tuple[int, int]],
    *,
    num_partitions: int = 64,
):
    """Exact per-group order statistics at INTEGER rank fractions: for
    each group g (n_g rows) and each ``(num, den)`` in ``fracs``, the
    value at 0-indexed rank ``(num * (n_g - 1)) // den`` of the group's
    ascending values.

    The integer-rank variant of :func:`grouped_quantiles_ds`: rank
    arithmetic is exact (``floor(q * (n-1))`` in float64 can round
    ``(1/3)·3k`` down to ``k-1``), and the value column keeps its dtype
    (int64 in, int64 out — no float round-trip). Returns a Dataset of
    ``(group_col, num, den, value)``.

    Scale plan: identical to grouped_quantiles_ds — ONE hash-partition
    shuffle on the group column carrying (group, value); a mergesort +
    run-boundary gather answers every (group, frac) vectorized across
    all groups in the partition.
    """
    import pandas as pd

    from lsearch_ray.functions.dedup import arrow_out, partition_ids

    fracs = [(int(a), int(b)) for a, b in fracs]
    for _, den in fracs:
        if den <= 0:
            raise ValueError("rank fraction denominators must be positive")

    def add_part(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col])
        vals = t[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        t = t.filter(vals.is_valid())
        return t.append_column(
            "__part", pa.array(partition_ids(t, [group_col], num_partitions))
        )

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([group_col, value_col], kind="mergesort")
        grp = g[group_col].to_numpy()
        vals = g[value_col].to_numpy()
        n = len(grp)
        if n == 0:
            return arrow_out(
                pd.DataFrame(
                    {
                        group_col: g[group_col].iloc[0:0],
                        "num": np.empty(0, dtype=np.int64),
                        "den": np.empty(0, dtype=np.int64),
                        "value": g[value_col].iloc[0:0],
                    }
                )
            )
        new_run = np.concatenate(([True], grp[1:] != grp[:-1]))
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, n))
        out = []
        for num, den in fracs:
            ranks = (num * (counts - 1)) // den
            idx = starts + ranks
            out.append(
                pd.DataFrame(
                    {
                        group_col: grp[starts],
                        "num": np.full(len(starts), num, dtype=np.int64),
                        "den": np.full(len(starts), den, dtype=np.int64),
                        "value": vals[idx],
                    }
                )
            )
        return arrow_out(pd.concat(out, ignore_index=True))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pandas")
    )


def value_percentiles_ds(
    ds,
    value_col: str,
    *,
    pct_col: str = "pct_micro",
    scale: int = 10**6,
    max_distinct: int = 1_000_000,
):
    """Annotate every row with its global value-rank percentile:

        pct = (# rows with value < v) * scale // n      (floor micro units)

    — the ``(rank() OVER (ORDER BY v) - 1)`` convention, so ties share the
    lowest rank and any engine replays it bit-exactly. ``value_col`` must
    be integer (discrete-valued — doc lengths, counts, scores in fixed
    point).

    Scale shape: one per-batch partial ``value_counts`` combiner feeding a
    tiny groupby (one row per DISTINCT value — bounded by the value
    domain, not the row count), collected to the driver, prefix-summed
    into a rank table, and broadcast into a stateless annotate pass. No
    row-scale shuffle at all. Raises if the distinct-value count exceeds
    ``max_distinct`` (continuous domains belong to exact_quantiles'
    histogram refinement instead).
    """
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.dedup import value_counts_table

    def partial(b: pa.Table) -> pa.Table:
        return value_counts_table(b[value_col], "v", "c")

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    rows = [r for r in rows if r["v"] is not None]
    if len(rows) > max_distinct:
        raise ValueError(
            f"value_percentiles_ds: {len(rows)} distinct values exceeds "
            f"max_distinct={max_distinct}; use exact_quantiles for "
            "continuous domains"
        )
    rows.sort(key=lambda r: r["v"])
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["c"] for r in rows], dtype=np.int64)
    n = int(cnts.sum())
    below = np.concatenate(([0], np.cumsum(cnts)[:-1])) if len(cnts) else cnts

    def annotate(b: pa.Table) -> pa.Table:
        v = b[value_col].combine_chunks()
        if v.null_count:
            raise ValueError(
                f"value_percentiles_ds: {value_col} has nulls; filter first"
            )
        x = v.to_numpy(zero_copy_only=False).astype(np.int64)
        pct = (below[np.searchsorted(vals, x)] * scale) // n
        return b.append_column(pct_col, pa.array(pct.astype(np.int64)))

    return ds.map_batches(annotate, batch_format="pyarrow")


def equi_width_hist_ds(
    ds,
    value_col: str,
    *,
    width_micro: int = 250_000,
    bucket_col: str = "bucket",
):
    """Equi-width histogram of a float column in fixed-point micro units:
    rows land in ``bucket = floor(v·1e6 + 0.5) // width_micro`` (floor
    division — negative values bucket toward -inf identically on every
    engine). Non-finite values are excluded, matching the exact-quantile
    family's finite-values contract.

    Pure combiner shape: one per-batch bucket value_counts partial into a
    bucket-keyed groupby-sum — the exchange carries one row per distinct
    bucket per batch, never per row. Returns a Dataset
    ``(bucket, n)`` sorted by bucket.
    """
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.dedup import value_counts_table

    if width_micro <= 0:
        raise ValueError("equi_width_hist_ds: width_micro must be > 0")

    def partial(b: pa.Table) -> pa.Table:
        v = _finite_f64(b, value_col)
        micro = np.floor(v * 1e6 + 0.5).astype(np.int64)
        buckets = micro // np.int64(width_micro)
        return value_counts_table(pa.array(buckets), bucket_col, "c")

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(bucket_col)
        .aggregate(Sum("c", alias_name="n"))
        .sort(bucket_col)
    )


def grouped_mad_ds(ds, group_col: str, value_col: str, *, num_partitions: int = 16):
    """Per-group median absolute deviation (robust scale estimate):
    ``median = lower-convention p50`` of the group's finite values (the
    grouped_quantiles_ds contract), ``mad = p50 of |v − median|`` over
    the same rows. |v − median| is ONE IEEE double subtract of a value
    that is itself an exact data point, so every engine produces
    bit-identical deviations and therefore identical order statistics.

    Returns a Dataset of (group_col, median, mad) sorted by group.

    Scale note: the per-group medians are collected to the driver and
    broadcast into the deviation pass — group cardinality must be
    driver-sized (languages, event types, domains). Beyond that, swap
    the broadcast for a hash join on group_col; the two
    grouped_quantiles_ds shuffles are unchanged.
    """
    base = ds.materialize()
    med_rows = grouped_quantiles_ds(
        base, group_col, value_col, [0.5], num_partitions=num_partitions
    ).take_all()
    meds = {r[group_col]: float(r["value"]) for r in med_rows}

    def absdev(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col])
        t = t.filter(pc.is_valid(t[group_col]))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        t = t.filter(pa.array(fin))
        v = v[fin]
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        uniq = pc.unique(grp)
        med_for = np.array(
            [meds.get(u.as_py(), np.nan) for u in uniq], dtype=np.float64
        )
        idx = pc.index_in(grp, value_set=uniq).to_numpy(zero_copy_only=False)
        dev = np.abs(v - med_for[idx.astype(np.int64)])
        return pa.table({group_col: grp, "dev": pa.array(dev)})

    dev_ds = base.map_batches(absdev, batch_format="pyarrow")
    mad = grouped_quantiles_ds(
        dev_ds, group_col, "dev", [0.5], num_partitions=num_partitions
    )

    def attach(t: pa.Table) -> pa.Table:
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        med = np.array([meds[g.as_py()] for g in grp], dtype=np.float64)
        return pa.table(
            {
                group_col: grp,
                "median": pa.array(med),
                "mad": t["value"],
            }
        )

    return mad.map_batches(attach, batch_format="pyarrow").sort(group_col)


def grouped_weighted_median_ds(
    ds,
    group_col: str,
    value_col: str,
    weight_col: str,
    *,
    num_partitions: int = 16,
):
    """Per-group weighted (lower) median: the smallest value ``v`` with
    ``2 · Σ{w : value ≤ v} ≥ Σw`` — the 50% point of the weight mass,
    tie-order-free because equal values pool their weights before the
    threshold test. Weights must be non-negative int64 (quantize floats
    first); rows with null group/value/weight are dropped.

    Returns a Dataset of (group_col, wmedian) sorted by group.

    Scale shape: per-batch (group, value) weight-sum combiner, ONE
    hash-partition shuffle on the group column, then a vectorized pass
    per partition (mergesort + run-boundary weight cumsum + first-index
    crossing via reduceat) — no per-group Python.
    """
    from lsearch_ray.functions.dedup import partition_ids

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col, weight_col])
        valid = pc.and_(
            pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[value_col])),
            pc.is_valid(t[weight_col]),
        )
        t = t.filter(valid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        t = t.filter(pa.array(fin))
        agg = (
            pa.table(
                {
                    group_col: t[group_col],
                    value_col: t[value_col],
                    "w": pc.cast(t[weight_col], pa.int64()),
                }
            )
            .group_by([group_col, value_col])
            .aggregate([("w", "sum")])
        )
        agg = agg.rename_columns(
            [
                "w" if c == "w_sum" else c
                for c in agg.column_names
            ]
        )
        return agg.append_column(
            "__part", pa.array(partition_ids(agg, [group_col], num_partitions))
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), (value_col, "ascending")]
        )
        t = t.take(idx)
        if t.num_rows == 0:
            return pa.table(
                {
                    group_col: t[group_col],
                    "wmedian": pa.array([], pa.float64()),
                }
            )
        from lsearch_ray.functions.grouped import run_bounds

        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        _, starts, run_of = run_bounds(t[group_col])
        total = np.cumsum(w)
        run_prev = (total[starts] - w[starts])[run_of]
        cum = total - run_prev  # within-run inclusive cumsum
        ends = np.append(starts[1:], len(w))
        tot_run = cum[ends - 1][run_of]  # per-run total, broadcast per row
        below = (2 * cum) < tot_run
        # weight-mass median: first index per run where 2·cum ≥ total
        n_below = np.add.reduceat(below.astype(np.int64), starts)
        first = starts + n_below
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        return pa.table(
            {
                group_col: grp.take(pa.array(starts)),
                "wmedian": pa.array(vals[first]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
        .sort(group_col)
    )
