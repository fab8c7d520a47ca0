"""Grouped top-k (the ``row_number() OVER (PARTITION BY g ORDER BY v
DESC, id)`` window pattern) as a Ray Data composition.

The reference engine has no window surface (its per-run sort+limit,
``/root/reference/src/search.rs:99-123``, is global top-k only); this is
the grouped form a training-data pipeline needs (best docs per language
/ domain / shard).

Scale design — two stages, both vectorized:

1. **Map-side partial prune**: each batch keeps at most k rows per group
   (every global top-k row is inside its own batch's per-group top-k, so
   the prune is lossless). The shuffle then carries ≤ k × groups-per-batch
   rows per batch instead of the whole table.
2. **One hash-partition shuffle on the group column** (the ``exact_dedup``
   pattern, shared ``partition_ids`` arithmetic): each reduce task gets
   whole groups and runs a single mergesort + run-boundary rank pass —
   no per-group Python, any number of groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.functions.dedup import arrow_out, partition_ids


def run_bounds(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(new_run, starts, run_of) over adjacent equality of a SORTED Arrow
    array — THE shared run-boundary idiom for every sort-then-scan
    operator in this module (and funnel.py). Dictionary codes give a
    cheap neighbor-inequality test on strings (codes are batch-local;
    only equality of neighbors is used); parquet may hand the column
    already dictionary-encoded."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        e = np.empty(0, dtype=np.int64)
        return e.astype(bool), e, e
    if not pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_encode()
    codes = np.asarray(arr.indices).astype(np.int64)
    new_run = np.concatenate(([True], codes[1:] != codes[:-1]))
    starts = np.flatnonzero(new_run)
    return new_run, starts, np.cumsum(new_run) - 1


def _topk_per_run(
    t: pa.Table, group_col: str, order_col: str, id_col: str, k: int
) -> tuple[pa.Table, np.ndarray]:
    """Sort ``t`` by (group asc, order desc, id asc) and return the sorted
    table plus each row's 1-based rank within its group run."""
    idx = pc.sort_indices(
        t,
        sort_keys=[
            (group_col, "ascending"),
            (order_col, "descending"),
            (id_col, "ascending"),
        ],
    )
    t = t.take(idx)
    n = t.num_rows
    if n == 0:
        return t, np.empty(0, dtype=np.int64)
    _, starts, run_of = run_bounds(t[group_col])
    rnk = np.arange(n, dtype=np.int64) - starts[run_of] + 1
    return t, rnk


def grouped_topk_ds(
    ds,
    group_col: str,
    order_col: str,
    *,
    id_col: str,
    k: int = 3,
    num_partitions: int = 32,
):
    """Top-k rows per group by (``order_col`` desc, ``id_col`` asc).

    Returns a Dataset of (group_col, id_col, order_col, rn) with
    ``rn`` ∈ [1, k] — exactly ``row_number() OVER (PARTITION BY group
    ORDER BY order DESC, id)`` filtered to rn ≤ k. Deterministic total
    order within each group (id breaks ties).
    """
    import pandas as pd

    cols = [group_col, id_col, order_col]

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        t, rnk = _topk_per_run(t, group_col, order_col, id_col, k)
        t = t.filter(pa.array(rnk <= k))
        return t.append_column(
            "__part", pa.array(partition_ids(t, [group_col], num_partitions))
        )

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            [group_col, order_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        n = len(g)
        if n == 0:
            out = g.iloc[0:0][[group_col, id_col, order_col]].copy()
            out["rn"] = np.empty(0, dtype=np.int64)
            return arrow_out(out)
        grp = g[group_col].to_numpy()
        new_run = np.concatenate(([True], grp[1:] != grp[:-1]))
        starts = np.flatnonzero(new_run)
        run_of = np.cumsum(new_run) - 1
        rnk = np.arange(n, dtype=np.int64) - starts[run_of] + 1
        keep = rnk <= k
        return arrow_out(
            pd.DataFrame(
                {
                    group_col: grp[keep],
                    id_col: g[id_col].to_numpy()[keep],
                    order_col: g[order_col].to_numpy()[keep],
                    "rn": rnk[keep],
                }
            )
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pandas")
    )


def grouped_running_ds(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    cum_col: str = "cum",
    delta_col: str = "delta",
    num_partitions: int = 32,
):
    """Per-key running aggregates — ``sum(v) OVER (PARTITION BY key ORDER
    BY order ROWS UNBOUNDED PRECEDING)`` and ``v - lag(v) OVER (...)`` —
    as a Ray Data composition (the reference has no window surface; see
    grouped_topk_ds above for the family rationale).

    ``value_col`` must be a non-null integer column (integer cumsum is
    order-of-evaluation-free, so the result is bit-stable across engines;
    callers quantize floats first — the fixed-point oracle convention).
    ``order_cols`` must be a per-key unique ordering (include an id
    column) or run output is nondeterministic.

    Scale design: running aggregates cannot be map-side pruned (every row
    is output), so this is ONE hash-partition shuffle on the key (shared
    ``partition_ids`` arithmetic) and one vectorized mergesort +
    run-boundary cumsum pass per partition — no per-group Python, any
    number of keys. ``delta`` is null on each key's first row; callers
    wanting lag-default-0 semantics coalesce it downstream
    (``pc.coalesce(delta, v)``).
    """
    cols = [key_col, *order_cols, value_col]

    def tag(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        return t.append_column(
            "__part", pa.array(partition_ids(t, [key_col], num_partitions))
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in [key_col, *order_cols]]
        )
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return t.append_column(cum_col, pa.array([], pa.int64())).append_column(
                delta_col, pa.array([], pa.int64())
            )
        vcol = t[value_col].combine_chunks()
        if vcol.null_count:
            raise ValueError(
                f"grouped_running_ds: {value_col} has nulls; "
                "quantize/fill upstream"
            )
        v = vcol.to_numpy(zero_copy_only=False).astype(np.int64)
        new_run, starts, run_of = run_bounds(t[key_col])
        total = np.cumsum(v)
        base = (total[starts] - v[starts])[run_of]
        cum = total - base
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = v[:-1]
        prev[0] = 0
        delta = pa.array(v - prev, type=pa.int64(), mask=new_run)
        return t.append_column(cum_col, pa.array(cum)).append_column(
            delta_col, delta
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def rollup_sum_ds(
    ds,
    dims: list[str],
    value_col: str,
    *,
    total_label: str = "<all>",
    sum_col: str | None = None,
    count_col: str = "n",
):
    """``GROUP BY ROLLUP(dims)`` with sum + count — the subtotal/grand-
    total reporting shape. One combiner-aggregated groupby per rollup
    level (each level's shuffle carries only its pre-aggregated partial
    rows); aggregated-out dims are filled with ``total_label`` (callers
    spell the same ``coalesce`` in SQL twins), levels unioned.

    ``value_col`` must be integer (bit-stable sums across engines —
    quantize floats upstream). Dim columns must be non-null strings:
    the total label fills aggregated-out dims in the same column, and a
    null dim would collide with a SQL twin's ``coalesce`` — both are
    raised on, not silently mangled. Level count is len(dims)+1, so the
    extra cost over a flat groupby is one tiny shuffle per rollup level.
    """
    from ray.data.aggregate import Sum

    scol = sum_col or f"{value_col}_sum"

    def level_ds(keep: list[str]):
        def partial(b: pa.Table) -> pa.Table:
            for d in keep:
                col = b[d]
                if not (
                    pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type)
                ):
                    raise TypeError(
                        f"rollup_sum_ds: dim {d!r} must be a string "
                        f"column (got {col.type}); cast upstream"
                    )
                if col.null_count:
                    raise ValueError(
                        f"rollup_sum_ds: dim {d!r} has nulls; fill "
                        "upstream (they would collide with the total "
                        "label under SQL coalesce)"
                    )
            cols = {c: b[c] for c in keep}
            cols["__v"] = b[value_col]
            t = pa.table(cols)
            if not keep:
                t = t.append_column(
                    "__g", pa.array(np.zeros(t.num_rows, dtype=np.int64))
                )
            gcols = keep or ["__g"]
            return t.group_by(gcols).aggregate([("__v", "sum"), ("__v", "count")])

        gkey = keep if len(keep) > 1 else (keep[0] if keep else "__g")
        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(gkey)
            .aggregate(
                Sum("__v_sum", alias_name=scol),
                Sum("__v_count", alias_name=count_col),
            )
        )

        def unify(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {}
            for d in dims:
                cols[d] = (
                    b[d]
                    if d in keep
                    else pa.array([total_label] * n, pa.string())
                )
            cols[scol] = b[scol].cast(pa.int64())
            cols[count_col] = b[count_col].cast(pa.int64())
            return pa.table(cols)

        return agg.map_batches(unify, batch_format="pyarrow")

    out = level_ds(list(dims))
    for lvl in range(len(dims) - 1, -1, -1):
        out = out.union(level_ds(list(dims[:lvl])))
    return out


def grouped_range_window_ds(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    window: int,
    carry_cols: list[str] | None = None,
    sum_col: str = "w_sum",
    count_col: str = "w_n",
    num_partitions: int = 32,
):
    """Per-key trailing time-range window aggregates: for every row, the
    sum and count of ``value_col`` over rows of the same key whose ts
    lies in ``[ts - window, ts]`` — SQL's ``RANGE BETWEEN window
    PRECEDING AND CURRENT ROW`` (a VALUE-based frame: all rows tied with
    the current ts are included regardless of position, which is why the
    result is well-defined without a unique ordering).

    ``ts_col`` may be integer or timestamp[us] (window is then in µs);
    ``value_col`` must be non-null integer (bit-stable sums). One
    hash-partition shuffle on the key, then per partition a single
    sort + TWO vectorized ``searchsorted`` passes over a run-offset
    composite timestamp (each key's ts values are shifted onto a
    disjoint segment, so one global binary search answers every row's
    frame bounds) and a prefix-sum gather — no per-key Python.
    """
    carry = list(carry_cols or [])
    cols = [key_col, ts_col, value_col, *carry]

    def tag(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        return t.append_column(
            "__part", pa.array(partition_ids(t, [key_col], num_partitions))
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]
        )
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return t.append_column(sum_col, pa.array([], pa.int64())).append_column(
                count_col, pa.array([], pa.int64())
            )
        tscol = t[ts_col].combine_chunks()
        if tscol.null_count:  # int64-with-null would detour via float64
            raise ValueError(f"grouped_range_window_ds: {ts_col} has nulls")
        ts = tscol.to_numpy(zero_copy_only=False)
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").view(np.int64)
        else:
            ts = ts.astype(np.int64)
        vcol = t[value_col].combine_chunks()
        if vcol.null_count:
            raise ValueError(
                f"grouped_range_window_ds: {value_col} has nulls"
            )
        v = vcol.to_numpy(zero_copy_only=False).astype(np.int64)
        _, _, run_of = run_bounds(t[key_col])
        lo, hi = int(ts.min()), int(ts.max())
        span = hi - lo
        offset = span + int(window) + 1
        n_runs = int(run_of[-1]) + 1
        if n_runs * offset >= 2**62:  # composite would overflow int64
            raise ValueError(
                "grouped_range_window_ds: ts span x keys-per-partition "
                "overflows the composite timestamp; raise num_partitions"
            )
        ts2 = run_of * np.int64(offset) + (ts - np.int64(lo))
        left = np.searchsorted(ts2, ts2 - np.int64(window), side="left")
        right = np.searchsorted(ts2, ts2, side="right")
        prefix = np.concatenate(([0], np.cumsum(v)))
        return t.append_column(
            sum_col, pa.array(prefix[right] - prefix[left])
        ).append_column(count_col, pa.array(right - left))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_rank_percentile_ds(
    ds,
    group_col: str,
    value_col: str,
    *,
    pct_col: str = "pct_micro",
    scale: int = 10**6,
    num_partitions: int = 32,
    id_cols: list[str] | None = None,
):
    """Per-group value-rank percentile for every row:

        pct = (# rows in the group with value < v) * scale // n_group

    — the ``(rank() OVER (PARTITION BY g ORDER BY v) - 1)`` convention
    (ties share the lowest rank), pure integers after the rank, so any
    engine replays it bit-exactly.

    Shape: the grouped_running_ds skeleton — ONE hash-partition shuffle
    on the group key, then per partition one mergesort by (group, value)
    and a vectorized first-occurrence-rank pass (change-boundary maximum
    accumulate; no per-group Python at any group count).
    """

    carry = list(id_cols or [])

    def tag(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col, *carry])
        return t.append_column(
            "__part", pa.array(partition_ids(t, [group_col], num_partitions))
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t,
            sort_keys=[(group_col, "ascending"), (value_col, "ascending")],
        )
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return t.append_column(pct_col, pa.array([], pa.int64()))
        vcol = t[value_col].combine_chunks()
        if vcol.null_count:
            raise ValueError(
                f"grouped_rank_percentile_ds: {value_col} has nulls; "
                "filter upstream"
            )
        v = vcol.to_numpy(zero_copy_only=False)
        # NaN breaks the tie detection (NaN != NaN gives tied NaNs
        # DISTINCT increasing ranks, diverging from SQL rank()) — the
        # operator's domain is finite values, like the quantile family
        if v.dtype.kind == "f" and not np.isfinite(v).all():
            raise ValueError(
                f"grouped_rank_percentile_ds: {value_col} has non-finite "
                "values; filter upstream"
            )
        new_run, starts, run_of = run_bounds(t[group_col])
        sizes = np.diff(np.append(starts, n))
        # first-occurrence rank via GLOBAL indices: maximum.accumulate
        # over (global index where the value or group changes, else 0)
        # carries each tie run's first position forward and resets
        # naturally at run starts — a run's starting global index always
        # exceeds every earlier one, so no cross-run leakage (an in-run
        # position accumulate WOULD leak the previous run's larger rank)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (v[1:] != v[:-1])
        change |= new_run
        gidx = np.arange(n, dtype=np.int64)
        first = np.where(change, gidx, 0)
        np.maximum.accumulate(first, out=first)
        rank = first - starts[run_of]
        pct = (rank * np.int64(scale)) // sizes[run_of]
        return t.append_column(pct_col, pa.array(pct))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )
