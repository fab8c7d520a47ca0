"""Join operators (SURVEY.md §2.9 — the reference has none; the engine
needs broadcast and partitioned hash joins for hydration and analytics).

- :func:`broadcast_join` — the small-side pattern: the dimension table
  ships to every task once (Ray serializes the captured table into the
  object store with the task spec), each batch joins locally with
  Arrow's acero join kernel. No shuffle.
- :func:`hash_join` — both-sides-large: ``Dataset.join`` (hash-partitioned;
  both inputs repartitioned on the key). ``num_partitions`` controls
  reducer memory.
- :func:`broadcast_semi_join` / anti — key-set membership filters.
- :func:`skew_join` — skew-aware large-large join: hot keys (left-side
  count ≥ threshold) broadcast, cold keys hash-join, union.
- :func:`range_join` — broadcast interval join (overlapping intervals,
  left semantics).
- :func:`asof_join` — backward as-of join via hash-partition co-group +
  per-partition vectorized ``merge_asof``.
- :func:`sessionize` — the stream-shaped pattern: hash-partition on key,
  one vectorized gap-scan per partition (tumbling/sliding windows live
  in functions/windows.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def safe_partitions(requested: int, n_rows: int) -> int:
    """Effective hash-join partition count: the requested count bounded
    by (a) the live cluster's CPU count — partition counts far above the
    executor's parallelism deadlock Ray's hash-shuffle aggregators on
    small sessions — and (b) the row volume (≥64 rows per partition;
    fully-empty partitions crash the join aggregator's finalize)."""
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", requested))
        if ray.is_initialized()
        else requested
    )
    return max(1, min(requested, cpus, n_rows // 64 or 1))


def drop_empty_blocks(mat_ds):
    """Rebuild a MATERIALIZED dataset from its non-empty blocks only —
    metadata-driven (no block fetch, refs pass through zero-copy).

    Ray's groupby / join operators emit one output block per hash
    partition, including empty ones, and a map_batches afterwards
    short-circuits empty blocks into SCHEMA-LESS empties (the UDF never
    runs on them). When such a block leads the dataset, schema inference
    fails and a downstream hash-shuffle join finalizes a right side
    without its key column (``ArrowInvalid: No match ... for key field
    reference``). Dropping empty blocks between shuffle rounds removes
    both the failure and the ``RefBundle ... different schema`` warning
    spam. No-op on datasets with no non-empty block."""
    import ray.data as rd

    bundles = list(mat_ds.iter_internal_ref_bundles())
    refs = [ref for bd in bundles for ref, meta in bd.blocks if meta.num_rows]
    n_total = sum(len(bd.blocks) for bd in bundles)
    if not refs or len(refs) == n_total:
        return mat_ds
    return rd.from_arrow_refs(refs)


def broadcast_join(
    big_ds,
    small: pa.Table,
    on: list[str] | str,
    *,
    how: str = "inner",
    right_on: list[str] | str | None = None,
):
    """Join a Dataset against a small in-memory Arrow table, per batch."""
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )

    def join_batch(batch: pa.Table) -> pa.Table:
        return batch.join(
            small, keys=keys, right_keys=rkeys, join_type=how
        )

    return big_ds.map_batches(join_batch, batch_format="pyarrow")


def broadcast_semi_join(big_ds, keys: pa.Array, on: str, *, anti: bool = False):
    """Keep rows whose ``on`` value is (not) in ``keys`` — no shuffle."""
    import pyarrow.compute as pc

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[on], value_set=keys)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big_ds.map_batches(filt, batch_format="pyarrow")


def cpu_capped_partitions(requested: int) -> int:
    """Hash-join partition count bounded by the LIVE CPU count.

    Ray's hash-shuffle join aggregators reserve resources per
    partition; a partition count far above session parallelism
    deadlocks small sessions (the components._cc_partitions finding,
    shared here for every Dataset.join call site). On a real cluster
    ``requested`` wins — the cap only binds when CPUs are scarce.
    """
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 2))
        if ray.is_initialized()
        else 2
    )
    return max(1, min(int(requested), cpus))


def hash_join(
    left_ds,
    right_ds,
    on: list[str] | str,
    *,
    right_on: list[str] | str | None = None,
    how: str = "inner",
    num_partitions: int = 16,
):
    """Partitioned hash join of two Datasets (both sides shuffled).

    Materialized inputs are rebuilt from their non-empty blocks first
    (:func:`drop_empty_blocks` — metadata-only, zero-copy): the
    schema-less empty blocks that aggregate→map stages emit would
    otherwise crash the join aggregator's finalize (``ArrowInvalid: No
    match for key field``). Centralized here so iterative callers
    (components, pagerank) don't each have to remember the guard; lazy
    inputs pass through untouched — forcing a materialize barrier on a
    streaming side would be the wrong trade."""
    from ray.data.dataset import MaterializedDataset

    if isinstance(left_ds, MaterializedDataset):
        left_ds = drop_empty_blocks(left_ds)
    if isinstance(right_ds, MaterializedDataset):
        right_ds = drop_empty_blocks(right_ds)
    keys = (on,) if isinstance(on, str) else tuple(on)
    rkeys = (
        None
        if right_on is None
        else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    )
    return left_ds.join(
        right_ds,
        join_type=how,
        num_partitions=num_partitions,
        on=keys,
        right_on=rkeys,
    )


def range_join(
    left_ds,
    intervals: pa.Table,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
):
    """Interval join: each left row matches every interval with
    ``lo <= value < hi`` (intervals may OVERLAP — one left row can emit
    several output rows). The interval table is broadcast (small side
    ships with the task spec); per batch, one vectorized pass per
    interval builds the match set — no shuffle, no per-row Python.

    ``how="left"`` keeps non-matching rows with null interval columns.
    """
    import pyarrow.compute as pc

    n_iv = intervals.num_rows
    lo = intervals[lo_col].to_numpy(zero_copy_only=False)
    hi = intervals[hi_col].to_numpy(zero_copy_only=False)
    iv_cols = intervals.column_names
    clash = set(iv_cols) & set(left_ds.schema().names)
    if clash:
        raise ValueError(
            f"range_join: interval columns {sorted(clash)} collide with "
            "left-table columns — rename one side"
        )

    def join_batch(b: pa.Table) -> pa.Table:
        v = b[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False)
        row_parts, iv_parts = [], []
        for i in range(n_iv):
            idx = np.flatnonzero((vals >= lo[i]) & (vals < hi[i]))
            if len(idx):
                row_parts.append(idx)
                iv_parts.append(np.full(len(idx), i, dtype=np.int64))
        if row_parts:
            rows = np.concatenate(row_parts)
            ivs = np.concatenate(iv_parts)
            order = np.lexsort((ivs, rows))  # stable (row, interval) order
            rows, ivs = rows[order], ivs[order]
        else:
            rows = np.empty(0, dtype=np.int64)
            ivs = np.empty(0, dtype=np.int64)
        if how == "left":
            matched = np.zeros(len(vals), dtype=bool)
            matched[rows] = True
            miss = np.flatnonzero(~matched)
            rows = np.concatenate([rows, miss])
            ivs = np.concatenate([ivs, np.full(len(miss), -1, dtype=np.int64)])
            order = np.lexsort((ivs, rows))
            rows, ivs = rows[order], ivs[order]
        out = {c: b[c].take(pa.array(rows)) for c in b.column_names}
        if n_iv == 0:
            # no intervals at all: left keeps every row with all-null
            # interval columns; inner is empty (rows already empty)
            for c in iv_cols:
                out[c] = pa.nulls(len(rows), type=intervals.schema.field(c).type)
            return pa.table(out)
        iv_idx = pa.array(
            np.where(ivs >= 0, ivs, 0), type=pa.int64()
        )
        null_mask = pa.array(ivs < 0)
        for c in iv_cols:
            col = intervals[c].take(iv_idx)
            if how == "left":
                col = pc.if_else(null_mask, pa.nulls(len(ivs), type=col.type), col)
            out[c] = col
        return pa.table(out)

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    num_partitions: int = 64,
):
    """As-of join: each left row gets the RIGHT row with the greatest
    ``ts`` ≤ its own ``ts`` for the same key (backward direction, exact
    matches included) — the time-series join Ray Data lacks.

    Distributed plan: both sides are tagged and hash-partitioned on the
    key (a union + one groupby shuffle — each reduce task sees one whole
    partition of BOTH sides), then a vectorized ``pandas.merge_asof``
    runs per partition. No driver materialization; partition memory =
    (left+right)/num_partitions, same reducer shape as any groupby.
    Precondition: right (key, ts) pairs unique (dedupe upstream
    otherwise — ties would make the winner engine-defined)."""
    from lsearch_ray.functions.dedup import partition_ids

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    right_cols = right_cols or [
        c for c in right_schema.names if c not in (key_col, ts_col)
    ]
    left_value_cols = [
        c for c in left_schema.names if c not in (key_col, ts_col)
    ]
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))
    out_right = [f"{c}{suffix}" for c in right_cols]
    clash = set(out_right) & set(left_schema.names)
    if clash:
        raise ValueError(
            f"asof_join: suffixed right columns {sorted(clash)} collide "
            "with left-table columns — rename one side or change suffix"
        )
    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {
                "__part": pa.array(partition_ids(b, [key_col], num_partitions)),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                key_col: b[key_col],
                ts_col: b[ts_col],
            }
            for c in left_value_cols:
                cols[c] = (
                    b[c] if side == 0 else pa.nulls(n, type=left_types[c])
                )
            for c, oc in zip(right_cols, out_right):
                cols[oc] = (
                    b[c] if side == 1 else pa.nulls(n, type=right_types[c])
                )
            return pa.table(cols)

        return f

    both = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def join_partition(g: pa.Table) -> pa.Table:
        # merge_asof sees ONLY (key, ts, positional index): value columns
        # never pass through pandas, so int64 payloads above 2^53 cannot
        # be corrupted by float64 promotion (NaN-filled unmatched rows
        # only ever touch the small positional-index column)
        side = g["__side"].to_numpy(zero_copy_only=False)
        left_tbl = g.filter(pa.array(side == 0)).select(
            [key_col, ts_col, *left_value_cols]
        )
        right_tbl = g.filter(pa.array(side == 1)).select(
            [key_col, ts_col, *out_right]
        )
        lhs = pd.DataFrame(
            {
                key_col: left_tbl[key_col].to_numpy(zero_copy_only=False),
                ts_col: left_tbl[ts_col].to_pandas(),
                "__lidx": np.arange(left_tbl.num_rows, dtype=np.int64),
            }
        ).sort_values(ts_col, kind="mergesort")
        rhs = pd.DataFrame(
            {
                key_col: right_tbl[key_col].to_numpy(zero_copy_only=False),
                ts_col: right_tbl[ts_col].to_pandas(),
                "__ridx": np.arange(right_tbl.num_rows, dtype=np.int64),
            }
        ).sort_values(ts_col, kind="mergesort")
        merged = pd.merge_asof(
            lhs, rhs[[key_col, ts_col, "__ridx"]], on=ts_col, by=key_col,
            direction="backward",
        )
        lidx = merged["__lidx"].to_numpy().astype(np.int64)
        ridx = merged["__ridx"].to_numpy()  # float64 with NaN for misses
        miss = np.isnan(ridx)
        ridx_i = np.where(miss, 0, ridx).astype(np.int64)
        out = {
            c: left_tbl[c].take(pa.array(lidx)) for c in left_tbl.column_names
        }
        null_mask = pa.array(miss)
        import pyarrow.compute as pc

        for oc in out_right:
            col = right_tbl[oc].take(pa.array(ridx_i))
            out[oc] = pc.if_else(
                null_mask, pa.nulls(len(ridx_i), type=col.type), col
            )
        return pa.table(out)

    return both.groupby("__part").map_groups(
        join_partition, batch_format="pyarrow"
    )


def sessionize(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: float = 1800.0,
    num_partitions: int = 64,
):
    """Per-key session assignment: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Returns one row per key:
    (key, n_events, n_sessions).

    Scale shape (the ``exact_dedup`` pattern): rows are hash-partitioned
    on the key — ONE groupby shuffle on ``__part``, so each reduce task
    receives a whole hash partition holding complete key groups — then a
    single vectorized pass per partition: mergesort by (key, ts, order),
    session starts = key-boundary OR gap-exceeded via ``np.diff``,
    per-key totals via run-boundary ``reduceat``. No per-key Python call
    (the previous per-key ``map_groups`` form was one interpreter
    round-trip + DataFrame per user — 10^8 users = 10^8 calls). Only the
    (key, ts, order) columns enter the shuffle. Size ``num_partitions``
    ≈ cluster cores × 4 at scale so a partition fits a worker's heap.
    """

    from lsearch_ray.functions.dedup import arrow_out, partition_ids

    gap_ns = int(round(gap_seconds * 1e9))

    def add_part(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col], ts_col: b[ts_col]}
        for c in order_cols:
            cols[c] = b[c]
        cols["__part"] = pa.array(partition_ids(b, [key_col], num_partitions))
        return pa.table(cols)

    def sess_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key_col, ts_col, *order_cols], kind="mergesort")
        # pandas 2 may keep us resolution — normalize to ns explicitly
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").astype("int64")
        key = g[key_col].to_numpy()
        n = len(g)
        if n == 0:
            return arrow_out(
                pd.DataFrame(
                    {
                        key_col: np.empty(0, dtype=key.dtype),
                        "n_events": np.empty(0, dtype=np.int64),
                        "n_sessions": np.empty(0, dtype=np.int64),
                    }
                )
            )
        boundary = key[1:] != key[:-1]
        new_session = np.ones(n, dtype=np.int64)
        if n > 1:
            new_session[1:] = (boundary | (np.diff(ts) > gap_ns)).astype(
                np.int64
            )
        starts = np.flatnonzero(np.r_[True, boundary])
        return arrow_out(
            pd.DataFrame(
                {
                    key_col: key[starts],
                    "n_events": np.diff(np.r_[starts, n]).astype(np.int64),
                    "n_sessions": np.add.reduceat(new_session, starts).astype(
                        np.int64
                    ),
                }
            )
        )

    out = (
        events_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(sess_partition, batch_format="pandas")
    )
    # canonical output order: the groupby shuffle's block order is not
    # reproducible run-to-run; downstream value hashes need determinism
    return out.sort(key_col)


def skew_join(
    left_ds,
    right_ds,
    on: str,
    *,
    right_on: str | None = None,
    hot_threshold: int = 1000,
    num_partitions: int = 16,
    max_hot_keys: int = 1_000_000,
):
    """Skew-aware inner join of two large Datasets: keys whose LEFT-side
    row count reaches ``hot_threshold`` take a broadcast plan (their
    right-side rows ship to every task — no single reduce partition ever
    receives a hot key's full row set), everything else takes the
    partitioned hash join. The union is exactly the inner join.

    This is the north rule's hot-key mitigation applied to joins (the
    groupby counterpart is ``functions.skew.salted_groupby_sum``): a
    Zipf-headed key column would otherwise pin one reducer per hot key.

    Assumes the right side is dimension-like per key (bounded rows per
    key), so the broadcast side stays small: hot keys are capped at
    ``max_hot_keys`` (raises — a threshold that classifies millions of
    keys hot means the threshold, not the plan, is wrong).
    """
    import ray

    from ray.data.aggregate import Sum

    from lsearch_ray.functions.dedup import value_counts_table

    rkey = right_on or on
    # both sides are consumed by more than one leg below — materialize
    # once instead of re-running the upstream reads per leg
    left_ds = left_ds.materialize()
    right_ds = right_ds.materialize()

    def count_partial(b: pa.Table) -> pa.Table:
        return value_counts_table(b[on], "k")

    hot_rows = (
        left_ds.select_columns([on])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["c"], pa.scalar(hot_threshold))
            ),
            batch_format="pyarrow",
        )
        .take(max_hot_keys + 1)
    )
    if len(hot_rows) > max_hot_keys:
        raise ValueError(
            f"skew_join: more than {max_hot_keys} keys reach "
            f"hot_threshold={hot_threshold}; raise the threshold"
        )
    if not hot_rows:
        return hash_join(
            left_ds, right_ds, on, right_on=right_on,
            num_partitions=num_partitions,
        )
    hot_keys = pa.array([r["k"] for r in hot_rows])

    left_cold = broadcast_semi_join(left_ds, hot_keys, on, anti=True)
    right_cold = broadcast_semi_join(right_ds, hot_keys, rkey, anti=True)
    cold = hash_join(
        left_cold, right_cold, on, right_on=right_on,
        num_partitions=num_partitions,
    )

    left_hot = broadcast_semi_join(left_ds, hot_keys, on)
    right_hot_tbl = pa.concat_tables(
        ray.get(
            broadcast_semi_join(right_ds, hot_keys, rkey).to_arrow_refs()
        ),
        promote_options="permissive",
    )
    hot = broadcast_join(left_hot, right_hot_tbl, on, right_on=right_on)

    # Dataset.union requires identical column order; Dataset.join and
    # pa.Table.join lay columns out differently
    cols = sorted(
        set(left_ds.schema().names)
        | (set(right_ds.schema().names) - {rkey})
        | {on}
    )
    return cold.select_columns(cols).union(hot.select_columns(cols))


def session_size_hist_ds(
    events_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: float = 1800.0,
    num_partitions: int = 64,
):
    """Session-size distribution: how many sessions contain exactly L
    events, for every L — the engagement-shape histogram behind the
    per-key totals of :func:`sessionize` (same gap rule, same
    hash-partition + single-vectorized-pass shape). Returns a Dataset of
    (session_len, n_sessions) sorted by session_len.

    Per partition: mergesort by (key, ts, order), session boundaries =
    key change OR gap exceeded, per-session lengths via diff over
    boundary indices, then a partition-local value_counts partial into
    one tiny groupby-sum (distinct lengths, not sessions, cross the
    exchange). Rows with null key or null timestamp are excluded (a
    null key is not a sessionizable identity, and int64-with-null keys
    would silently become float64+NaN — every NaN pair compares unequal,
    splitting nulls into per-row sessions)."""
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.dedup import arrow_out, partition_ids

    gap_ns = int(round(gap_seconds * 1e9))

    def add_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[ts_col])))
        cols = {key_col: b[key_col], ts_col: b[ts_col]}
        for c in order_cols:
            cols[c] = b[c]
        cols["__part"] = pa.array(partition_ids(b, [key_col], num_partitions))
        return pa.table(cols)

    def sizes_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key_col, ts_col, *order_cols], kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").astype("int64")
        key = g[key_col].to_numpy()
        n = len(g)
        if n == 0:
            return arrow_out(
                pd.DataFrame(
                    {
                        "session_len": np.empty(0, dtype=np.int64),
                        "c": np.empty(0, dtype=np.int64),
                    }
                )
            )
        new_session = np.ones(n, dtype=bool)
        if n > 1:
            new_session[1:] = (key[1:] != key[:-1]) | (np.diff(ts) > gap_ns)
        starts = np.flatnonzero(new_session)
        lens = np.diff(np.append(starts, n)).astype(np.int64)
        uniq, counts = np.unique(lens, return_counts=True)
        return arrow_out(
            pd.DataFrame({"session_len": uniq, "c": counts.astype(np.int64)})
        )

    return (
        events_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(sizes_partition, batch_format="pandas")
        .groupby("session_len")
        .aggregate(Sum("c", alias_name="n_sessions"))
        .sort("session_len")
    )
