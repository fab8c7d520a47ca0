"""Ordered event-funnel analysis and exact grouped distinct counts.

The reference engine has no stateful multi-event surface (its scoring is
per-record, `/root/reference/src/search.rs:99-123`); these are the
sequence/cardinality shapes an event-stream pipeline needs.

Both operators follow the repo's hash-partition-then-vectorize skeleton
(`functions/dedup.py partition_ids`): ONE shuffle co-locates each key's
rows, then a single numpy pass per partition — no per-key Python at any
key cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.functions.dedup import (
    arrow_out,
    partition_ids,
    value_counts_table,
)

_TS_INF = np.int64(np.iinfo(np.int64).max)


def funnel_stages(
    ds,
    stages: list[str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 32,
):
    """Per-key ordered funnel: stage ``i`` is reached when an event of
    type ``stages[i]`` occurs STRICTLY after the key's first completion
    time of stage ``i-1`` (stage 0: the key's min ts of ``stages[0]``).
    Ties at the same timestamp do NOT advance the funnel — the same
    strict ``>`` both engines can spell.

    Returns one row per distinct key: (key_col, stage_reached ∈
    [0, len(stages)]). Per partition the pass is: sort by key, run
    boundaries, then per stage one ``np.minimum.reduceat`` over
    condition-masked timestamps — O(stages · rows), no per-key Python.
    """
    cols = [key_col, ts_col, type_col]

    def tag(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        return t.append_column(
            "__part", pa.array(partition_ids(t, [key_col], num_partitions))
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(t, sort_keys=[(key_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "stage_reached": pa.array([], pa.int64()),
                }
            )
        tscol = t[ts_col].combine_chunks()
        if tscol.null_count:  # int64-with-null would detour via float64
            raise ValueError(f"funnel_stages: {ts_col} has nulls")
        ts = tscol.to_numpy(zero_copy_only=False)
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").view(np.int64)
        else:
            ts = ts.astype(np.int64)
        from lsearch_ray.functions.grouped import run_bounds

        _, starts, run_of = run_bounds(t[key_col])
        type_arr = t[type_col].combine_chunks()
        reached = np.zeros(len(starts), dtype=np.int64)
        t_prev = np.empty(len(starts), dtype=np.int64)
        for i, stage in enumerate(stages):
            mask = np.asarray(
                pc.fill_null(pc.equal(type_arr, stage), False)
            ).astype(bool)
            if i > 0:  # stage 0 is unconditional min ts of its type
                mask &= ts > t_prev[run_of]
            arr = np.where(mask, ts, _TS_INF)
            t_i = np.minimum.reduceat(arr, starts)
            hit = t_i != _TS_INF
            reached[hit] = i + 1
            t_prev = np.where(hit, t_i, _TS_INF)
        keys_first = t[key_col].take(pa.array(starts))
        return pa.table(
            {key_col: keys_first, "stage_reached": pa.array(reached)}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_distinct_count_ds(
    ds,
    group_col: str | list[str],
    value_col: str,
    *,
    num_partitions: int = 32,
):
    """Exact ``COUNT(DISTINCT value) GROUP BY group(s)``: per-batch unique
    (group, value) tuples (the map-side prune — the shuffle carries at
    most one row per batch×tuple), hash-partition on the WHOLE tuple so
    duplicates co-locate, per-partition dedup + per-group counts, then a
    tiny final groupby-sum over ≤ groups×partitions rows. ``group_col``
    may be a list for composite keys (e.g. cohort × age)."""
    from ray.data.aggregate import Sum

    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    all_cols = gcols + [value_col]

    def pairs(b: pa.Table) -> pa.Table:
        t = b.select(all_cols)
        # SQL COUNT(DISTINCT v) ignores null values; null GROUPS are kept
        # (SQL GROUP BY forms a null group)
        t = t.filter(pc.is_valid(t[value_col]))
        t = t.group_by(all_cols).aggregate([])
        return t.append_column(
            "__part",
            pa.array(partition_ids(t, all_cols, num_partitions)),
        )

    def count_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"]).group_by(all_cols).aggregate([])
        if len(gcols) == 1:
            return value_counts_table(t[gcols[0]], gcols[0])
        g = t.group_by(gcols).aggregate([([], "count_all")])
        # select by NAME: arrow appends the group keys after the aggregate
        return g.select(gcols + ["count_all"]).rename_columns(gcols + ["c"])

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(count_partition, batch_format="pyarrow")
        .groupby(gcols if len(gcols) > 1 else gcols[0])
        .aggregate(Sum("c", alias_name="n_distinct"))
        .map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("n_distinct"),
                "n_distinct",
                b["n_distinct"].cast(pa.int64()),
            ),
            batch_format="pyarrow",
        )
    )


_DAY_US = 86_400_000_000


def retention_cohorts_ds(
    events_ds,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    num_partitions: int = 16,
):
    """Cohort retention: users grouped by first-activity day, counted per
    (cohort day, days-since-cohort) cell — the product-analytics matrix.

    Shape: one groupby-min finds each user's cohort (map-side partial
    min per batch keeps the shuffle at one row per batch×user), one hash
    join tags every event with its user's cohort, then the exact
    composite-key distinct (:func:`grouped_distinct_count_ds`) counts
    active users per cell. All day arithmetic is integer epoch-µs floor
    division — any engine replays it bit-exactly.

    Returns ``(cohort: timestamp[us], age_days: int64, n_users: int64)``.
    """
    from ray.data.aggregate import Min

    def to_day(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(pc.is_valid(b[ts_col]), pc.is_valid(b[user_col]))
        )
        us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // _DAY_US) * _DAY_US
        out = pa.table(
            {user_col: t[user_col], "day_us": pa.array(day, pa.int64())}
        )
        # map-side prune to distinct (user, day) pairs: exact for both
        # consumers — the cohort min and the per-cell distinct count
        return out.group_by([user_col, "day_us"]).aggregate([])

    # consumed twice (cohort min + the tag join) — materialize once
    days = events_ds.map_batches(to_day, batch_format="pyarrow").materialize()
    cohorts = (
        days.groupby(user_col)
        .aggregate(Min("day_us", alias_name="cohort_us"))
        .materialize()
    )

    # every (user, active day) tagged with the user's cohort; ages are
    # non-negative by construction (cohort is the min day). Join
    # partitions sized to the SMALLER side (cohorts: one row per distinct
    # user) — sizing to the days side leaves cohort partitions empty on
    # tiny inputs, which Ray's hash-join aggregator rejects
    # (ArrowInvalid at finalize; both sides are materialized so count()
    # is metadata-only).
    from lsearch_ray.functions.minhash import _pair_partitions

    tagged = days.join(
        cohorts,
        join_type="inner",
        num_partitions=_pair_partitions(cohorts.count(), cap=num_partitions),
        on=(user_col,),
    ).map_batches(
        lambda b: pa.table(
            {
                user_col: b[user_col],
                "cohort_us": b["cohort_us"],
                "age_days": pc.divide(
                    pc.subtract(b["day_us"], b["cohort_us"]), _DAY_US
                ),
            }
        ),
        batch_format="pyarrow",
    )

    counts = grouped_distinct_count_ds(
        tagged, ["cohort_us", "age_days"], user_col,
        num_partitions=num_partitions,
    )
    return counts.map_batches(
        lambda b: pa.table(
            {
                "cohort": pc.cast(b["cohort_us"], pa.timestamp("us")),
                "age_days": b["age_days"],
                "n_users": b["n_distinct"],
            }
        ),
        batch_format="pyarrow",
    ).sort(["cohort", "age_days"])


def audience_overlap_ds(
    ds,
    *,
    type_col: str = "event_type",
    user_col: str = "user_id",
    num_partitions: int = 16,
):
    """Pairwise audience overlap between segments: for every pair of
    ``type_col`` values sharing at least one user, the exact intersection
    and union of their distinct-user sets plus floor-micro Jaccard.

    Distributed shape: distinct (type, user) with a map-side per-batch
    prune, hash-partitioned on USER so each user's whole segment set
    co-locates; per partition one vectorized self-merge emits that
    partition's (type_a < type_b) intersection partials — users are
    disjoint across partitions, so a global groupby-sum is exact. Segment
    sizes come from :func:`grouped_distinct_count_ds`; two hash joins
    attach them and the final map computes union and Jaccard in pure
    int64 (any engine replays it).

    Returns ``(type_a, type_b, n_common, n_union, jaccard_micro)``
    sorted by the pair.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from lsearch_ray.functions.minhash import _pair_partitions

    def pairs(b: pa.Table) -> pa.Table:
        t = b.select([type_col, user_col])
        t = t.filter(
            pc.and_(pc.is_valid(t[type_col]), pc.is_valid(t[user_col]))
        )
        t = t.group_by([type_col, user_col]).aggregate([])
        return t.append_column(
            "__part", pa.array(partition_ids(t, [user_col], num_partitions))
        )

    def overlap_partition(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns="__part").drop_duplicates([type_col, user_col])
        m = g.merge(g, on=user_col, suffixes=("_a", "_b"))
        m = m[m[f"{type_col}_a"] < m[f"{type_col}_b"]]
        out = (
            m.groupby([f"{type_col}_a", f"{type_col}_b"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out.columns = ["type_a", "type_b", "c"]
        out["c"] = out["c"].astype("int64")
        return arrow_out(out)

    inter = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(overlap_partition, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("c", alias_name="n_common"))
        .materialize()
    )
    n_inter = inter.count()
    if n_inter == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_common": pa.array([], pa.int64()),
                    "n_union": pa.array([], pa.int64()),
                    "jaccard_micro": pa.array([], pa.int64()),
                }
            )
        )

    sizes = grouped_distinct_count_ds(
        ds.map_batches(
            lambda b: b.select([type_col, user_col]).filter(
                pc.is_valid(b[type_col])
            ),
            batch_format="pyarrow",
        ),
        type_col,
        user_col,
        num_partitions=num_partitions,
    ).materialize()

    nparts = _pair_partitions(n_inter)
    sa = sizes.map_batches(
        lambda b: pa.table({"ta": b[type_col], "na": b["n_distinct"]}),
        batch_format="pyarrow",
    )
    sb = sizes.map_batches(
        lambda b: pa.table({"tb": b[type_col], "nb": b["n_distinct"]}),
        batch_format="pyarrow",
    )

    def finish(b: pa.Table) -> pa.Table:
        c = b["n_common"].to_numpy(zero_copy_only=False)
        na = b["na"].to_numpy(zero_copy_only=False)
        nb = b["nb"].to_numpy(zero_copy_only=False)
        union = na + nb - c
        return pa.table(
            {
                "type_a": b["type_a"],
                "type_b": b["type_b"],
                "n_common": pa.array(c, pa.int64()),
                "n_union": pa.array(union, pa.int64()),
                "jaccard_micro": pa.array(
                    (c * 1_000_000) // union, pa.int64()
                ),
            }
        )

    return (
        inter.join(sa, join_type="inner", num_partitions=nparts,
                   on=("type_a",), right_on=("ta",))
        .join(sb, join_type="inner", num_partitions=nparts,
              on=("type_b",), right_on=("tb",))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["type_a", "type_b"])
    )


def transition_counts_ds(
    events_ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    k: int = 20,
    num_partitions: int = 32,
):
    """Top-k user-journey transitions — counts of ADJACENT event-type
    pairs (src → dst) within each user's (ts, id)-ordered stream, the
    Markov transition matrix of behavioral analytics.

    Scale shape (the sessionize pattern): ONE hash-partition shuffle on
    the user key co-locates each user's complete stream; per partition a
    single vectorized pass (mergesort by (user, ts, id), shifted-array
    adjacency masked at user boundaries) emits per-partition (src, dst)
    count PARTIALS — the exchange after the shuffle carries one row per
    distinct transition per partition, never per event. A tiny
    groupby-sum and a lossless per-block top-k finish. Returns
    ``(src_type, dst_type, n)`` ordered by (n DESC, src, dst) LIMIT k.
    """
    from ray.data.aggregate import Sum

    def add_part(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                user_col: b[user_col],
                ts_col: b[ts_col],
                order_col: b[order_col],
                type_col: b[type_col],
            }
        )
        # null users have no defined stream order and null event types no
        # defined transition — both excluded on BOTH engines (the SQL
        # twin filters identically; keeping them would let arrow's
        # null-propagating kernels silently merge distinct null pairs)
        t = t.filter(
            pc.and_(pc.is_valid(t[user_col]), pc.is_valid(t[type_col]))
        )
        return t.append_column(
            "__part", pa.array(partition_ids(t, [user_col], num_partitions))
        )

    def pairs_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (user_col, "ascending"),
                (ts_col, "ascending"),
                (order_col, "ascending"),
            ],
        )
        t = t.take(idx)
        empty = pa.table(
            {
                "src": pa.array([], pa.large_string()),
                "dst": pa.array([], pa.large_string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        users = t[user_col].to_numpy(zero_copy_only=False)
        same = users[:-1] == users[1:]
        if not same.any():
            return empty
        types = t[type_col].combine_chunks().cast(pa.large_string())
        src = types.slice(0, len(types) - 1).filter(pa.array(same))
        dst = types.slice(1).filter(pa.array(same))
        # per-partition combine on the two columns directly — a
        # separator-join rendering would corrupt pairs whenever a type
        # string contained the separator (arbitrary table data, unlike
        # the analyzer-restricted tokens GRAM_SEP relies on)
        g = (
            pa.table({"src": src, "dst": dst})
            .group_by(["src", "dst"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "src": g["src"],
                "dst": g["dst"],
                "c": g["count_all"].cast(pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("c", alias_name="n"))
    )

    from lsearch_ray.functions.ngrams import _block_topk

    out = (
        counts.map_batches(
            lambda t: _block_topk(
                t,
                k,
                [("n", "descending"), ("src", "ascending"),
                 ("dst", "ascending")],
            ),
            batch_format="pyarrow",
        )
        .sort(["n", "src", "dst"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "src_type": pa.array(out["src"], pa.string()),
            "dst_type": pa.array(out["dst"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def basket_lift_ds(
    ds,
    *,
    type_col: str = "event_type",
    user_col: str = "user_id",
    num_partitions: int = 16,
):
    """Market-basket association (lift) between event types over
    distinct-user audiences: for every type pair sharing a user,

        lift_micro = (n_common · N · 10⁶) // (n_a · n_b)

    with N = total distinct users and n_x = each type's distinct-user
    audience — the "users who did A also did B" measure; 10⁶ = the two
    behaviors are independent, above = positive association. Exact
    integer end to end (Python-int products, so corpus-scale counts
    can't overflow int64).

    Composes the oracled overlap machinery: pair intersections from
    :func:`audience_overlap_ds`, audience sizes from
    :func:`grouped_distinct_count_ds`, N from one user-keyed distinct
    count; the pair table is |types|²-bounded, so the final scoring
    rows are tiny while every count underneath is distributed.

    Returns (type_a, type_b, n_common, n_a, n_b, n_users, lift_micro)
    sorted by the pair.
    """
    import ray.data as rd

    # the audience_overlap convention: null types/users don't count
    ds = ds.map_batches(
        lambda b: b.filter(
            pa.compute.and_(
                pa.compute.is_valid(b[type_col]),
                pa.compute.is_valid(b[user_col]),
            )
        ),
        batch_format="pyarrow",
    )
    pairs = audience_overlap_ds(
        ds,
        type_col=type_col,
        user_col=user_col,
        num_partitions=num_partitions,
    ).take_all()  # |types|^2-bounded
    sizes = {
        r[type_col]: int(r["n_distinct"])
        for r in grouped_distinct_count_ds(
            ds, type_col, user_col, num_partitions=num_partitions
        ).take_all()
    }
    n_users = int(
        grouped_distinct_count_ds(
            ds.map_batches(
                lambda b: pa.table(
                    {
                        "__all": pa.array(
                            np.zeros(b.num_rows, dtype=np.int64)
                        ),
                        user_col: b[user_col],
                    }
                ),
                batch_format="pyarrow",
            ),
            "__all",
            user_col,
            num_partitions=num_partitions,
        ).take_all()[0]["n_distinct"]
    )

    ta, tb, nc, na, nb, lift = [], [], [], [], [], []
    for r in pairs:
        a, b = r["type_a"], r["type_b"]
        common = int(r["n_common"])
        sa, sb = sizes[a], sizes[b]
        ta.append(a)
        tb.append(b)
        nc.append(common)
        na.append(sa)
        nb.append(sb)
        lift.append((common * n_users * 10**6) // (sa * sb))
    out = pa.table(
        {
            "type_a": pa.array(ta, pa.large_string()),
            "type_b": pa.array(tb, pa.large_string()),
            "n_common": pa.array(nc, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "n_users": pa.array(
                [n_users] * len(ta), pa.int64()
            ),
            "lift_micro": pa.array(lift, pa.int64()),
        }
    )
    return rd.from_arrow(out).sort(["type_a", "type_b"])
