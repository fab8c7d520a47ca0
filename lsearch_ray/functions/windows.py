"""Event-time window aggregates — a custom operator Ray Data lacks.

Three window shapes over a timestamp column:

- tumbling: one window per event (``floor(ts / size)``) — expressible as
  a plain ``map_batches`` truncation + groupby (see the ``events_hourly``
  pipeline); :func:`tumbling_window_agg` packages it.
- sliding: each event belongs to ``ceil(size / slide)`` windows — a
  vectorized flat-map replicates each row once per covering window
  start, then a single groupby aggregates. The replication factor is the
  size/slide ratio (bounded, known up front), so the shuffle volume is
  ``ratio × events`` — no per-row Python, no window state.
- session: gap-based per-key sessions (functions/joins.sessionize).

Window starts are computed in integer microseconds (epoch-aligned
``(us // slide) * slide - i*slide``), matching SQL ``make_timestamp``
arithmetic exactly — no float time math anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _window_rows(
    b: pa.Table,
    ts_col: str,
    size_us: int,
    slide_us: int,
    carry_cols: list[str],
) -> pa.Table:
    import pyarrow.compute as pc

    ts = b[ts_col]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    # normalize to µs regardless of source resolution (parquet is us,
    # from_items/pandas often ns); safe=False permits sub-µs truncation —
    # the default safe cast RAISES on any nonzero nanosecond remainder
    us = pc.cast(ts, pa.timestamp("us"), safe=False).cast(
        pa.int64()
    ).to_numpy(zero_copy_only=False)
    n_windows = -(-size_us // slide_us)  # ceil
    parts = []
    for i in range(n_windows):
        start = (us // slide_us) * slide_us - i * slide_us
        keep = us < start + size_us  # starts ≤ ts by construction
        idx = np.flatnonzero(keep)
        cols = {
            "window_start": pa.array(start[idx], type=pa.int64()).cast(
                pa.timestamp("us")
            )
        }
        take = pa.array(idx, type=pa.int64())
        for c in carry_cols:
            cols[c] = b[c].take(take)
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def sliding_window_agg(
    events_ds,
    *,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    size_s: float = 7200.0,
    slide_s: float = 3600.0,
):
    """Count + sum(value) per (keys, window_start) over sliding windows.

    Returns a Dataset with columns (*key_cols, window_start, n,
    sum_value).
    """
    from ray.data.aggregate import Count, Sum

    key_cols = key_cols or []
    size_us = int(round(size_s * 1e6))
    slide_us = int(round(slide_s * 1e6))
    carry = [*key_cols, value_col]
    expanded = events_ds.map_batches(
        lambda b: _window_rows(b, ts_col, size_us, slide_us, carry),
        batch_format="pyarrow",
    )
    return (
        expanded.groupby([*key_cols, "window_start"])
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value"))
    )


def tumbling_window_agg(
    events_ds,
    *,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    size_s: float = 3600.0,
):
    """Tumbling windows = sliding with slide == size (one window/event)."""
    return sliding_window_agg(
        events_ds,
        ts_col=ts_col,
        key_cols=key_cols,
        value_col=value_col,
        size_s=size_s,
        slide_s=size_s,
    )


def gapfill_hourly_counts_ds(
    events_ds,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
):
    """Zero-filled hourly series: per-key event counts on the DENSE hour
    grid spanning [min hour, max hour] of the data — every (key, hour)
    cell appears, absent cells as 0 (the densification step before
    time-series models, which cannot see gaps that are not rows).

    The sparse counts are a groupby aggregate; the dense grid is
    keys × hours — bounded by the time span and key cardinality, not by
    event volume — so the fill is a driver-side cross-expansion of the
    aggregate (the same collect budget as any dims-sized result). Null
    keys/timestamps are excluded. Returns a pa.Table
    (key, hour, n) sorted by (key, hour).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    us_per_hour = np.int64(3_600_000_000)

    def trunc(b: pa.Table) -> pa.Table:
        t = b.select([key_col, ts_col])
        t = t.filter(pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col])))
        us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: t[key_col],
                "hour_us": pa.array((us // us_per_hour) * us_per_hour),
            }
        )

    sparse = (
        events_ds.map_batches(trunc, batch_format="pyarrow")
        .groupby([key_col, "hour_us"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    if not sparse:
        return pa.table(
            {
                key_col: pa.array([], pa.string()),
                "hour": pa.array([], pa.timestamp("us")),
                "n": pa.array([], pa.int64()),
            }
        )
    by_cell = {(r[key_col], int(r["hour_us"])): int(r["n"]) for r in sparse}
    hours_us = np.array([int(r["hour_us"]) for r in sparse], dtype=np.int64)
    grid = np.arange(
        hours_us.min(), hours_us.max() + 1, us_per_hour, dtype=np.int64
    )
    keys = sorted({r[key_col] for r in sparse})
    n_cells = len(keys) * len(grid)
    out_key = np.repeat(np.arange(len(keys)), len(grid))
    out_us = np.tile(grid, len(keys))
    out_n = np.fromiter(
        (
            by_cell.get((keys[ki], int(u)), 0)
            for ki, u in zip(out_key, out_us)
        ),
        dtype=np.int64,
        count=n_cells,
    )
    return pa.table(
        {
            key_col: pa.array([keys[i] for i in out_key]),
            "hour": pa.array(out_us).cast(pa.timestamp("us")),
            "n": pa.array(out_n),
        }
    )


def hourly_anomalies_ds(
    events_ds,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
):
    """Per-key hourly VOLUME anomalies: hours whose event count deviates
    more than 3σ from that key's mean over the dense gap-filled grid —
    the stream-health monitor (a feed that stalls to 0 or bursts 10× in
    an hour shows up; sparse counts alone cannot see the stalls, which
    is why the zero-filled grid is the input).

    Exact integer contract (the ``outlier_events`` inequality): with
    per-key hour count n, sum S and sum-of-squares Sxx over INTEGER
    hourly counts x, flag x iff |n·x − S| > q where q brackets
    sqrt(9(n·Sxx − S²)) via the float-sqrt ±1 integer-square correction
    — every comparison is integer, replayed exactly in SQL (HUGEINT).

    Scale shape: the distributed part is :func:`gapfill_hourly_counts_ds`
    (a groupby aggregate; the dense grid is keys × hours — dims-sized,
    not event-sized); the flagging is driver arithmetic on that
    already-collected table. Returns (key_col, hour, n_events) for
    anomalous cells, sorted.
    """
    import math

    dense = gapfill_hourly_counts_ds(
        events_ds, key_col=key_col, ts_col=ts_col
    )
    keys = dense[key_col].to_numpy(zero_copy_only=False)
    x = dense["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="mergesort")  # gapfill is key-sorted,
    # but re-derive runs defensively
    keys_s, x_s = keys[order], x[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(keys_s[1:] != keys_s[:-1]) + 1, [len(keys_s)])
    )
    flag = np.zeros(len(keys_s), dtype=bool)
    for a, b in zip(starts[:-1], starts[1:]):
        seg = x_s[a:b]
        n = int(b - a)
        s = int(seg.sum())
        sxx = int((seg.astype(object) * seg.astype(object)).sum())
        rr = 9 * (n * sxx - s * s)
        s0 = int(math.floor(math.sqrt(float(rr)))) if rr > 0 else 0
        if (s0 + 1) * (s0 + 1) <= rr:
            q = s0 + 1
        elif s0 * s0 > rr:
            q = s0 - 1
        else:
            q = s0
        lhs = seg.astype(object) * n
        flag[a:b] = (lhs > s + q) | (lhs < s - q)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    mask = pa.array(flag[inv])
    out = dense.filter(mask)
    return pa.table(
        {
            key_col: out[key_col],
            "hour": out["hour"],
            "n_events": out["n"].cast(pa.int64()),
        }
    )
