"""Exact distributed quantiles by iterative histogram refinement.

SURVEY §2.9 aggregation family extension (the reference has only running
means, cli.rs:34-43). A sort-based quantile is an all-to-all shuffle of
the whole column; this operator instead finds the EXACT order statistic
with a few streaming passes whose driver state is one histogram:

1. one aggregate pass for (count, min, max);
2. each round, a ``map_batches`` partial-histogram pass over
   ``n_buckets`` equal-width buckets of the current [lo, hi] range +
   a tiny groupby-sum; the bucket containing the target rank becomes
   the next range (rank rebased by the mass below it);
3. when the in-range row count ≤ ``collect_limit`` the survivors are
   collected and the answer read off with one ``np.partition``.

Convergence: each round shrinks the candidate row count to the largest
single bucket's mass; for continuous-ish values 2-3 rounds reach the
collect threshold. Constant-width rounds can stall only when one value
repeats beyond ``collect_limit`` — detected (range collapses to a
point) and answered exactly with that value.

The result is the value at 0-indexed rank ``floor(q * (n-1))`` of the
sorted column (numpy ``'lower'`` convention) — tie-order-independent,
hence exactly SQL-expressible (ORDER BY + OFFSET).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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
    from ray.data.aggregate import Count, Max, Min

    agg = ds.aggregate(
        Count(col, alias_name="n"), Min(col, alias_name="lo"), Max(col, alias_name="hi")
    )
    n = int(agg["n"] or 0)
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            out_q.append(float(q))
            out_v.append(float("nan"))
            continue
        rank = int(math.floor(q * (n - 1)))  # 0-indexed target
        lo, hi = float(agg["lo"]), float(agg["hi"])
        below = 0  # rows strictly below lo
        inside = n
        for _ in range(max_rounds):
            if inside <= collect_limit or lo == hi:
                break
            edges = np.linspace(lo, hi, n_buckets + 1)

            def hist_partial(b: pa.Table, edges=edges) -> pa.Table:
                v = b[col]
                if isinstance(v, pa.ChunkedArray):
                    v = v.combine_chunks()
                vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
                vals = vals[(vals >= edges[0]) & (vals <= edges[-1])]
                # bucket i covers [edges[i], edges[i+1]); last bucket closed
                idx = np.clip(
                    np.searchsorted(edges, vals, side="right") - 1,
                    0,
                    len(edges) - 2,
                )
                uniq, cnt = np.unique(idx, return_counts=True)
                return pa.table(
                    {
                        "bucket": pa.array(uniq.astype(np.int64)),
                        "c": pa.array(cnt.astype(np.int64)),
                    }
                )

            from ray.data.aggregate import Sum

            rows = (
                ds.map_batches(hist_partial, batch_format="pyarrow")
                .groupby("bucket")
                .aggregate(Sum("c", alias_name="c"))
                .take_all()
            )
            counts = np.zeros(n_buckets, dtype=np.int64)
            for r in rows:
                counts[int(r["bucket"])] = int(r["c"])
            cum = np.cumsum(counts)
            tgt = rank - below  # rank within [lo, hi]
            b_idx = int(np.searchsorted(cum, tgt + 1))
            new_inside = int(counts[b_idx])
            below += int(cum[b_idx - 1]) if b_idx > 0 else 0
            new_lo, new_hi = float(edges[b_idx]), float(edges[b_idx + 1])
            if new_inside == inside and new_lo == lo and new_hi == hi:
                break  # cannot shrink further (mass concentrated)
            lo, hi, inside = new_lo, new_hi, new_inside
            if b_idx == n_buckets - 1:
                pass  # last bucket is closed at hi; filter below handles it

        if lo == hi:
            out_q.append(float(q))
            out_v.append(lo)
            continue

        last = hi == float(agg["hi"])

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
        k_in = rank - below
        out_q.append(float(q))
        out_v.append(float(np.partition(vals, k_in)[k_in]))
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.float64()),
            "value": pa.array(out_v, type=pa.float64()),
        }
    )
