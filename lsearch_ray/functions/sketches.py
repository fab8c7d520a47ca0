"""Heavy-hitters (frequent items) with an exact verification pass.

SURVEY §2.9 "sketches" family (the reference has none — its only
counting is the per-record ``More`` match count, search.rs:274-276).

The 100-TB shape: per-batch truncated counts are the Misra-Gries-style
candidate generator — each batch keeps only its ``per_batch_cap`` most
frequent values, so driver/shuffle state is bounded no matter how large
the value universe is. A value outside a batch's kept set has, in that
batch, a count ≤ the batch's cap-th count; summing those cap-th counts
over all batches gives a global undercount bound B for every
non-candidate. A second broadcast-filtered pass then counts the
candidates EXACTLY, and if the k-th exact count exceeds B the top-k is
provably exact — the sketch buys bounded memory, the verify pass buys
back exactness (which is what makes a SQL oracle possible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _value_counts(arr) -> tuple[pa.Array, np.ndarray]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vc = pc.value_counts(arr)
    return vc.field("values"), vc.field("counts").to_numpy(zero_copy_only=False)


def heavy_hitters(
    ds,
    col: str | None = None,
    *,
    values_fn=None,
    k: int = 20,
    per_batch_cap: int = 4096,
    candidate_cap: int | None = None,
    num_partitions: int = 8,
) -> tuple[pa.Table, dict]:
    """Top-``k`` most frequent values of ``col`` (or of the array
    ``values_fn(batch)`` — e.g. a tokenizer, so token streams never
    materialize as rows between stages).

    Returns ``(table(value, n) sorted by (n desc, value), info)`` where
    ``info['provably_exact']`` certifies that no value outside the
    candidate set can displace the reported top-k (k-th exact count >
    undercount bound B) and ``info['bound']`` is B.
    """
    if (col is None) == (values_fn is None):
        raise ValueError("heavy_hitters: pass exactly one of col / values_fn")
    cap = per_batch_cap
    cand_cap = candidate_cap or max(8 * k, 1024)

    def partial(b: pa.Table) -> pa.Table:
        vals = values_fn(b) if values_fn else b[col]
        uniq, cnt = _value_counts(vals)
        bound = 0
        if len(cnt) > cap:
            keep = np.argpartition(-cnt, cap - 1)[:cap]
            bound = int(cnt[np.argpartition(-cnt, cap)[cap]])
            uniq = uniq.take(pa.array(np.sort(keep)))
            cnt = cnt[np.sort(keep)]
        out_v = pc.cast(uniq, pa.large_string())
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [out_v.combine_chunks() if isinstance(out_v, pa.ChunkedArray) else out_v,
                     pa.array([None], type=pa.large_string())]
                ),
                "c": pa.array(
                    np.concatenate([cnt.astype(np.int64), [bound]]),
                    type=pa.int64(),
                ),
                "is_bound": pa.array(
                    np.concatenate(
                        [np.zeros(len(cnt), dtype=np.int8), [1]]
                    ),
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Sum

    bound = (
        partials.filter(expr="is_bound == 1")
        .aggregate(Sum("c", alias_name="b"))
    )
    B = int((bound or {}).get("b") or 0)
    approx = (
        partials.filter(expr="is_bound == 0")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c_approx"))
        .sort(["c_approx", "v"], descending=[True, False])
        .limit(cand_cap)
        .take_all()
    )
    cand = pa.array([r["v"] for r in approx], type=pa.large_string())
    if len(cand) == 0:
        empty = pa.table(
            {
                "value": pa.array([], type=pa.large_string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        return empty, {"provably_exact": True, "bound": B}

    # exact recount of the candidates only (broadcast value-set filter)
    def exact_partial(b: pa.Table) -> pa.Table:
        vals = values_fn(b) if values_fn else b[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = pc.cast(vals, pa.large_string())
        vals = vals.filter(pc.is_in(vals, value_set=cand))
        uniq, cnt = _value_counts(vals)
        return pa.table(
            {
                "v": pc.cast(uniq, pa.large_string()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="n"))
        .sort(["n", "v"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    table = pa.table(
        {
            "value": pa.array(exact["v"], type=pa.large_string()),
            "n": pa.array(exact["n"], type=pa.int64()),
        }
    )
    kth = int(exact["n"].iloc[-1]) if len(exact) else 0
    return table, {"provably_exact": len(exact) < k or kth > B, "bound": B}
