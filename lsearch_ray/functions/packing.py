"""Sequence packing: lay documents head-to-tail into fixed token-capacity
context windows (the LLM-pretraining packing layout where a document may
straddle a window boundary and the stream is split every ``capacity``
tokens). A doc's bin is ``exclusive_prefix_tokens // capacity`` in
ascending id order — a pure function of the global ordered cumulative sum,
so it is deterministic under any partitioning and exactly SQL-expressible
(``sum(n) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)``).

Scale design (the global ordered cumsum without a global sort):

1. docs → ``(doc_id, n_tokens, rng)`` with ``rng = doc_id // range_width``
   — a stateless vectorized map over the analyzer's ``doc_lengths_table``.
2. per-range token totals: one small groupby (``n_docs / range_width``
   rows) collected to the driver and prefix-summed into per-range START
   OFFSETS. At 10^9 docs with ``range_width = 10^6`` that is 1,000 rows —
   the only driver-side data.
3. one hash-partition shuffle on ``rng`` (shared ``partition_ids``
   arithmetic) and a single vectorized pass per partition: sort by
   ``(rng, doc_id)``, run-boundary exclusive cumsum, add the broadcast
   range offset, floor-divide by capacity. No per-group Python, no
   driver materialization of row data.

Reference scope note: the reference engine has no packing surface
(SURVEY §2.9 — LLM-training-data operator family the new engine adds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import doc_lengths_table
from lsearch_ray.functions.dedup import partition_ids
from lsearch_ray.functions.grouped import run_bounds


def pack_bins_ds(
    docs_ds,
    *,
    capacity: int = 512,
    range_width: int = 256,
    num_partitions: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """documents Dataset -> ``(doc_id, n_tokens, bin_id)`` sorted by id.

    ``bin_id = (tokens of all lower-id docs) // capacity`` — the window a
    doc STARTS in when the token stream is packed contiguously. Ids must
    be non-negative (``rng`` arithmetic); capacity and range_width must be
    positive.
    """
    if capacity <= 0 or range_width <= 0:
        raise ValueError("pack_bins_ds: capacity and range_width must be > 0")
    from ray.data.aggregate import Sum

    def tok(b: pa.Table) -> pa.Table:
        t = doc_lengths_table(b, text_col=text_col, id_col=id_col)
        ids = t[id_col].combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        if len(idn) and idn.min() < 0:
            raise ValueError("pack_bins_ds: negative ids unsupported")
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": t["dl"],
                "rng": pa.array(idn // np.int64(range_width)),
            }
        )

    base = docs_ds.map_batches(tok, batch_format="pyarrow").materialize()

    # pass 1: per-range totals -> driver prefix sums (tiny by construction)
    totals = base.groupby("rng").aggregate(Sum("n_tokens", alias_name="tot")).take_all()
    totals.sort(key=lambda r: r["rng"])
    rng_keys = np.array([r["rng"] for r in totals], dtype=np.int64)
    tots = np.array([r["tot"] for r in totals], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(tots)[:-1])) if len(tots) else tots

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__part", pa.array(partition_ids(b, ["rng"], num_partitions))
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t, sort_keys=[("rng", "ascending"), ("doc_id", "ascending")]
        )
        t = t.take(idx)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                }
            )
        v = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = t["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, starts, run_of = run_bounds(t["rng"])
        total = np.cumsum(v)
        excl = total - v - (total[starts] - v[starts])[run_of]
        off = offsets[np.searchsorted(rng_keys, rng)]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(v),
                "bin_id": pa.array((off + excl) // np.int64(capacity)),
            }
        )

    return (
        base.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
        .sort("doc_id")
    )


def token_budget_sample_ds(
    docs_ds,
    budget: int,
    *,
    range_bits: int = 8,
    num_partitions: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Deterministic token-budget subsample: "take exactly ~``budget``
    tokens of data" — docs are laid out in 63-bit-hash order (a stable
    uniform shuffle, the sampling-family hash) and kept while the
    EXCLUSIVE prefix token sum stays below the budget. The kept set is a
    pure function of (corpus, budget): stable across cluster sizes,
    batch splits and re-runs, and exactly SQL-expressible (hash-ordered
    window cumsum).

    Same two-pass shape as :func:`pack_bins_ds`, but ranged on the TOP
    BITS of the key hash (2^range_bits ranges — uniform by construction,
    so range totals are balanced even on adversarial id sets): one tiny
    per-range aggregate prefix-summed on the driver, one hash shuffle,
    one vectorized run-boundary cumsum per partition. Returns
    ``(doc_id, n_tokens)`` of the kept docs sorted by id.
    """
    from ray.data.aggregate import Sum

    from lsearch_ray.analyzer import doc_lengths_table
    from lsearch_ray.functions.dedup import partition_ids
    from lsearch_ray.functions.sampling import _key_hash63

    if budget < 0:
        raise ValueError("token_budget_sample_ds: budget must be >= 0")
    shift = np.int64(63 - range_bits)

    def tok(b: pa.Table) -> pa.Table:
        t = doc_lengths_table(b, text_col=text_col, id_col=id_col)
        h = _key_hash63(t[id_col])
        return pa.table(
            {
                "doc_id": t[id_col],
                "n_tokens": t["dl"],
                "h": pa.array(h),
                "rng": pa.array(h >> shift),
            }
        )

    base = docs_ds.map_batches(tok, batch_format="pyarrow").materialize()
    totals = base.groupby("rng").aggregate(Sum("n_tokens", alias_name="tot")).take_all()
    totals.sort(key=lambda r: r["rng"])
    rng_keys = np.array([r["rng"] for r in totals], dtype=np.int64)
    tots = np.array([r["tot"] for r in totals], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(tots)[:-1])) if len(tots) else tots

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__part", pa.array(partition_ids(b, ["rng"], num_partitions))
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("rng", "ascending"),
                ("h", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        t = t.take(idx)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        v = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = t["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, starts, run_of = run_bounds(t["rng"])
        total = np.cumsum(v)
        excl = total - v - (total[starts] - v[starts])[run_of]
        off = offsets[np.searchsorted(rng_keys, rng)]
        keep = (off + excl) < np.int64(budget)
        kept = t.filter(pa.array(keep))
        return pa.table(
            {"doc_id": kept["doc_id"], "n_tokens": kept["n_tokens"]}
        )

    return (
        base.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
        .sort("doc_id")
    )


def pack_bins_by_group_ds(
    docs_ds,
    group_col: str,
    *,
    capacity: int = 512,
    range_width: int = 256,
    num_partitions: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-group sequence packing: each group (language, source) gets its
    OWN id-ordered context-window stream — the per-language packing of
    multilingual pretraining. ``bin_id`` restarts at 0 inside every
    group; the rule is the grouped twin of :func:`pack_bins_ds`
    (``sum(n) OVER (PARTITION BY g ORDER BY id ROWS ... 1 PRECEDING) //
    capacity``).

    Same two-pass shape: per-(group, range) totals (a tiny driver table,
    groups × ranges rows) prefix-summed WITHIN each group, one hash
    shuffle on (group, range), one vectorized run-boundary cumsum per
    partition. Null groups raise (no defined stream).
    """
    if capacity <= 0 or range_width <= 0:
        raise ValueError(
            "pack_bins_by_group_ds: capacity and range_width must be > 0"
        )
    from ray.data.aggregate import Sum

    def tok(b: pa.Table) -> pa.Table:
        t = doc_lengths_table(b, text_col=text_col, id_col=id_col)
        g = b[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if g.null_count:
            raise ValueError(
                f"pack_bins_by_group_ds: {group_col} has nulls"
            )
        ids = t[id_col].combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        if len(idn) and idn.min() < 0:
            raise ValueError("pack_bins_by_group_ds: negative ids unsupported")
        return pa.table(
            {
                "doc_id": ids,
                "grp": g,
                "n_tokens": t["dl"],
                "rng": pa.array(idn // np.int64(range_width)),
            }
        )

    base = docs_ds.map_batches(tok, batch_format="pyarrow").materialize()
    totals = (
        base.groupby(["grp", "rng"])
        .aggregate(Sum("n_tokens", alias_name="tot"))
        .take_all()
    )
    totals.sort(key=lambda r: (r["grp"], r["rng"]))
    offsets: dict[tuple, int] = {}
    acc_grp, acc = None, 0
    for r in totals:
        if r["grp"] != acc_grp:
            acc_grp, acc = r["grp"], 0
        offsets[(r["grp"], r["rng"])] = acc
        acc += int(r["tot"])

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__part",
            pa.array(partition_ids(b, ["grp", "rng"], num_partitions)),
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("grp", "ascending"),
                ("rng", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "grp": pa.array([], pa.large_string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                }
            )
        v = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = t["grp"].to_numpy(zero_copy_only=False)
        rng = t["rng"].to_numpy(zero_copy_only=False)
        # composite (grp, rng) run boundaries
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (grp[1:] != grp[:-1]) | (rng[1:] != rng[:-1])
        starts = np.flatnonzero(new_run)
        run_of = np.cumsum(new_run) - 1
        total = np.cumsum(v)
        excl = total - v - (total[starts] - v[starts])[run_of]
        off = np.array(
            [offsets[(grp[s], int(rng[s]))] for s in starts], dtype=np.int64
        )[run_of]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "grp": t["grp"],
                "n_tokens": pa.array(v),
                "bin_id": pa.array((off + excl) // np.int64(capacity)),
            }
        )

    return (
        base.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
        .sort("doc_id")
    )
