"""Deterministic mixture rebalancing: per-stratum quota sampling.

Training mixtures cap over-represented sources ("at most N pages from
domain X"). This operator keeps, for every stratum, exactly
``min(cap, stratum_size)`` rows — the ones with the SMALLEST 63-bit key
hash — so the selection is a uniform-without-replacement sample that is
bit-stable across cluster sizes, batch splits, and re-runs, and exactly
reproducible in SQL (``row_number() OVER (PARTITION BY stratum ORDER BY
hash, key) <= cap``).

Two streaming passes, no shuffle:
1. threshold pass — per batch, per stratum, a vectorized partial
   smallest-``cap`` of (hash, key) (one lexsort + run-boundary rank per
   batch); the driver merges partials and takes each stratum's cap-th
   smallest pair as its threshold. Merge traffic is bounded by
   ``cap × n_strata`` per block.
2. filter pass — broadcast the tiny threshold table, keep rows with
   ``(hash, key) <=`` their stratum's threshold.

The driver-side merge assumes ``cap × n_strata`` pairs fit the driver —
the broadcast-small-side regime. For caps beyond that, thresholds
should be derived per stratum via the distributed quantile machinery
(functions/quantiles.py) instead; the filter pass is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.sampling import _key_hash63


def _stratum_codes(col, cats: list) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    denc = col.dictionary_encode() if not pa.types.is_dictionary(col.type) else col
    local = denc.dictionary.to_pylist()
    remap = np.empty(len(local) + 1, dtype=np.int64)
    for i, c in enumerate(local):
        if c not in cats:
            cats.append(c)
        remap[i] = cats.index(c)
    remap[len(local)] = -1  # nulls: no stratum, never kept
    import pyarrow.compute as pc

    codes = np.asarray(pc.fill_null(denc.indices.cast(pa.int64()), len(local)))
    return remap[codes]


class _PartialMinK:
    """Per-batch per-stratum smallest-cap (hash, key) partials."""

    def __init__(self, strata_col: str, key_col: str, caps: dict):
        self.strata_col = strata_col
        self.key_col = key_col
        self.caps = caps

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = _key_hash63(batch[self.key_col])
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        cats: list = []
        codes = _stratum_codes(batch[self.strata_col], cats)
        capv = np.array([self.caps.get(c, 0) for c in cats], dtype=np.int64)
        order = np.lexsort((keys, h, codes))
        sc, sh, sk = codes[order], h[order], keys[order]
        live = sc >= 0
        sc, sh, sk = sc[live], sh[live], sk[live]
        n = len(sc)
        if n == 0:
            return pa.table(
                {
                    "stratum": pa.array([], type=pa.string()),
                    "h": pa.array([], type=pa.int64()),
                    "key": pa.array([], type=pa.int64()),
                }
            )
        first = np.concatenate(([True], sc[1:] != sc[:-1]))
        starts = np.flatnonzero(first)
        run_of = np.cumsum(first) - 1
        rank = np.arange(n, dtype=np.int64) - starts[run_of]
        keep = rank < capv[sc]
        return pa.table(
            {
                "stratum": pa.array([cats[c] for c in sc[keep]], type=pa.string()),
                "h": pa.array(sh[keep], type=pa.int64()),
                "key": pa.array(sk[keep], type=pa.int64()),
            }
        )


def quota_sample(
    ds,
    strata_col: str,
    key_col: str,
    caps: dict[str, int],
):
    """Keep per stratum the ``caps[stratum]`` rows with the smallest
    (hash(key), key); strata absent from ``caps`` are dropped. Returns a
    Dataset with ``ds``'s schema. ``key_col`` must be a unique integer
    column (the tiebreak order relies on integer comparison)."""
    partials = ds.map_batches(
        _PartialMinK(strata_col, key_col, caps), batch_format="pyarrow"
    )
    # streaming merge: prune each stratum's pair list back to its cap
    # smallest whenever it overshoots, so driver memory stays at the
    # documented cap × n_strata (not cap × n_strata × n_blocks)
    best: dict[str, list[tuple[int, int]]] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for s, h, k in zip(
            b["stratum"].to_pylist(), b["h"].to_pylist(), b["key"].to_pylist()
        ):
            lst = best.setdefault(s, [])
            lst.append((h, k))
            cap = caps.get(s, 0)
            if len(lst) > 2 * max(cap, 1):
                lst.sort()
                del lst[cap:]
    thresholds: dict[str, tuple[int, int]] = {}
    for s, pairs in best.items():
        pairs.sort()
        cap = caps.get(s, 0)
        if cap > 0 and pairs:
            thresholds[s] = pairs[min(cap, len(pairs)) - 1]

    def filt(batch: pa.Table) -> pa.Table:
        h = _key_hash63(batch[key_col])
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        cats: list = []
        codes = _stratum_codes(batch[strata_col], cats)
        # sentinel slot at len(cats) for null/unknown strata (threshold
        # (-1, -1) keeps nothing) — indexing stays in bounds even when a
        # batch's stratum column is ENTIRELY null and cats is empty
        th = np.array(
            [thresholds.get(c, (-1, -1))[0] for c in cats] + [-1],
            dtype=np.int64,
        )
        tk = np.array(
            [thresholds.get(c, (-1, -1))[1] for c in cats] + [-1],
            dtype=np.int64,
        )
        idx = np.where(codes >= 0, codes, len(cats))
        keep = (h < th[idx]) | ((h == th[idx]) & (keys <= tk[idx]))
        return batch.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def temperature_rates(
    counts: dict[str, int],
    *,
    target_num: int = 1,
    target_den: int = 3,
    denom: int = 10**6,
) -> dict[str, tuple[int, int]]:
    """Per-stratum keep rates for temperature-balanced (alpha = 0.5)
    mixture sampling — the multilingual-rebalancing rule of LLM training
    mixtures (sample stratum s proportionally to ``count_s^alpha``), in
    pure integer arithmetic so the rule replays bit-exactly in SQL.

    With ``T = (total * target_num) // target_den`` rows targeted and
    weights ``w_s = isqrt(count_s)``:

        rate_micro_s = min(denom, (T * w_s * denom) // (count_s * W))

    where ``W = sum(w_s)``. Head strata are down-sampled toward the
    temperature distribution; tail strata saturate at keep-all. The
    returned dict feeds :func:`lsearch_ray.functions.sampling.
    stratified_hash_sample` directly (rates as ``(num, denom)`` pairs).

    Driver-side on the per-stratum count table only (strata are languages
    / sources — thousands at most, never row-scale data).
    """
    import math

    total = sum(counts.values())
    target = (total * target_num) // target_den
    w = {s: math.isqrt(c) for s, c in counts.items()}
    wsum = sum(w.values())
    rates: dict[str, tuple[int, int]] = {}
    for s, c in counts.items():
        if c <= 0 or wsum == 0:
            rates[s] = (0, denom)
        else:
            rates[s] = (min(denom, (target * w[s] * denom) // (c * wsum)), denom)
    return rates


def temperature_sample(
    ds,
    key_col: str,
    strata_col: str,
    *,
    target_num: int = 1,
    target_den: int = 3,
):
    """Temperature-balanced deterministic sampling: one tiny groupby-count
    (the per-stratum histogram, collected to the driver and broadcast as
    rates), then the no-shuffle :func:`stratified_hash_sample` filter
    pass. Null strata are dropped (no defined weight)."""
    from ray.data.aggregate import Count

    from lsearch_ray.functions.sampling import stratified_hash_sample

    rows = ds.groupby(strata_col).aggregate(Count(alias_name="c")).take_all()
    counts = {
        r[strata_col]: r["c"] for r in rows if r[strata_col] is not None
    }
    rates = temperature_rates(
        counts, target_num=target_num, target_den=target_den
    )
    return stratified_hash_sample(ds, key_col, strata_col, rates)
