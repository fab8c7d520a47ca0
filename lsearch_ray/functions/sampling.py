"""Sampling + sketches (SURVEY §2.9: categories the reference lacks).

Both operators are DETERMINISTIC by construction — they key on the
63-bit FNV-1a hash of a column, not an RNG — so the exact same rows /
estimates fall out on any cluster size, any batch split, and in the
DuckDB oracle (which can express the identical hash arithmetic).

- :func:`hash_sample` — keep rows where ``hash(key) mod denom < num``:
  a stable p = num/denom Bernoulli sample, embarrassingly parallel
  (one filter per batch, no shuffle, no state).
- :func:`kmv_distinct` — K-Minimum-Values distinct-count sketch
  (Bar-Yossef et al. '02): per batch keep the k smallest distinct key
  hashes (partial), union + re-take k smallest at the driver (the merge
  state is k int64s — trivially mergeable across any partitioning), and
  estimate ``n_distinct ≈ (k-1) * 2^63 / h_k``. Deterministic: same
  hashes → same kth minimum → same estimate, bit-for-bit, any split.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.corpus import fnv1a64

_HASH_SPACE = float(1 << 63)


_MIX = np.uint64(0x9E3779B97F4A7C15)
_MASK63 = np.uint64((1 << 63) - 1)


def _key_hash63(col) -> np.ndarray:
    """Uniform 63-bit key hash: FNV-1a over the column's string form,
    finished with a multiplicative mix. The mix matters: plain FNV of
    short sequential strings is badly non-uniform (measured: 75% of
    hashes below 2^62 for decimal ids), which breaks both the sample
    fraction and the KMV kth-minimum; one odd-constant multiply mod 2^64
    restores uniformity and is exactly reproducible in SQL (HUGEINT)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        col = pc.cast(col, pa.string())
    h = fnv1a64(col).astype(np.uint64)
    with np.errstate(over="ignore"):
        return ((h * _MIX) & _MASK63).astype(np.int64)


def hash_sample(ds, key_col: str, *, num: int = 1, denom: int = 10):
    """Deterministic p = num/denom sample keyed on ``hash(key_col)``."""

    def filt(b: pa.Table) -> pa.Table:
        h = _key_hash63(b[key_col])
        return b.filter(pa.array((h % denom) < num))

    return ds.map_batches(filt, batch_format="pyarrow")


def stratified_hash_sample(
    ds,
    key_col: str,
    strata_col: str,
    rates: dict[str, tuple[int, int]],
    *,
    default: tuple[int, int] = (0, 1),
):
    """Deterministic per-stratum sampling: a row in stratum ``s`` is kept
    iff ``hash(key) mod denom_s < num_s`` with ``(num_s, denom_s) =
    rates[s]`` (``default`` for unlisted strata; ``(0, 1)`` drops them).

    Same no-shuffle, no-state shape as :func:`hash_sample` — one
    vectorized filter per batch, the per-stratum rate looked up through
    a dictionary-encoded stratum column — and the same SQL-expressible
    determinism (a CASE over the identical hash arithmetic).
    """

    def filt(b: pa.Table) -> pa.Table:
        h = _key_hash63(b[key_col]).astype(np.uint64)
        s = b[strata_col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        denc = s.dictionary_encode() if not pa.types.is_dictionary(s.type) else s
        # null strata: null indices would surface as NaN through
        # np.asarray — route them to a sentinel slot carrying `default`.
        # Cast to int64 BEFORE fill_null: an already-dictionary-encoded
        # column (parquet/pandas categorical) can arrive with int8
        # indices, where the sentinel len(cats) overflows the index type
        cats = denc.dictionary.to_pylist()
        codes = np.asarray(
            pc.fill_null(denc.indices.cast(pa.int64()), len(cats))
        )
        nums = np.array(
            [rates.get(c, default)[0] for c in cats] + [default[0]],
            dtype=np.uint64,
        )
        denoms = np.array(
            [max(1, rates.get(c, default)[1]) for c in cats]
            + [max(1, default[1])],
            dtype=np.uint64,
        )
        keep = (h % denoms[codes]) < nums[codes]
        return b.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def kmv_distinct(ds, key_col: str, *, k: int = 1024) -> dict:
    """KMV distinct-count estimate for ``key_col``.

    Returns {"estimate_e3": int, "kth_hash": int, "k": int}; the estimate
    is fixed-point (×1000, half-away rounding) so cross-engine comparison
    is integer-exact. If fewer than ``k`` distinct hashes exist the count
    is exact (the sketch holds them all).
    """

    def partial(b: pa.Table) -> pa.Table:
        h = np.unique(_key_hash63(b[key_col]))
        if len(h) > k:
            h = np.partition(h, k - 1)[:k]
        return pa.table({"h": pa.array(np.sort(h), type=pa.int64())})

    mins = ds.map_batches(partial, batch_format="pyarrow")
    # merge state: ≤ k int64 per block — take_all here is k × n_blocks
    # ints, not data rows
    all_h = np.unique(
        np.concatenate(
            [
                b["h"].to_numpy(zero_copy_only=False)
                for b in mins.iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    if len(all_h) < k:
        est = float(len(all_h))
        kth = int(all_h[-1]) if len(all_h) else 0
    else:
        kth = int(np.partition(all_h, k - 1)[k - 1])
        est = (k - 1) * _HASH_SPACE / float(kth)
    return {
        "estimate_e3": int(np.floor(est * 1000.0 + 0.5)),
        "kth_hash": kth,
        "k": k,
    }
