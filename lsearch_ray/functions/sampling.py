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


def hash_split_labels(col) -> "pa.Array":
    """Reproducible 90/5/5 train/val/test labels from the finalized key
    hash — the ONE definition behind dataset_split (keyed on doc id) and
    cluster_split (keyed on the dup-component label, so near-dup
    clusters move between splits as units)."""
    h = _key_hash63(col).astype(np.uint64) % 100
    lbl = np.where(h < 90, "train", np.where(h < 95, "val", "test"))
    return pa.array(lbl.tolist(), pa.string())


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


# exact vectorized bit_length for 16-bit chunks (no float log — log2 of
# integers near powers of two is not guaranteed correctly rounded, and
# the HLL rank must be integer-exact to replay in SQL)
_BL16 = np.zeros(1 << 16, dtype=np.int64)
for _k in range(16):
    _BL16[1 << _k : 1 << (_k + 1)] = _k + 1


def _bit_length63(x: np.ndarray) -> np.ndarray:
    """Exact bit_length of nonnegative int64 values (< 2^63)."""
    x = x.astype(np.uint64)
    hi = (x >> np.uint64(48)).astype(np.int64)
    m2 = ((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)
    m1 = ((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)
    lo = (x & np.uint64(0xFFFF)).astype(np.int64)
    return np.where(
        hi > 0,
        _BL16[hi] + 48,
        np.where(m2 > 0, _BL16[m2] + 32, np.where(m1 > 0, _BL16[m1] + 16, _BL16[lo])),
    )


def hll_buckets(ds, key_col: str, *, p: int = 9) -> pa.Table:
    """Distributed HyperLogLog register table (Flajolet et al. '07) for
    ``key_col``: bucket = top ``p`` bits of the 63-bit key hash, register
    = max over the bucket's keys of (leading zeros of the remaining
    ``63-p`` bits + 1). Returns only the non-empty registers as a sorted
    integer table (bucket:int64, r:int64) — integer-exact, so the SQL
    oracle replays it bit-for-bit (the estimate itself is float; see
    :func:`hll_estimate`).

    Scale shape: per batch one vectorized pass folds the batch into ≤ 2^p
    register rows (``np.maximum.at``); a tiny groupby-max merges
    partials. Merge state is ≤ 2^p ints regardless of data size —
    the canonical mergeable-sketch layout (same family as KMV above).
    Null keys are skipped (SQL: WHERE key IS NOT NULL).
    """
    from ray.data.aggregate import Max

    m = 1 << p
    w = 63 - p
    rest_mask = np.int64((1 << w) - 1)

    def partial(b: pa.Table) -> pa.Table:
        col = b[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.filter(pc.is_valid(col))
        h = _key_hash63(col)
        if len(h) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "r": pa.array([], type=pa.int64()),
                }
            )
        bucket = h >> w
        rest = h & rest_mask
        rank = np.where(rest == 0, w + 1, w - _bit_length63(rest) + 1)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, bucket, rank)
        present = np.flatnonzero(reg)
        return pa.table(
            {
                "bucket": pa.array(present.astype(np.int64)),
                "r": pa.array(reg[present]),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("r", alias_name="r"))
        .take_all()
    )  # ≤ 2^p rows — the sketch, not data
    rows.sort(key=lambda x: x["bucket"])
    return pa.table(
        {
            "bucket": pa.array([int(x["bucket"]) for x in rows], type=pa.int64()),
            "r": pa.array([int(x["r"]) for x in rows], type=pa.int64()),
        }
    )


def hll_estimate(buckets: pa.Table, *, p: int = 9) -> float:
    """Bias-corrected HLL cardinality from :func:`hll_buckets` output
    (α_m·m²/Σ2^(-r), linear counting below 2.5m when empty registers
    exist — the standard small-range correction)."""
    import math

    m = 1 << p
    ranks = buckets["r"].to_numpy(zero_copy_only=False)
    zeros = m - len(ranks)
    harm = zeros * 1.0 + float(np.sum(np.power(2.0, -ranks.astype(np.float64))))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / harm
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def priority_sample(
    ds,
    key_col: str,
    weight_col: str,
    n: int,
    *,
    hash_shift: int = 23,
):
    """Weighted sample of ``n`` rows by PRIORITY SAMPLING (Duffield,
    Lund & Thorup '07): each row gets priority ``q = w / u`` with a
    deterministic hash-derived uniform, and the top-``n`` priorities win
    — inclusion probability ∝ weight for the tail, exactly the weighted
    analogue of the bottom-k hash sample above.

    Integer determinism: ``u`` is the hash's top 40 bits, so
    ``q = floor((w << 40) / ((h >> hash_shift) + 1))`` is pure int64
    arithmetic (weights must be integral and fit 23 bits) and the SQL
    twin replays it exactly; ordering ties break by (h, key) — both
    engines see identical bytes. Quantizing u to 40 bits perturbs
    inclusion odds by ≤ 2^-40, immaterial for sampling.

    Scale shape: per-batch partial top-``n`` (combiner) → final
    sort+limit over ``n × num_batches`` rows; no shuffle of the input.
    Returns a Dataset of the sampled rows + ``priority``.
    """

    def partial(b: pa.Table) -> pa.Table:
        col = b[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col)
        b = b.filter(valid)
        if b.num_rows == 0:
            return b.append_column(
                "priority", pa.array([], type=pa.int64())
            ).append_column("_h", pa.array([], type=pa.int64()))
        h = _key_hash63(b[key_col])
        w_f = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if (w_f != np.floor(w_f)).any():
            raise ValueError("priority_sample: weights must be integral")
        w = w_f.astype(np.int64)
        if (w <= 0).any():
            raise ValueError("priority_sample: weights must be positive")
        if (w >= (1 << 23)).any():
            raise ValueError("priority_sample: weights must fit 23 bits")
        q = (w << 40) // ((h >> hash_shift) + 1)
        out = b.append_column("priority", pa.array(q)).append_column(
            "_h", pa.array(h)
        )
        if out.num_rows > n:
            # keep a SUPERSET: everything at or above the n-th (q desc,
            # h asc) boundary INCLUDING its ties — a (q, h) tie at the
            # cut (only possible on a 63-bit hash collision) must not be
            # dropped arbitrarily, because the final global sort (and
            # the SQL twin) breaks it by the key column
            order = np.lexsort((h, -q))
            qn, hn = q[order[n - 1]], h[order[n - 1]]
            keep = (q > qn) | ((q == qn) & (h <= hn))
            out = out.filter(pa.array(keep))
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["priority", "_h", key_col], descending=[True, False, False])
        .limit(n)
        .drop_columns(["_h"])
    )


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


def hash_rank_ds(ds, id_col: str, *, range_bits: int = 8, num_partitions: int = 8):
    """Global rank of every row in (hash, id) order — a stable uniform
    shuffle position, the backbone of deterministic pairing/splitting.

    Same two-pass shape as packing.token_budget_sample_ds: per-range row
    counts (2^range_bits ranges on the hash TOP BITS — balanced by
    construction) prefix-summed on the driver, one hash-partition shuffle,
    one vectorized run-boundary local rank per partition. Returns a
    Dataset of (id_col, rk) with rk ∈ [0, n); ties on the 63-bit hash
    break by ascending id, so the order is total and engine-independent.
    """
    from ray.data.aggregate import Count

    from lsearch_ray.functions.dedup import partition_ids
    from lsearch_ray.functions.grouped import run_bounds

    shift = np.int64(63 - range_bits)

    def tok(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = _key_hash63(ids)
        return pa.table(
            {id_col: ids, "h": pa.array(h), "rng": pa.array(h >> shift)}
        )

    base = ds.map_batches(tok, batch_format="pyarrow").materialize()
    totals = base.groupby("rng").aggregate(Count(alias_name="tot")).take_all()
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
                (id_col, "ascending"),
            ],
        )
        t = t.take(idx)
        if t.num_rows == 0:
            return pa.table(
                {id_col: t[id_col], "rk": pa.array([], pa.int64())}
            )
        rng = t["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, starts, run_of = run_bounds(t["rng"])
        local = np.arange(t.num_rows, dtype=np.int64)
        local -= starts[run_of]
        off = offsets[np.searchsorted(rng_keys, rng)]
        return pa.table({id_col: t[id_col], "rk": pa.array(off + local)})

    return (
        base.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def negative_pairs_ds(
    ds,
    id_col: str,
    *,
    k: int = 2,
    range_bits: int = 8,
    num_partitions: int = 8,
):
    """Deterministic contrastive negative sampling: pair every id with
    ``k`` pseudo-random "far" partners — the id at rank
    ``(rk + j·(n // (k+1))) % n`` of the hash-ordered ring, j ∈ [1, k].

    The hash order is a stable uniform shuffle, so the partners are
    uniform-looking yet a pure function of the id set: reproducible
    across runs, cluster sizes and partitionings, and exactly
    SQL-expressible (row_number over the same hash + modular join).
    Self-pairs (possible when n ≤ k+1 makes the stride wrap) are dropped
    deterministically. Returns (id_col, j, neg_id) sorted by (id, j).

    Scale: one :func:`hash_rank_ds` pass, a k-way stateless flat-map and
    ONE int-keyed hash join (uniform ranks — no skew); nothing is
    broadcast or collected beyond the 2^range_bits range counts.
    """
    from lsearch_ray.functions.joins import hash_join

    if k < 1:
        raise ValueError("negative_pairs_ds: k must be >= 1")
    ranked = hash_rank_ds(
        ds, id_col, range_bits=range_bits, num_partitions=num_partitions
    ).materialize()
    n = ranked.count()
    if n == 0:
        return ranked.map_batches(
            lambda t: pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "neg_id": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    stride = n // (k + 1)

    def probes(t: pa.Table) -> pa.Table:
        rk = t["rk"].to_numpy(zero_copy_only=False)
        ids = t[id_col]
        parts = []
        for j in range(1, k + 1):
            prk = (rk + j * stride) % n
            parts.append(
                pa.table(
                    {
                        id_col: ids,
                        "j": pa.array(np.full(len(rk), j, dtype=np.int64)),
                        "prk": pa.array(prk),
                    }
                )
            )
        return pa.concat_tables(parts)

    probe_ds = ranked.map_batches(probes, batch_format="pyarrow")
    targets = ranked.map_batches(
        lambda t: pa.table({"neg_id": t[id_col], "rk": t["rk"]}),
        batch_format="pyarrow",
    )
    # partitions sized to the SMALLER (targets, n rows) side: more
    # partitions than rows yields empty right-side partitions, which
    # Ray's hash-join aggregator rejects (ArrowInvalid at finalize)
    from lsearch_ray.functions.minhash import _pair_partitions

    joined = hash_join(
        probe_ds,
        targets,
        on="prk",
        right_on="rk",
        num_partitions=_pair_partitions(n, cap=16),
    )
    out = joined.map_batches(
        lambda t: pa.table(
            {
                id_col: t[id_col],
                "j": t["j"],
                "neg_id": t["neg_id"],
            }
        ).filter(pc.not_equal(t[id_col], t["neg_id"])),
        batch_format="pyarrow",
    )
    return out.sort([id_col, "j"])
