"""Bloom-filter semi-join: the scale path for filtering a huge fact
table by membership in a large key set WITHOUT shuffling the fact table.

The reference engine's only join-like surface is per-record filtering
(`/root/reference/src/search.rs:99-123`); this is the large-scale
membership form a training-data pipeline needs (e.g. keep lineitems of
flagged orders, keep documents whose domain is on a large allowlist).

Plan shape:

1. **Build** — each batch of the key side sets ``k_hashes`` bit
   positions per key in a local ``m_bits``-bit bitmap (vectorized
   double hashing over the shared :func:`~.dedup._col_hash64` row hash
   plus a splitmix finalizer — the bitmap index is a power-of-two mod,
   so the multiplicative hash's weak low bits must be folded first).
   Per-batch bitmaps are OR-mergeable partials (the KMV pattern); an
   intermediate ``map_batches`` OR level collapses them 64:1 before the
   driver does the final OR, so the driver never sees O(#batches)
   bitmaps.
2. **Probe** — the merged bitmap is ``ray.put`` ONCE; every fact batch
   tests its keys against it zero-copy (false positives only, never
   false negatives). The fact table is never shuffled.
3. **Exact verify** (default on) — survivors are exact semi-joined
   against the true key set: broadcast ``is_in`` below
   ``broadcast_limit`` distinct keys, distributed inner hash join above
   it. The final result is EXACT; the bloom stage only bounds how many
   fact rows reach the exact join (expected false-positive rate
   ``(1 - e^(-k·n/m))^k``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.functions.dedup import _col_hash64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: every output bit depends on every input bit
    (the raw multiplicative hash leaves low bits correlated with the
    key's low bits, which a power-of-two bitmap mod would expose)."""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * _MIX1
        h = (h ^ (h >> np.uint64(27))) * _MIX2
        return h ^ (h >> np.uint64(31))


def _positions(col, m_bits: int, k_hashes: int) -> list[np.ndarray]:
    """The k bit positions per row — double hashing h1 + i·h2 (h2 odd)."""
    h1 = _mix64(_col_hash64(col))
    with np.errstate(over="ignore"):
        h2 = (h1 * _GOLDEN) | np.uint64(1)
        return [
            ((h1 + np.uint64(i) * h2) % np.uint64(m_bits))
            for i in range(k_hashes)
        ]


def build_bloom_filter(
    keys_ds, key_col: str, *, m_bits: int = 1 << 23, k_hashes: int = 4
) -> np.ndarray:
    """OR-reduce per-batch bitmaps into one ``m_bits``-bit bloom filter
    (returned as a packed uint64 array of length ``m_bits/64``)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    nwords = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(nwords, dtype=np.uint64)
        col = b[key_col].combine_chunks()
        if col.null_count:
            col = col.filter(pc.is_valid(col))
        if len(col):
            for idx in _positions(col, m_bits, k_hashes):
                np.bitwise_or.at(
                    bm,
                    (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)),
                )
        return pa.table({"bits": pa.array([bm.tobytes()], pa.large_binary())})

    def or_merge(b: pa.Table) -> pa.Table:
        bm = np.zeros(nwords, dtype=np.uint64)
        for blob in b["bits"]:
            bm |= np.frombuffer(blob.as_py(), dtype=np.uint64)
        return pa.table({"bits": pa.array([bm.tobytes()], pa.large_binary())})

    rows = (
        keys_ds.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(or_merge, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    out = np.zeros(nwords, dtype=np.uint64)
    for r in rows:
        out |= np.frombuffer(r["bits"], dtype=np.uint64)
    return out


def _bloom_candidates(col, bm: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """Per-row candidacy mask for a column against an OR-merged bitmap:
    True where every probed bit is set (possible member, incl. false
    positives); nulls are never candidates. THE shared probe kernel of
    both bloom joins — bit arithmetic lives in exactly one place."""
    cand = np.zeros(len(col), dtype=bool)
    valid = np.flatnonzero(np.asarray(pc.is_valid(col)))
    if len(valid):
        sub = col.drop_null()  # hash only valid rows (null→NaN casts)
        hit = np.ones(len(valid), dtype=bool)
        for idx in _positions(sub, m_bits, k_hashes):
            hit &= (
                (bm[(idx >> np.uint64(6)).astype(np.int64)]
                 >> (idx & np.uint64(63)))
                & np.uint64(1)
            ).astype(bool)
        cand[valid] = hit
    return cand


def _distinct_keys(keys_ds, kcol: str):
    """(distinct-keys Dataset named __bloom_key, upper-bound count) —
    the shared exact-verify prologue of both bloom joins (per-batch
    unique partials; the count over-estimates until the global dedup)."""
    distinct = keys_ds.select_columns([kcol]).map_batches(
        lambda b: pa.table(
            {"__bloom_key": b[kcol].combine_chunks().unique()}
        ),
        batch_format="pyarrow",
    ).materialize()
    return distinct, distinct.count()


def _broadcast_key_array(distinct) -> pa.Array:
    import ray

    return pa.concat_tables(
        ray.get(distinct.to_arrow_refs()), promote_options="permissive"
    )["__bloom_key"].combine_chunks().unique()


def bloom_semi_join(
    fact_ds,
    keys_ds,
    on: str,
    *,
    key_col: str | None = None,
    m_bits: int = 1 << 23,
    k_hashes: int = 4,
    exact: bool = True,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
):
    """Rows of ``fact_ds`` whose ``on`` value appears in ``keys_ds``'s
    ``key_col`` (nulls never match, standard semi-join semantics).
    ``keys_ds`` need not be distinct. Exact unless ``exact=False`` (then
    bloom false positives survive — useful as a pre-filter stage)."""
    import ray

    kcol = key_col or on
    bits = build_bloom_filter(
        keys_ds, kcol, m_bits=m_bits, k_hashes=k_hashes
    )
    bref = ray.put(bits)

    def probe(b: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        return b.filter(
            pa.array(
                _bloom_candidates(
                    b[on].combine_chunks(), bm, m_bits, k_hashes
                )
            )
        )

    cand = fact_ds.map_batches(probe, batch_format="pyarrow")
    if not exact:
        return cand

    distinct, n = _distinct_keys(keys_ds, kcol)
    if n <= broadcast_limit:
        from lsearch_ray.functions.joins import broadcast_semi_join

        return broadcast_semi_join(cand, _broadcast_key_array(distinct), on)

    from lsearch_ray.functions.dedup import exact_dedup

    distinct = exact_dedup(
        distinct, ["__bloom_key"], ["__bloom_key"],
        num_partitions=num_partitions,
    )
    # inner join against a distinct key column = exact semi-join
    return cand.join(
        distinct,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on,),
        right_on=("__bloom_key",),
    )


def bloom_anti_join(
    fact_ds,
    keys_ds,
    on: str,
    *,
    key_col: str | None = None,
    m_bits: int = 1 << 23,
    k_hashes: int = 4,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
):
    """Rows of ``fact_ds`` whose ``on`` value does NOT appear in
    ``keys_ds`` — the incremental-ingest dedup shape ("drop records whose
    key the base corpus already holds").

    The bloom bitmap serves the OPPOSITE role of the semi join: rows with
    any unset bit are DEFINITE non-members and pass with no further work;
    only bloom candidates (true members plus false positives) reach the
    exact check, which keeps those the distinct key set does not contain.
    Null keys never match, so they survive (standard anti semantics).
    One probe pass flags candidacy; the candidate side is typically a
    tiny fraction of the incoming stream, so the exact stage is cheap.
    """
    import ray

    kcol = key_col or on
    bits = build_bloom_filter(keys_ds, kcol, m_bits=m_bits, k_hashes=k_hashes)
    bref = ray.put(bits)

    def flag(b: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        return b.append_column(
            "__cand",
            pa.array(
                _bloom_candidates(
                    b[on].combine_chunks(), bm, m_bits, k_hashes
                )
            ),
        )

    flagged = fact_ds.map_batches(flag, batch_format="pyarrow").materialize()

    def split(b: pa.Table, keep_cand: bool) -> pa.Table:
        keep = b["__cand"] if keep_cand else pc.invert(b["__cand"])
        return b.filter(keep).drop_columns(["__cand"])

    misses = flagged.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    )
    cand = flagged.map_batches(
        lambda b: split(b, True), batch_format="pyarrow"
    ).materialize()
    if cand.count() == 0:
        return misses

    distinct, n = _distinct_keys(keys_ds, kcol)
    if n <= broadcast_limit:
        from lsearch_ray.functions.joins import broadcast_semi_join

        survivors = broadcast_semi_join(
            cand, _broadcast_key_array(distinct), on, anti=True
        )
    else:
        from lsearch_ray.functions.dedup import exact_dedup

        distinct = exact_dedup(
            distinct, ["__bloom_key"], ["__bloom_key"],
            num_partitions=num_partitions,
        ).map_batches(
            # the join coalesces the key into the left column name, so an
            # explicit marker is the only way to see non-matches
            lambda b: b.append_column(
                "__hit", pa.array(np.ones(b.num_rows, dtype=np.int8))
            ),
            batch_format="pyarrow",
        )
        # left_outer against a distinct key column + null marker = anti
        survivors = cand.join(
            distinct,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=(on,),
            right_on=("__bloom_key",),
        ).map_batches(
            lambda b: b.filter(pc.is_null(b["__hit"])).drop_columns(
                [c for c in ("__hit", "__bloom_key") if c in b.schema.names]
            ),
            batch_format="pyarrow",
        )
    return misses.union(survivors)
