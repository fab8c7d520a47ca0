"""MinHash + LSH near-duplicate detection over a text column.

Pipeline (SURVEY.md §2.9 gap; standard MinHash-LSH as in Broder '97 /
MMDS ch.3):

1. ``map_batches(MinHashSignatures)`` — stateless, vectorized: tokenize
   (the engine's analyzer), hash token ``n``-gram shingles to uint64,
   then ``num_perm`` universal-hash permutations reduced per doc with
   ``np.minimum.reduceat`` — no Python loop over docs.
2. Band rows: signatures split into ``bands`` bands of ``rows_per_band``;
   each band hashed to one ``(band_id, band_hash, doc_id)`` row.
3. ``groupby(band, band_hash)`` shuffle → candidate pairs within each
   bucket (bucket size capped; an over-cap bucket means near-identical
   boilerplate — pairs against the bucket minimum still chain the
   cluster together through union-find instead of emitting O(n²) pairs).
4. Verify: estimated Jaccard = fraction of equal signature components,
   computed by joining candidate pairs back to signatures (broadcast when
   signatures fit, hash-join otherwise).
5. Connected components via union-find over surviving pairs (pairs ≪
   corpus after banding); above ``driver_pair_limit`` the verify and
   clustering both run fully distributed (hash-join + min-label
   propagation, functions/components.py) — nothing pair-shaped touches
   the driver.

``minhash_dedup`` returns the survivor Dataset (min doc_id per cluster
kept), same schema as the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.analyzer import flat_tokens_arrow

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64(0xFFFFFFFFFFFFFFFF)


def _token_hashes(batch_texts) -> tuple[np.ndarray, np.ndarray]:
    """(doc boundaries, uint64 hash per token) for a text column."""
    parents, flat = flat_tokens_arrow(batch_texts)
    from lsearch_ray.corpus import fnv1a64

    h = fnv1a64(flat).astype(np.uint64)
    return parents, h


def _shingle_hashes(
    parents: np.ndarray, h: np.ndarray, n_docs: int, ngram: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling combine of ``ngram`` consecutive token hashes per doc.

    Returns (doc_starts_into_shingles, shingle_hash array). Docs shorter
    than ``ngram`` contribute one shingle over their full token run.
    """
    counts = (
        np.bincount(parents, minlength=n_docs)
        if len(parents)
        else np.zeros(n_docs, dtype=np.int64)
    )
    starts = np.concatenate(([0], np.cumsum(counts)))
    L = counts.astype(np.int64)
    n_sh = np.where(L > 0, np.maximum(1, L - ngram + 1), 0)
    sh_starts = np.concatenate(([0], np.cumsum(n_sh)))
    total = int(sh_starts[-1])
    if total == 0:
        return sh_starts, np.empty(0, dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    # acc[i] = polynomial combine of h[i : i+ngram] (full windows)
    acc = h.copy()
    with np.errstate(over="ignore"):
        for k in range(1, ngram):
            if k < len(acc):
                acc[: len(acc) - k] = acc[: len(acc) - k] * mult ^ h[k:]
        # vectorized gather of each doc's window hashes
        docs_idx = np.repeat(np.arange(n_docs), n_sh)
        within = np.arange(total) - sh_starts[docs_idx]
        out = acc[starts[docs_idx] + within]
        # docs shorter than ngram: one shingle over their full (short) run —
        # recomputed so no window crosses a doc boundary (determinism across
        # batch splits)
        for d in np.flatnonzero((L > 0) & (L < ngram)):
            s, e = int(starts[d]), int(starts[d + 1])
            v = h[s]
            for j in range(s + 1, e):
                v = v * mult ^ h[j]
            out[sh_starts[d]] = v
    return sh_starts, out


class MinHashSignatures:
    """map_batches transform: (id, text) → (id, sig list<uint64>)."""

    def __init__(
        self,
        num_perm: int = 128,
        ngram: int = 3,
        seed: int = 12345,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        rng = np.random.RandomState(seed)
        # universal hashing h_p(x) = (a_p * x + b_p) mod (2^61-1)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parents, h = _token_hashes(batch[self.text_col])
        sh_starts, sh = _shingle_hashes(parents, h, n, self.ngram)
        sigs = np.full((n, self.num_perm), _MAXH, dtype=np.uint64)
        if len(sh):
            nonempty = np.flatnonzero(np.diff(sh_starts) > 0)
            reduce_starts = sh_starts[nonempty]
            x = sh % _MERSENNE
            with np.errstate(over="ignore"):
                for p in range(self.num_perm):
                    v = (self.a[p] * x + self.b[p]) % _MERSENNE
                    sigs[nonempty, p] = np.minimum.reduceat(v, reduce_starts)
        offsets = np.arange(0, (n + 1) * self.num_perm, self.num_perm, dtype=np.int64)
        sig_col = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(sigs.reshape(-1).astype(np.int64) & 0x7FFFFFFFFFFFFFFF, type=pa.int64()),
        )
        return pa.table({self.id_col: batch[self.id_col], "sig": sig_col})


class BandRows:
    """map_batches transform: signatures → (doc_id, band, band_hash)."""

    def __init__(self, bands: int, rows_per_band: int, id_col: str = "doc_id"):
        self.bands = bands
        self.rows = rows_per_band
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig_col = batch["sig"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        num_perm = self.bands * self.rows
        sigs = np.asarray(sig_col.values, dtype=np.uint64).reshape(n, -1)[
            :, :num_perm
        ]
        mult = np.uint64(0x100000001B3)
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            # combine the r rows of each band
            for b in range(self.bands):
                acc = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
                for r in range(self.rows):
                    acc = (acc ^ sigs[:, b * self.rows + r]) * mult
                bh[:, b] = acc
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(doc_ids, self.bands), type=pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(
                    (bh.reshape(-1).astype(np.int64) & 0x7FFFFFFFFFFFFFFF),
                    type=pa.int64(),
                ),
            }
        )


from lsearch_ray.functions.cluster import (
    bucket_pairs_fn,
    drop_ids_from_pairs,
    filter_out_ids,
    gather_rows_for_ids,
    unique_pairs,
)


def minhash_candidate_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    ngram: int = 3,
    seed: int = 12345,
):
    """(signatures Dataset, deduped candidate-pair Dataset)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHashSignatures(num_perm, ngram, seed, text_col, id_col),
        batch_format="pyarrow",
    )
    band_rows = sigs.map_batches(
        BandRows(bands, rows_per_band, id_col), batch_format="pyarrow"
    )
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs_fn(id_col), batch_format="pandas"
    )
    return sigs, unique_pairs(pairs)


def estimated_jaccard(
    pairs_df, sig_lookup: dict[int, np.ndarray]
) -> np.ndarray:
    a = pairs_df["a"].to_numpy()
    b = pairs_df["b"].to_numpy()
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        sa, sb = sig_lookup[int(a[i])], sig_lookup[int(b[i])]
        out[i] = float((sa == sb).mean())
    return out


def _verify_pairs_distributed(
    pairs_ds, sigs_ds, threshold: float, id_col: str, num_partitions: int = 8
):
    """Distributed verify: hash-join each pair side to its signature, then
    compute the estimated Jaccard per row vectorized. Returns the verified
    (a, b) pair Dataset — nothing materializes on the driver."""
    from lsearch_ray.functions.joins import hash_join

    def sig_blob(b: pa.Table, key: str, sig_name: str) -> pa.Table:
        # Acero joins reject list payload columns → carry the signature as
        # a fixed-width binary blob (num_perm × 8 bytes)
        col = b["sig"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        vals = np.ascontiguousarray(np.asarray(col.values, dtype=np.int64))
        width = (len(vals) // n) * 8 if n else 0
        offs = np.arange(n + 1, dtype=np.int64) * width
        blob = pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [None, pa.py_buffer(offs), pa.py_buffer(vals.tobytes())],
        )
        return pa.table({key: b[id_col], sig_name: blob})

    sa = sigs_ds.map_batches(
        lambda b: sig_blob(b, "ja", "sig_a"), batch_format="pyarrow"
    )
    sb = sigs_ds.map_batches(
        lambda b: sig_blob(b, "jb", "sig_b"), batch_format="pyarrow"
    )
    joined = hash_join(
        hash_join(pairs_ds, sa, on="a", right_on="ja", num_partitions=num_partitions),
        sb,
        on="b",
        right_on="jb",
        num_partitions=num_partitions,
    )

    def blob_matrix(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset : col.offset + n + 1
        ]
        width = int(offs[1] - offs[0]) if n else 0
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        start = int(offs[0])
        flat = np.frombuffer(
            data[start : start + n * width].tobytes(), dtype=np.int64
        )
        return flat.reshape(n, width // 8)

    def verify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ma = blob_matrix(b["sig_a"])
        mb = blob_matrix(b["sig_b"])
        est = (ma == mb).mean(axis=1)
        keep = pa.array(est >= threshold)
        return pa.table({"a": b["a"], "b": b["b"]}).filter(keep)

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    ngram: int = 3,
    seed: int = 12345,
    driver_pair_limit: int = 2_000_000,
):
    """Near-dup dedup: survivors Dataset (min id per near-dup cluster).

    Two verify/cluster regimes, switched on candidate-pair volume:
    - pairs ≤ ``driver_pair_limit``: broadcast signature gather +
      driver-side union-find (fast path; banding keeps pairs ≪ corpus).
    - pairs above the limit (boilerplate-heavy corpora): fully
      distributed — hash-join pairs to signatures, vectorized estimate
      per row, min-label-propagation components
      (functions/components.py); the driver only holds the drop list.
    """
    sigs, pairs = minhash_candidate_pairs(
        ds,
        text_col=text_col,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        ngram=ngram,
        seed=seed,
    )
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs > driver_pair_limit:
        from lsearch_ray.functions.components import drop_ids_from_pairs_ds

        np_eff = max(1, min(8, n_pairs // 64 or 1))
        verified = _verify_pairs_distributed(
            pairs, sigs, threshold, id_col, num_partitions=np_eff
        )
        drop = drop_ids_from_pairs_ds(verified, num_partitions=np_eff)
        return filter_out_ids(ds, drop, id_col)
    pairs_df = pairs.to_pandas()
    if len(pairs_df) == 0:
        return ds
    cand_ids = np.unique(
        np.concatenate([pairs_df["a"].to_numpy(), pairs_df["b"].to_numpy()])
    )
    cand_set = pa.array(cand_ids, type=pa.int64())
    sig_rows = sigs.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=cand_set)),
        batch_format="pyarrow",
    ).take_all()
    lookup = {
        int(r[id_col]): np.asarray(r["sig"], dtype=np.int64) for r in sig_rows
    }
    est = estimated_jaccard(pairs_df, lookup)
    keep_pairs = pairs_df[est >= threshold]
    if len(keep_pairs) == 0:
        return ds
    drop = drop_ids_from_pairs(
        keep_pairs["a"].to_numpy(), keep_pairs["b"].to_numpy()
    )
    return filter_out_ids(ds, drop, id_col)


class ShingleSets:
    """map_batches transform: (id, text) → (id, shingles:list<int64>) with
    per-doc UNIQUE shingle hashes (for exact Jaccard)."""

    def __init__(self, ngram: int = 3, text_col: str = "text", id_col: str = "doc_id"):
        self.ngram = ngram
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parents, h = _token_hashes(batch[self.text_col])
        sh_starts, sh = _shingle_hashes(parents, h, n, self.ngram)
        uniq_lists: list[np.ndarray] = []
        for d in range(n):
            s, e = int(sh_starts[d]), int(sh_starts[d + 1])
            uniq_lists.append(
                np.unique(sh[s:e]).astype(np.int64) & 0x7FFFFFFFFFFFFFFF
            )
        offsets = np.concatenate(([0], np.cumsum([len(u) for u in uniq_lists])))
        values = (
            np.concatenate(uniq_lists) if uniq_lists else np.empty(0, np.int64)
        )
        col = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), pa.array(values, type=pa.int64())
        )
        return pa.table({self.id_col: batch[self.id_col], "shingles": col})


def ngram_jaccard_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    ngram: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 12345,
):
    """Near-dup dedup with EXACT n-gram Jaccard verification.

    Candidates come from MinHash banding (same recall), but each surviving
    pair is verified on the true shingle sets of the two docs (gathered by
    broadcast semi-join), not the signature estimate — zero false-positive
    merges at the cost of recomputing shingles for candidates only.
    """
    _, pairs = minhash_candidate_pairs(
        ds,
        text_col=text_col,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        ngram=ngram,
        seed=seed,
    )
    pairs_df = pairs.to_pandas()
    if len(pairs_df) == 0:
        return ds
    a, b = pairs_df["a"].to_numpy(), pairs_df["b"].to_numpy()
    cand_rows = (
        gather_rows_for_ids(ds, np.concatenate([a, b]), id_col)
        .map_batches(
            ShingleSets(ngram, text_col, id_col), batch_format="pyarrow"
        )
        .take_all()
    )
    sets = {int(r[id_col]): set(r["shingles"]) for r in cand_rows}
    keep_a, keep_b = [], []
    for x, y in zip(a, b):
        sa, sb = sets[int(x)], sets[int(y)]
        union = len(sa | sb)
        jac = (len(sa & sb) / union) if union else 1.0
        if jac >= threshold:
            keep_a.append(int(x))
            keep_b.append(int(y))
    if not keep_a:
        return ds
    drop = drop_ids_from_pairs(np.array(keep_a), np.array(keep_b))
    return filter_out_ids(ds, drop, id_col)
