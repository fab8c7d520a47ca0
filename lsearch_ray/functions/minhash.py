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
   computed by hash-joining each pair side to its signature blob
   (cluster.attach_pair_payloads) — distributed, vectorized per batch.
5. Clustering: distributed min-label-propagation connected components
   (functions/components.py); the drop set applies as a broadcast filter
   when small, a distributed anti-join when large
   (cluster.filter_out_ids_ds). Nothing pair-shaped touches the driver.

``minhash_dedup`` returns the survivor Dataset (min doc_id per cluster
kept), same schema as the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import flat_tokens_arrow

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mulmod_mersenne61(a, x: np.ndarray) -> np.ndarray:
    """Exact ``(a*x) mod (2^61-1)`` in uint64 lanes (no 128-bit ints).

    Operands are < 2^61; split into 32-bit halves, the 128-bit product's
    partial terms fold with 2^64 ≡ 8 and 2^61 ≡ 1 (mod p), each kept
    below 2^63, then one exact final modulo. This makes
    ``h(x) = (a·x + b) mod p`` genuinely universal — a plain wrapping
    uint64 product before the mod (the previous form) loses the high
    product bits and slightly biases the min-hash estimator.
    """
    p = _MERSENNE
    m32 = np.uint64(0xFFFFFFFF)
    a_hi, a_lo = a >> np.uint64(32), a & m32
    x_hi, x_lo = x >> np.uint64(32), x & m32
    with np.errstate(over="ignore"):
        lo = (a_lo * x_lo) % p
        hi = ((a_hi * x_hi) << np.uint64(3)) % p  # ·2^64 ≡ ·8 (mod p)
        mid = (a_hi * x_lo + a_lo * x_hi) % p  # each term < 2^61
        # mid·2^32 (mod p): mid = m_hi·2^29 + m_lo → m_hi·2^61 + m_lo·2^32
        # ≡ m_hi + m_lo·2^32, both addends < 2^61
        mid = (
            (mid >> np.uint64(29))
            + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
        ) % p
        return (lo + hi + mid) % p


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
        # universal hashing h_p(x) = (a_p * x + b_p) mod (2^61-1), the
        # product computed exactly via _mulmod_mersenne61
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
                    v = (_mulmod_mersenne61(self.a[p], x) + self.b[p]) % _MERSENNE
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
    apply_verified_pairs,
    attach_pair_payloads,
    blob_lists,
    bucket_pairs_ds,
    fixed_blob_matrix,
    list_to_blob,
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
    pairs = bucket_pairs_ds(band_rows, ["band", "band_hash"], id_col)
    return sigs, unique_pairs(pairs)


def _verify_pairs_distributed(
    pairs_ds, sigs_ds, threshold: float, id_col: str, num_partitions: int = 8
):
    """Distributed verify: hash-join each pair side to its signature blob
    (cluster.attach_pair_payloads), then compute the estimated Jaccard per
    row vectorized. Returns the verified (a, b) pair Dataset — nothing
    materializes on the driver."""
    blobs = sigs_ds.map_batches(
        lambda b: pa.table({id_col: b[id_col], "sig": list_to_blob(b["sig"])}),
        batch_format="pyarrow",
    )
    joined = attach_pair_payloads(
        pairs_ds, blobs, id_col, num_partitions=num_partitions
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ma = fixed_blob_matrix(b["sig_a"])
        mb = fixed_blob_matrix(b["sig_b"])
        est = (ma == mb).mean(axis=1)
        keep = pa.array(est >= threshold)
        return pa.table({"a": b["a"], "b": b["b"]}).filter(keep)

    return joined.map_batches(verify, batch_format="pyarrow")


def _pair_partitions(n_pairs: int, cap: int = 8) -> int:
    """Hash-join partition count for a pair volume — delegates to the
    shared :func:`joins.safe_partitions` rule (≥64 rows per partition,
    bounded by the live cpu count)."""
    from lsearch_ray.functions.joins import safe_partitions

    return safe_partitions(cap, n_pairs)


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
    broadcast_limit: int = 2_000_000,
):
    """Near-dup dedup: survivors Dataset (min id per near-dup cluster).

    Fully distributed end-to-end: hash-join pairs to signature blobs,
    vectorized Jaccard estimate per row, min-label-propagation components
    (functions/components.py). The only driver-side artifact is the drop
    set, and only while it is below ``broadcast_limit`` — above that the
    drop is a distributed anti-join (cluster.filter_out_ids_ds)."""
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
    if n_pairs == 0:
        return ds
    np_eff = _pair_partitions(n_pairs)
    verified = _verify_pairs_distributed(
        pairs, sigs, threshold, id_col, num_partitions=np_eff
    )
    return apply_verified_pairs(
        ds,
        verified,
        id_col,
        num_partitions=np_eff,
        broadcast_limit=broadcast_limit,
    )


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


def ngram_jaccard_pairs(
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
    """Exact-verified near-dup pair stage shared by
    :func:`ngram_jaccard_dedup` and the duplicate-component labeling
    query: MinHash-banded candidates, each verified on the true shingle
    sets. Returns a materialized ``(a, b)`` Dataset (possibly empty)."""
    import ray.data as rd

    _, pairs = minhash_candidate_pairs(
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
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        )
    np_eff = _pair_partitions(n_pairs)
    shingle_blobs = ds.map_batches(
        ShingleSets(ngram, text_col, id_col), batch_format="pyarrow"
    ).map_batches(
        lambda b: pa.table(
            {id_col: b[id_col], "sh": list_to_blob(b["shingles"])}
        ),
        batch_format="pyarrow",
    )
    joined = attach_pair_payloads(
        pairs, shingle_blobs, id_col, num_partitions=np_eff
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        offs_a, flat_a = blob_lists(b["sh_a"])
        offs_b, flat_b = blob_lists(b["sh_b"])
        keep = np.zeros(b.num_rows, dtype=bool)
        for i in range(b.num_rows):
            sa = flat_a[offs_a[i] : offs_a[i + 1]]
            sb = flat_b[offs_b[i] : offs_b[i + 1]]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            # empty∩empty is NOT a match: the SQL twins' shingle CTEs
            # emit no rows for 0-token docs, so they can never pair —
            # mirror that (Jaccard of two empty sets is undefined anyway)
            jac = (inter / union) if union else 0.0
            keep[i] = jac >= threshold
        return pa.table({"a": b["a"], "b": b["b"]}).filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow").materialize()


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
    pair is verified on the true shingle sets of the two docs — zero
    false-positive merges at the cost of recomputing shingles for
    candidates only. Fully distributed: shingle sets travel to the pair
    rows as sorted-unique int64 blobs through hash joins
    (cluster.attach_pair_payloads); the per-pair set intersection runs
    inside map tasks (sorted-array ``np.intersect1d``), clustering and
    survivor filtering through the same components/anti-join path as
    minhash_dedup."""
    verified = ngram_jaccard_pairs(
        ds,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        ngram=ngram,
        num_perm=num_perm,
        bands=bands,
        seed=seed,
    )
    n_pairs = verified.count()
    if n_pairs == 0:
        return ds
    return apply_verified_pairs(
        ds, verified, id_col, num_partitions=_pair_partitions(n_pairs)
    )


def fuzzy_decontaminate(
    corpus_ds,
    bench_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    ngram: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 12345,
    max_bench_ids: int = 10_000_000,
):
    """Cross-table fuzzy benchmark decontamination: ids of corpus docs
    whose EXACT n-gram Jaccard against ANY benchmark doc reaches
    ``threshold`` (the near-dup companion to the exact-gram
    ``decontaminate_ds`` — catches lightly edited eval contamination
    that exact 8-gram matching misses).

    Same skeleton as :func:`ngram_jaccard_dedup`, restricted to
    cross-table pairs: MinHash banding over the UNION generates
    candidates; bench ids (eval suites are tiny next to a corpus — the
    cap guards the assumption) are broadcast to keep only corpus×bench
    pairs; each survivor is exact-verified on true shingle-set blobs
    through hash joins; output is the distinct flagged corpus id column.

    Corpus and bench id spaces must be disjoint. Caveat shared with the
    banding generator: an over-cap LSH bucket (≥64 near-identical docs)
    emits pairs only against its minimum id, so a contaminated doc whose
    every shared bucket is over cap can be missed — raise
    ``bucket_pairs_ds``'s cap for strict audit runs.
    """
    from lsearch_ray.functions.dedup import exact_dedup

    bench_id_rows = bench_ds.select_columns([id_col]).take(max_bench_ids + 1)
    if len(bench_id_rows) > max_bench_ids:
        raise ValueError(
            f"fuzzy_decontaminate: more than {max_bench_ids} benchmark "
            "ids; that is not an eval suite"
        )
    if not bench_id_rows:
        return corpus_ds.select_columns([id_col]).map_batches(
            lambda b: b.slice(0, 0), batch_format="pyarrow"
        )
    bench_ids = pa.array(
        sorted(r[id_col] for r in bench_id_rows), type=pa.int64()
    )

    cols = [id_col, text_col]
    union = corpus_ds.select_columns(cols).union(bench_ds.select_columns(cols))
    _, pairs = minhash_candidate_pairs(
        union,
        text_col=text_col,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        ngram=ngram,
        seed=seed,
    )

    def cross_only(b: pa.Table) -> pa.Table:
        in_a = np.asarray(pc.is_in(b["a"], value_set=bench_ids))
        in_b = np.asarray(pc.is_in(b["b"], value_set=bench_ids))
        keep = in_a != in_b  # exactly one endpoint is a benchmark doc
        t = b.filter(pa.array(keep))
        # normalize: a = corpus id, b = bench id
        swap = np.asarray(pc.is_in(t["a"], value_set=bench_ids))
        a = np.asarray(t["a"]).copy()
        bcol = np.asarray(t["b"]).copy()
        a[swap], bcol[swap] = np.asarray(t["b"])[swap], np.asarray(t["a"])[swap]
        return pa.table({"a": pa.array(a), "b": pa.array(bcol)})

    pairs = pairs.map_batches(cross_only, batch_format="pyarrow").materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return corpus_ds.select_columns([id_col]).map_batches(
            lambda b: b.slice(0, 0), batch_format="pyarrow"
        )
    np_eff = _pair_partitions(n_pairs)
    shingle_blobs = union.map_batches(
        ShingleSets(ngram, text_col, id_col), batch_format="pyarrow"
    ).map_batches(
        lambda b: pa.table({id_col: b[id_col], "sh": list_to_blob(b["shingles"])}),
        batch_format="pyarrow",
    )
    joined = attach_pair_payloads(pairs, shingle_blobs, id_col, num_partitions=np_eff)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        offs_a, flat_a = blob_lists(b["sh_a"])
        offs_b, flat_b = blob_lists(b["sh_b"])
        keep = np.zeros(b.num_rows, dtype=bool)
        for i in range(b.num_rows):
            sa = flat_a[offs_a[i] : offs_a[i + 1]]
            sb = flat_b[offs_b[i] : offs_b[i + 1]]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union_n = len(sa) + len(sb) - inter
            # empty∩empty never flags — parity with the SQL twin, which
            # emits no shingle rows for 0-token docs
            jac = (inter / union_n) if union_n else 0.0
            keep[i] = jac >= threshold
        return pa.table({id_col: b["a"]}).filter(pa.array(keep))

    flagged = joined.map_batches(verify, batch_format="pyarrow")
    # a corpus doc may match several bench docs — distinct ids out
    return exact_dedup(flagged, [id_col], [id_col], num_partitions=np_eff)


def exact_jaccard_pairs_ds(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    ngram: int = 3,
    num_partitions: int = 32,
    max_df: int | None = None,
):
    """COMPLETE exact n-gram Jaccard ≥ threshold pairs — the ground
    truth the banded stages approximate. Candidates come from the
    shared-shingle shuffle (``containment.shared_shingle_candidates_ds``
    — any pair with J > 0 shares a shingle, so ``max_df=None`` is
    complete by construction, not probabilistically); verification is
    the exact sorted-set intersection on blob-joined shingle sets.
    Shingle identity matches MinHash's (3-gram rolling hash, short-doc
    fold), so this is the exact counterpart of the banding candidates.

    Scale note: per-shingle pair fan-out is df·(df−1)/2 — at corpus
    scale a production caller sets ``max_df`` (an over-cap shingle is
    boilerplate), explicitly narrowing the truth definition; the
    uncapped default is the evaluation-harness / oracle-parity form.
    """
    import ray.data as rd

    from lsearch_ray.functions.cluster import (
        attach_pair_payloads,
        blob_lists,
        list_to_blob,
    )
    from lsearch_ray.functions.containment import (
        shared_shingle_candidates_ds,
    )

    sets = ShingleSets(ngram, text_col, id_col)

    def lists_fn(b: pa.Table):
        t = sets(b)
        offs, flat = blob_lists(list_to_blob(t["shingles"]))
        return [
            flat[offs[i] : offs[i + 1]] for i in range(t.num_rows)
        ]

    cand = shared_shingle_candidates_ds(
        ds,
        lists_fn,
        id_col=id_col,
        num_partitions=num_partitions,
        max_df=max_df,
    )
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    n_pairs = cand.count()
    if n_pairs == 0:
        return rd.from_arrow(empty)

    shingle_blobs = ds.map_batches(
        sets, batch_format="pyarrow"
    ).map_batches(
        lambda b: pa.table(
            {id_col: b[id_col], "sh": list_to_blob(b["shingles"])}
        ),
        batch_format="pyarrow",
    )
    joined = attach_pair_payloads(
        cand, shingle_blobs, id_col, num_partitions=_pair_partitions(n_pairs)
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        offs_a, flat_a = blob_lists(b["sh_a"])
        offs_b, flat_b = blob_lists(b["sh_b"])
        keep = np.zeros(b.num_rows, dtype=bool)
        for i in range(b.num_rows):
            sa = flat_a[offs_a[i] : offs_a[i + 1]]
            sb = flat_b[offs_b[i] : offs_b[i + 1]]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            keep[i] = union > 0 and (inter / union) >= threshold
        return pa.table({"a": b["a"], "b": b["b"]}).filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow").materialize()


def dedup_recall_table(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    ngram: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 12345,
    num_partitions: int = 16,
):
    """Dedup-candidate evaluation harness (the near-dup counterpart of
    ``ann_lsh.ann_recall_table``): recall and precision of the MinHash
    banding candidate stage against the COMPLETE exact-Jaccard truth
    (:func:`exact_jaccard_pairs_ds`). One row:

    (n_true, n_cand, n_hit, recall_micro, precision_micro)

    with the micro ratios as exact integer floor division and the
    empty-denominator convention 10⁶ (nothing to find / nothing
    proposed = perfect). Hit counting is distributed: both pair sets
    are tagged, hash-partitioned on the pair key, and intersected
    per-partition — only the ≤-partition-count partial sums reach the
    driver.
    """
    import pandas as pd
    import ray.data as rd

    from lsearch_ray.functions.dedup import partition_ids

    truth = exact_jaccard_pairs_ds(
        ds,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        ngram=ngram,
    )
    _, cand = minhash_candidate_pairs(
        ds,
        text_col=text_col,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        ngram=ngram,
        seed=seed,
    )
    cand = cand.materialize()
    n_true, n_cand = truth.count(), cand.count()

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            out = pa.table(
                {
                    "a": t["a"].cast(pa.int64()),
                    "b": t["b"].cast(pa.int64()),
                    "side": pa.array(
                        np.full(t.num_rows, side, dtype=np.int64)
                    ),
                }
            )
            return out.append_column(
                "__part",
                pa.array(partition_ids(out, ["a", "b"], num_partitions)),
            )

        return f

    def hits_partial(g: pd.DataFrame) -> pa.Table:
        both = (
            g.groupby(["a", "b"])["side"].nunique() == 2
        ).sum()
        return pa.table({"n_hit": pa.array([int(both)], pa.int64())})

    n_hit = 0
    if n_true and n_cand:
        partials = (
            truth.map_batches(tag(0), batch_format="pyarrow")
            .union(cand.map_batches(tag(1), batch_format="pyarrow"))
            .groupby("__part")
            .map_groups(hits_partial, batch_format="pandas")
            .take_all()
        )  # <= num_partitions rows
        n_hit = sum(int(r["n_hit"]) for r in partials)

    def micro(num: int, den: int) -> int:
        return (num * 1_000_000) // den if den else 1_000_000

    return rd.from_arrow(
        pa.table(
            {
                "n_true": pa.array([n_true], pa.int64()),
                "n_cand": pa.array([n_cand], pa.int64()),
                "n_hit": pa.array([n_hit], pa.int64()),
                "recall_micro": pa.array([micro(n_hit, n_true)], pa.int64()),
                "precision_micro": pa.array(
                    [micro(n_hit, n_cand)], pa.int64()
                ),
            }
        )
    )
