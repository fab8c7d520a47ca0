"""SimHash (Charikar '02) near-duplicate detection.

``SimHash64``: per doc, each token occurrence votes ±1 on each of 64 bits
of its 64-bit token hash; the sign vector is the fingerprint. Vectorized:
64 bit-planes × ``np.add.reduceat`` over the flat token-hash stream — no
Python loop over docs.

``simhash_dedup``: candidate generation by splitting the 64-bit
fingerprint into 4 × 16-bit bands (pigeonhole: hamming distance ≤ 3 ⇒ at
least one band equal), groupby bucket → pairs → exact hamming-distance
verify → union-find survivors. Same shuffle/verify skeleton as MinHash
(functions/cluster.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.cluster import (
    apply_verified_pairs,
    attach_pair_payloads,
    bucket_pairs_ds,
    unique_pairs,
)
from lsearch_ray.functions.minhash import _pair_partitions, _token_hashes


class SimHash64:
    """map_batches transform: (id, text) → (id, simhash:int64)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parents, h = _token_hashes(batch[self.text_col])
        counts = (
            np.bincount(parents, minlength=n)
            if len(parents)
            else np.zeros(n, dtype=np.int64)
        )
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        fp = np.zeros(n, dtype=np.uint64)
        if len(h):
            nonempty = counts > 0
            rstarts = starts[nonempty]
            for bit in range(64):
                votes = (((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1)
                sums = np.add.reduceat(votes, rstarts) if len(rstarts) else []
                bits = (np.asarray(sums) > 0).astype(np.uint64) << np.uint64(bit)
                fp[nonempty] |= bits
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(
                    (fp & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a.astype(np.uint64) ^ b.astype(np.uint64)
    cnt = np.zeros(len(x), dtype=np.int64)
    while x.any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


class _SimhashBands:
    """(id, simhash) → 4 rows (id, band, band_hash of 16 bits)."""

    def __init__(self, id_col: str):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fp = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        bands = np.empty((n, 4), dtype=np.int64)
        for b in range(4):
            bands[:, b] = ((fp >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(ids, 4), type=pa.int64()),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_hash": pa.array(bands.reshape(-1), type=pa.int64()),
            }
        )


def simhash_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
):
    """Survivors Dataset after simhash near-dup removal.

    Note: 4×16 banding only guarantees recall for hamming ≤ 3 on the full
    64 bits; the top bit is masked for int64 storage, which is absorbed
    into the distance check.

    Fully distributed verify: the scalar fingerprint hash-joins onto each
    pair side (cluster.attach_pair_payloads — no blob needed for a scalar
    payload), exact hamming distance runs vectorized inside map tasks,
    and clustering + survivor filtering share the components/anti-join
    path with the other dedup variants.
    """
    fps = ds.map_batches(SimHash64(text_col, id_col), batch_format="pyarrow")
    band_rows = fps.map_batches(_SimhashBands(id_col), batch_format="pyarrow")
    pairs = unique_pairs(
        bucket_pairs_ds(band_rows, ["band", "band_hash"], id_col)
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds
    np_eff = _pair_partitions(n_pairs)
    joined = attach_pair_payloads(pairs, fps, id_col, num_partitions=np_eff)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        fa = b["simhash_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        fb = b["simhash_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hamming64(fa, fb) <= max_hamming
        return pa.table({"a": b["a"], "b": b["b"]}).filter(pa.array(keep))

    verified = joined.map_batches(verify, batch_format="pyarrow")
    return apply_verified_pairs(ds, verified, id_col, num_partitions=np_eff)
