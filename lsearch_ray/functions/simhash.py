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
    bucket_pairs_fn,
    drop_ids_from_pairs,
    filter_out_ids,
    unique_pairs,
)
from lsearch_ray.functions.minhash import _token_hashes


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
    """
    fps = ds.map_batches(SimHash64(text_col, id_col), batch_format="pyarrow")
    band_rows = fps.map_batches(_SimhashBands(id_col), batch_format="pyarrow")
    pairs = unique_pairs(
        band_rows.groupby(["band", "band_hash"]).map_groups(
            bucket_pairs_fn(id_col), batch_format="pandas"
        )
    ).to_pandas()
    if len(pairs) == 0:
        return ds
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    from lsearch_ray.functions.cluster import gather_rows_for_ids

    cand = gather_rows_for_ids(fps, np.concatenate([a, b]), id_col).take_all()
    lookup = {int(r[id_col]): int(r["simhash"]) for r in cand}
    fa = np.array([lookup[int(x)] for x in a], dtype=np.int64)
    fb = np.array([lookup[int(x)] for x in b], dtype=np.int64)
    dist = hamming64(fa, fb)
    keep = dist <= max_hamming
    if not keep.any():
        return ds
    drop = drop_ids_from_pairs(a[keep], b[keep])
    return filter_out_ids(ds, drop, id_col)
