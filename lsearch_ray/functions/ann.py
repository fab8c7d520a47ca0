"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exact baseline: per batch, one numpy
matmul against the broadcast query matrix, emitting a per-batch partial
top-k (combiner) so the final sort/limit shuffles only
``k × num_batches`` rows. The LSH-bucketed variant is the scale path
(functions/ann_lsh.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _stack_embeddings(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float32 matrix, zero-copy from the
    Arrow values buffer when lists are equal-length."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = np.asarray(col.values)
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.empty((0, 0), dtype=np.float32)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("embedding lists must be equal-length")
    start = int(offsets[0])
    return values[start : start + len(widths) * d].reshape(len(widths), d)


class _PartialCosineTopK:
    """map_batches combiner: per-batch top-k cosine sims vs the query."""

    def __init__(self, query: np.ndarray, k: int, id_col: str, emb_col: str):
        q = np.asarray(query, dtype=np.float64)
        self.q = q / np.linalg.norm(q)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack_embeddings(batch[self.emb_col]).astype(np.float64)
        if m.shape[0] == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ self.q) / norms
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(sims) > self.k:
            part = np.argpartition(-sims, self.k)[: self.k]
            sims, ids = sims[part], ids[part]
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "sim": pa.array(sims, type=pa.float64()),
            }
        )


def cosine_topk(
    emb_ds,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = 4,
) -> pa.Table:
    """Exact cosine top-k: batch matmul partials → tiny global merge."""
    partials = emb_ds.map_batches(
        _PartialCosineTopK(query, k, id_col, emb_col), batch_format="pyarrow"
    )
    top = (
        partials.sort(["sim", id_col], descending=[True, False]).limit(k).to_pandas()
    )
    sims = top["sim"].round(round_to) if round_to is not None else top["sim"]
    return pa.table(
        {
            id_col: pa.array(top[id_col], type=pa.int64()),
            "sim": pa.array(sims, type=pa.float64()),
        }
    )
