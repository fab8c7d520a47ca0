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


def knn_join(
    emb_ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    max_broadcast_rows: int = 2_000_000,
):
    """Every row's top-k nearest neighbors by cosine (self excluded):
    the all-pairs similarity-search form (dedup candidate mining,
    retrieval eval). Returns (id, neighbor_id, rn ∈ [1,k], sim_micro).

    Brute-force baseline: the full (id, vector) table is broadcast once
    via ``ray.put`` (capped — beyond the cap use the IVF layout in
    functions/ann_ivf.py as the scale path and probe per batch); each
    batch computes batch×all dots in ONE matmul and emits only its rows'
    top-k — k·N output rows, never an N² materialization.

    Similarity is fixed-point ``floor(cos·1e6 + 0.5)`` (the kmeans
    rounding contract: engines' summation orders differ at ~1e-16, which
    cannot move a value across the 5e-7 grid except on an exact
    boundary), ranked by (sim_micro desc, neighbor_id asc) so the rank
    is integer-deterministic. Zero-norm vectors get sim 0 everywhere.
    """
    import ray

    # materialize ONCE: the same blocks feed both the broadcast gather
    # and the per-batch probe below (no second read of the input)
    emb_ds = emb_ds.materialize()
    refs = emb_ds.select_columns([id_col, emb_col]).to_arrow_refs()
    full = pa.concat_tables(ray.get(refs), promote_options="permissive")
    if full.num_rows > max_broadcast_rows:
        raise ValueError(
            f"knn_join: {full.num_rows} rows exceeds the broadcast cap "
            f"({max_broadcast_rows}); use the IVF probe path"
        )
    all_ids = full[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    all_m = _stack_embeddings(full[emb_col]).astype(np.float64)
    all_norms = np.linalg.norm(all_m, axis=1)
    all_norms[all_norms == 0] = 1.0
    n_all = len(all_ids)
    shared = ray.put((all_ids, all_m, all_norms))
    del full, all_m, all_norms  # plasma holds the only copy now
    kk = min(k, max(n_all - 1, 0))

    def topk_batch(b: pa.Table) -> pa.Table:
        ids_all, m_all, norms_all = ray.get(shared)
        mb = _stack_embeddings(b[emb_col]).astype(np.float64)
        nb = b.num_rows
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rn": pa.array([], pa.int64()),
                "sim_micro": pa.array([], pa.int64()),
            }
        )
        if nb == 0 or kk == 0:
            return empty
        bnorms = np.linalg.norm(mb, axis=1)
        bnorms[bnorms == 0] = 1.0
        sims = (mb @ m_all.T) / (bnorms[:, None] * norms_all[None, :])
        sim_micro = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        bids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        self_mask = bids[:, None] == ids_all[None, :]
        # composite integer key: sim desc, then the neighbor's position
        # in the id-sorted order asc — exact, no float comparator
        id_order = np.argsort(ids_all, kind="mergesort")
        pos_of = np.empty(len(ids_all), dtype=np.int64)
        pos_of[id_order] = np.arange(len(ids_all))
        key = -sim_micro * np.int64(n_all + 1) + pos_of[None, :]
        key[self_mask] = np.iinfo(np.int64).max  # self always last
        picks = np.argsort(key, axis=1, kind="stable")[:, :kk]
        return pa.table(
            {
                id_col: pa.array(np.repeat(bids, kk)),
                "neighbor_id": pa.array(ids_all[picks].ravel()),
                "rn": pa.array(
                    np.tile(np.arange(1, kk + 1, dtype=np.int64), nb)
                ),
                "sim_micro": pa.array(
                    np.take_along_axis(sim_micro, picks, axis=1).ravel()
                ),
            }
        )

    return emb_ds.map_batches(topk_batch, batch_format="pyarrow")
