"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exact baseline: per batch, one numpy
matmul against the broadcast query matrix, emitting a per-batch partial
top-k (combiner) so the final sort/limit shuffles only
``k × num_batches`` rows. The LSH-bucketed variant is the scale path
(functions/ann_lsh.py).
"""

from __future__ import annotations

import os

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
    n_clusters: int = 64,
    nprobe: int | None = None,
    ivf_dir: str | None = None,
):
    """Every row's top-k nearest neighbors by cosine (self excluded):
    the all-pairs similarity-search form (dedup candidate mining,
    retrieval eval). Returns (id, neighbor_id, rn ∈ [1,k], sim_micro).

    Brute-force baseline (≤ ``max_broadcast_rows``): the full
    (id, vector) table is broadcast once via ``ray.put``; each batch
    computes batch×all dots in ONE matmul and emits only its rows'
    top-k — k·N output rows, never an N² materialization.

    Beyond the cap the operator routes through the IVF layout
    (functions/ann_ivf.py) instead of raising: the corpus is
    materialized ONCE as cluster-partitioned Parquet, then an actor
    pool probes per batch, holding only per-cluster blocks in memory
    (LRU-capped) rather than the whole corpus. With ``nprobe=None``
    every cluster is visited — EXACT, identical ranks to the broadcast
    path (parity-tested); setting ``nprobe < n_clusters`` trades recall
    for probe cost like any IVF index.

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
    if emb_ds.count() > max_broadcast_rows:
        return _knn_join_ivf(
            emb_ds,
            id_col=id_col,
            emb_col=emb_col,
            k=k,
            n_clusters=n_clusters,
            nprobe=nprobe,
            ivf_dir=ivf_dir,
        )
    refs = emb_ds.select_columns([id_col, emb_col]).to_arrow_refs()
    full = pa.concat_tables(ray.get(refs), promote_options="permissive")
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


def _knn_empty(id_col: str) -> pa.Table:
    return pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
            "sim_micro": pa.array([], pa.int64()),
        }
    )


class _IvfKnnJoin:
    """Actor-pool stage for the beyond-broadcast-cap knn_join route:
    each actor lazily loads cluster partitions from the materialized IVF
    layout (LRU-capped cache — memory per actor is bounded by
    ``cache_clusters`` blocks, never the whole corpus) and merges
    per-cluster top-k candidates into each query row's exact top-k.

    Per-cluster rows are sorted by id at load so the cluster-local
    position doubles as the id-ascending tie-break; the final merge
    lexsorts candidates by (row, sim_micro desc, neighbor_id asc) —
    the exact ordering contract of the broadcast path."""

    def __init__(
        self,
        index_dir: str,
        *,
        kk: int,
        id_col: str,
        emb_col: str,
        nprobe: int | None,
        cache_clusters: int | None = None,
    ):
        import json

        self.index_dir = index_dir
        self.kk = kk
        self.id_col = id_col
        self.emb_col = emb_col
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.n_clusters = int(json.load(f)["n_clusters"])
        self.nprobe = (
            self.n_clusters if nprobe is None else min(nprobe, self.n_clusters)
        )
        if cache_clusters is None:
            # the exact sweep (nprobe == n_clusters) visits every cluster
            # per batch in a cycle — any cache smaller than the cycle is a
            # 100% miss rate and re-reads the whole corpus per batch, so
            # it must hold them all (memory ≈ corpus per actor: the price
            # of exactness beyond the broadcast cap; real deployments set
            # nprobe). Probed mode keeps 2×nprobe for batch-to-batch reuse.
            cache_clusters = (
                self.n_clusters
                if self.nprobe >= self.n_clusters
                else min(self.n_clusters, max(16, 2 * self.nprobe))
            )
        self.cache_clusters = cache_clusters
        self._cache: dict[int, tuple] = {}  # insertion-ordered (LRU)

    def _cluster(self, c: int):
        import glob

        import pyarrow.parquet as pq

        hit = self._cache.pop(c, None)
        if hit is None:
            files = sorted(
                glob.glob(os.path.join(self.index_dir, f"cluster={c}", "*.parquet"))
            )
            if not files:
                hit = (np.empty(0, np.int64), np.empty((0, 0)), np.empty(0))
            else:
                t = pq.read_table(files, columns=[self.id_col, self.emb_col])
                ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                m = _stack_embeddings(t[self.emb_col]).astype(np.float64)
                order = np.argsort(ids, kind="mergesort")
                ids, m = ids[order], m[order]
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0] = 1.0
                hit = (ids, m, norms)
        self._cache[c] = hit  # re-insert: most recently used
        while len(self._cache) > self.cache_clusters:
            self._cache.pop(next(iter(self._cache)))
        return hit

    def __call__(self, b: pa.Table) -> pa.Table:
        mb = _stack_embeddings(b[self.emb_col]).astype(np.float64)
        nb = b.num_rows
        if nb == 0 or self.kk == 0:
            return _knn_empty(self.id_col)
        bids = b[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bnorms = np.linalg.norm(mb, axis=1)
        bnorms[bnorms == 0] = 1.0
        if self.nprobe >= self.n_clusters:
            visit = {c: np.arange(nb) for c in range(self.n_clusters)}
        else:
            cen = (mb / bnorms[:, None]) @ self.centroids.T
            probes = np.argpartition(-cen, self.nprobe - 1, axis=1)[
                :, : self.nprobe
            ]
            visit = {
                int(c): np.nonzero((probes == c).any(axis=1))[0]
                for c in np.unique(probes)
            }
        cand_row, cand_nid, cand_sim = [], [], []
        for c, rows in visit.items():
            ids_c, m_c, norms_c = self._cluster(c)
            n_c = len(ids_c)
            if n_c == 0 or len(rows) == 0:
                continue
            sims = (mb[rows] @ m_c.T) / (bnorms[rows, None] * norms_c[None, :])
            sm = np.floor(sims * 1e6 + 0.5).astype(np.int64)
            # per-cluster prune: top (kk+1) by (sim desc, local pos asc);
            # +1 leaves room for the self row, dropped at the merge
            take = min(self.kk + 1, n_c)
            if n_c > take:
                key = -sm * np.int64(n_c + 1) + np.arange(n_c)[None, :]
                picks = np.argpartition(key, take - 1, axis=1)[:, :take]
            else:
                picks = np.broadcast_to(np.arange(n_c), (len(rows), n_c))
            cand_row.append(np.repeat(rows, picks.shape[1]))
            cand_nid.append(ids_c[picks].ravel())
            cand_sim.append(np.take_along_axis(sm, picks, axis=1).ravel())
        if not cand_row:
            return _knn_empty(self.id_col)
        row = np.concatenate(cand_row)
        nid = np.concatenate(cand_nid)
        sim = np.concatenate(cand_sim)
        not_self = nid != bids[row]
        row, nid, sim = row[not_self], nid[not_self], sim[not_self]
        order = np.lexsort((nid, -sim, row))
        row, nid, sim = row[order], nid[order], sim[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(row)) + 1]
        ) if len(row) else np.empty(0, np.int64)
        counts = np.diff(np.concatenate([starts, [len(row)]]))
        rank = np.arange(len(row)) - np.repeat(starts, counts)
        keep = rank < self.kk
        return pa.table(
            {
                self.id_col: pa.array(bids[row[keep]]),
                "neighbor_id": pa.array(nid[keep]),
                "rn": pa.array(rank[keep] + 1),
                "sim_micro": pa.array(sim[keep]),
            }
        )


def _knn_join_ivf(
    emb_ds,
    *,
    id_col: str,
    emb_col: str,
    k: int,
    n_clusters: int,
    nprobe: int | None,
    ivf_dir: str | None,
    concurrency: int = 4,
):
    """knn_join's beyond-broadcast-cap route: materialize the IVF layout
    once (cluster-partitioned Parquet), then probe per batch with an
    actor pool whose memory is bounded by its cluster cache — the scale
    path the broadcast cap documents. ``nprobe=None`` visits every
    cluster (exact, rank-identical to the broadcast path)."""
    import tempfile

    from lsearch_ray.functions.ann_ivf import build_ivf_index

    n_total = emb_ds.count()
    kk = min(k, max(n_total - 1, 0))
    # a UNIQUE dir per call: the result Dataset is lazy, so a second
    # over-cap knn_join in the same process must not rebuild over the
    # first call's layout (actors would silently probe the wrong
    # corpus). The layout is left on disk until the caller removes it —
    # pass ivf_dir to control placement/cleanup.
    index_dir = ivf_dir or tempfile.mkdtemp(prefix="lsr_knn_ivf_")
    build_ivf_index(
        emb_ds.select_columns([id_col, emb_col]),
        index_dir,
        n_clusters=n_clusters,
        emb_col=emb_col,
    )
    return emb_ds.map_batches(
        _IvfKnnJoin,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "kk": kk,
            "id_col": id_col,
            "emb_col": emb_col,
            "nprobe": nprobe,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def int8_dequantized_batch(
    batch: pa.Table, emb_col: str = "embedding"
) -> pa.Table:
    """Symmetric per-vector int8 scalar quantization, immediately
    dequantized (the storage transform of a 4×-smaller vector index,
    surfaced as its effect on similarities): scale = max|x_i|,
    q_i = floor(x_i·127/scale + 0.5) — round-half-up spelled as
    floor(x+0.5) so DuckDB replays it bit-identically — and
    x̂_i = q_i·scale/127. All-zero vectors stay zero. Pure map-side
    numpy over the flattened list buffer."""
    col = batch[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    offs = np.asarray(col.offsets, dtype=np.int64)
    flat = np.asarray(col.values, dtype=np.float64)
    widths = np.diff(offs)
    if n and (widths != widths[0]).any():
        raise ValueError("int8 quantization expects fixed-dim embeddings")
    d = int(widths[0]) if n else 0
    V = flat.reshape(n, d) if n else flat.reshape(0, 0)
    scale = np.abs(V).max(axis=1) if d else np.zeros(n)
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.floor(V * 127.0 / safe[:, None] + 0.5)
    dq = q * safe[:, None] / 127.0
    dq[scale == 0.0] = 0.0
    values = pa.array(dq.ravel(), type=pa.float64())
    if pa.types.is_large_list(col.type):
        out = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()), values
        )
    else:
        out = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), values
        )
    return batch.set_column(
        batch.schema.get_field_index(emb_col), emb_col, out
    )


def int8_cosine_topk(
    emb_ds,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = 4,
) -> pa.Table:
    """Exact cosine top-k over int8-quantized-then-dequantized vectors
    (query quantized the same way) — measures what the 4× memory
    saving of a scalar-quantized index does to the ranking. Same plan
    as :func:`cosine_topk`: per-batch matmul partials, k-row merge."""
    qt = pa.table(
        {"embedding": pa.array([query.tolist()], pa.list_(pa.float64()))}
    )
    dq_query = np.array(
        int8_dequantized_batch(qt)["embedding"][0].as_py(), dtype=np.float64
    )
    dq = emb_ds.map_batches(
        lambda b: int8_dequantized_batch(b, emb_col), batch_format="pyarrow"
    )
    return cosine_topk(
        dq, dq_query, k=k, id_col=id_col, emb_col=emb_col, round_to=round_to
    )
