"""Fixed-iteration Lloyd k-means over an embedding column.

Training-data pipelines cluster embeddings to bin documents by topic
(for mixture balancing) and to build IVF-style layouts. This is the
deterministic, oracle-checkable core: seedless init (the k lowest-id
vectors, in id order), a FIXED number of Lloyd iterations, and
fixed-point rounding of both distances and centroids so the DuckDB SQL
twin — the same iterations unrolled as CTEs — lands on bit-identical
assignments despite float summation-order differences between engines.

Ray-Data shape: every iteration is one streaming ``map_batches`` pass
emitting per-cluster partial (sum, count) rows — k tiny rows per batch,
so the driver-side reduce handles k × num_batches rows regardless of
corpus size. Assignment math is one vectorized (n, k, d) pass per batch
(k is small by construction). No shuffle anywhere: the only all-to-all
is the caller's optional final sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.ann import _stack_embeddings

_SCALE = 1e6  # fixed-point grid shared with the SQL oracle


def _round6(x: np.ndarray) -> np.ndarray:
    """Half-up to 6 dp — ``floor(x*1e6 + 0.5)/1e6``, the exact arithmetic
    the oracle uses; differences between engines of ~1e-12 from float
    summation order cannot move a value across this grid except on
    knife-edge inputs."""
    return np.floor(x * _SCALE + 0.5) / _SCALE


def _assign(m: np.ndarray, centroids: np.ndarray, alive: np.ndarray) -> np.ndarray:
    """Rounded squared-euclidean argmin; ties and dead clusters resolve
    to the lowest alive cluster index (numpy argmin = first minimum,
    matching the oracle's ``ORDER BY dist, cl``)."""
    diff = m[:, None, :] - centroids[None, :, :]
    dists = _round6(np.einsum("nkd,nkd->nk", diff, diff))
    dists[:, ~alive] = np.inf
    return np.argmin(dists, axis=1)


class _PartialSums:
    """map_batches combiner: per-cluster member-vector sums + counts."""

    def __init__(self, centroids: np.ndarray, alive: np.ndarray, emb_col: str):
        self.centroids = centroids
        self.alive = alive
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k, d = self.centroids.shape
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        m = _stack_embeddings(batch[self.emb_col]).astype(np.float64)
        if m.shape[0]:
            assign = _assign(m, self.centroids, self.alive)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(counts),
                "vec_sum": pa.array(list(sums), type=pa.list_(pa.float64())),
            }
        )


class _FinalAssign:
    def __init__(self, centroids, alive, id_col, emb_col):
        self.centroids = centroids
        self.alive = alive
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack_embeddings(batch[self.emb_col]).astype(np.float64)
        assign = (
            _assign(m, self.centroids, self.alive)
            if m.shape[0]
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "cluster": pa.array(assign, type=pa.int64()),
            }
        )


def kmeans_assign(
    emb_ds,
    k: int = 4,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Cluster embeddings with ``iters`` Lloyd iterations; returns a
    Dataset of ``(id_col, cluster)``.

    Init: the ``k`` lowest-id vectors in id order (cluster c = the c-th
    lowest id). Each iteration: rounded-distance assignment, then
    centroids = per-dim member means rounded to the shared fixed-point
    grid. A cluster that loses all members goes dead (dropped from the
    candidate set — the oracle's ``AVG`` simply yields no row for it).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    # seed pass without a shuffle: each batch contributes its k lowest-id
    # rows (a partial min-k combiner), the driver merges ≤ k × n_blocks
    # rows — a full distributed sort of every embedding would move the
    # whole dataset to pick k rows
    def seed_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # drop null ids BEFORE to_numpy: with nulls present the int64
        # column converts to float64 (NaN slots), which both admits a
        # None seed and collapses distinct ids above 2^53
        b = b.filter(pc.is_valid(b[id_col]))
        ids = b[id_col].to_numpy(zero_copy_only=False)
        pick = np.sort(np.argsort(ids, kind="stable")[:k])
        return b.select([id_col, emb_col]).take(pa.array(pick))

    seed_rows = sorted(
        emb_ds.map_batches(seed_partial, batch_format="pyarrow").take_all(),
        key=lambda r: r[id_col],
    )[:k]
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    centroids = np.array(
        [np.asarray(r[emb_col], dtype=np.float64) for r in seed_rows]
    )
    alive = np.ones(k, dtype=bool)
    for _ in range(iters):
        parts = emb_ds.map_batches(
            _PartialSums(centroids, alive, emb_col), batch_format="pyarrow"
        ).take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["vec_sum"], dtype=np.float64)
            counts[r["cluster"]] += r["n"]
        alive = counts > 0
        centroids = np.where(
            alive[:, None], _round6(sums / np.maximum(counts, 1)[:, None]), 0.0
        )
    return emb_ds.map_batches(
        _FinalAssign(centroids, alive, id_col, emb_col), batch_format="pyarrow"
    )
