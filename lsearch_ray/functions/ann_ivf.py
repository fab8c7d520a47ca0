"""IVF (inverted-file) approximate nearest neighbor over embeddings.

The coarse-quantizer scale path complementing LSH (ann_lsh.py):

1. :func:`train_centroids` — seeded k-means on a driver-side sample
   (spherical: centroids L2-normalized each iteration, so assignment by
   max dot product == max cosine).
2. :class:`AssignClusters` — map_batches appending ``cluster:int32``
   (one matmul per batch against the broadcast centroid matrix).
3. :func:`ivf_cosine_topk` — query: rank centroids by cosine to the
   query, probe the top ``nprobe`` clusters (broadcast membership filter,
   no shuffle), exact cosine on the surviving fraction.

At scale the assigned dataset is written partitioned by cluster
(``write_parquet(partition_cols=["cluster"])``) so probing reads only the
probed partitions; here the filter-pushdown form keeps the test path
simple while the layout note documents the storage contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.ann import _stack_embeddings, cosine_topk


def train_centroids(
    emb_ds,
    n_clusters: int = 16,
    *,
    emb_col: str = "embedding",
    sample_limit: int = 20_000,
    n_iter: int = 10,
    seed: int = 1234,
) -> np.ndarray:
    """Seeded spherical k-means on a bounded sample. Returns (k, d)."""
    sample = emb_ds.limit(sample_limit).take_all()
    m = np.asarray([r[emb_col] for r in sample], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m = m / norms
    rng = np.random.RandomState(seed)
    k = min(n_clusters, len(m))
    centroids = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(n_iter):
        assign = (m @ centroids.T).argmax(axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n:
                    centroids[c] = v / n
    return centroids


class AssignClusters:
    """map_batches transform appending ``cluster:int32``."""

    def __init__(self, centroids: np.ndarray, emb_col: str = "embedding"):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack_embeddings(batch[self.emb_col]).astype(np.float64)
        if m.shape[0] == 0:
            return batch.append_column("cluster", pa.array([], type=pa.int32()))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        assign = ((m / norms) @ self.centroids.T).argmax(axis=1)
        return batch.append_column(
            "cluster", pa.array(assign.astype(np.int32), type=pa.int32())
        )


def ivf_cosine_topk(
    emb_ds,
    query: np.ndarray,
    k: int = 10,
    *,
    centroids: np.ndarray | None = None,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 1234,
    round_to: int | None = 4,
) -> pa.Table:
    """Approximate cosine top-k probing the ``nprobe`` nearest clusters."""
    if centroids is None:
        centroids = train_centroids(
            emb_ds, n_clusters, emb_col=emb_col, seed=seed
        )
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(centroids @ qn))[:nprobe].astype(np.int32)
    probe_arr = pa.array(probe, type=pa.int32())
    assigned = emb_ds.map_batches(
        AssignClusters(centroids, emb_col), batch_format="pyarrow"
    )
    candidates = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["cluster"], value_set=probe_arr)),
        batch_format="pyarrow",
    )
    return cosine_topk(
        candidates, q, k, id_col=id_col, emb_col=emb_col, round_to=round_to
    )
