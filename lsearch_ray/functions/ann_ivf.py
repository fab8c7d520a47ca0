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

Two serving forms:

- :func:`ivf_cosine_topk` — one-shot: assigns clusters inline and
  filters (full corpus pass per query; fine for ad-hoc use, wrong for
  repeated queries).
- :func:`build_ivf_index` + :func:`ivf_search` — the serving path:
  assignment is materialized ONCE as cluster-partitioned Parquet
  (``write_parquet(partition_cols=["cluster"])``) with the centroid
  matrix stored alongside; each query then reads ONLY the ``nprobe``
  probed partition directories — probe cost scales with the probed
  fraction, independent of corpus size.
"""

from __future__ import annotations

import os

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
    id_col: str = "vec_id",
) -> np.ndarray:
    """Seeded spherical k-means on a bounded sample. Returns (k, d).

    The sample is a DETERMINISTIC hash-rate filter on ``id_col`` (the
    sampling.py convention), never a streaming ``limit()``: limit over
    a parallel read keeps whichever blocks complete first, so the
    trained centroids (and every downstream assignment) would differ
    run to run once the corpus exceeds ``sample_limit``. Falls back to
    the full dataset when ``id_col`` is absent (bounded callers)."""
    n = emb_ds.count()
    if n > sample_limit and id_col in emb_ds.schema().names:
        from lsearch_ray.functions.sampling import hash_sample

        # ceil so the expected sample stays <= ~sample_limit but never 0
        denom = max(2, (n + sample_limit - 1) // sample_limit)
        sample = hash_sample(emb_ds, id_col, num=1, denom=denom).take_all()
    else:
        sample = emb_ds.take_all()
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


def build_ivf_index(
    emb_ds,
    index_dir: str,
    *,
    n_clusters: int = 16,
    emb_col: str = "embedding",
    seed: int = 1234,
    sample_limit: int = 20_000,
) -> np.ndarray:
    """Materialize the IVF layout: train centroids, assign every vector,
    write cluster-partitioned Parquet + ``centroids.npy``/``meta.json``.

    One full pass over the corpus at build time buys probe cost
    independent of corpus size at query time (ivf_search reads only the
    probed ``cluster=<c>/`` directories). Returns the centroid matrix."""
    import json

    centroids = train_centroids(
        emb_ds,
        n_clusters,
        emb_col=emb_col,
        seed=seed,
        sample_limit=sample_limit,
    )
    assigned = emb_ds.map_batches(
        AssignClusters(centroids, emb_col), batch_format="pyarrow"
    )
    # build into a scratch dir, then swap: write_parquet APPENDS
    # uuid-named files (a rebuild over a stale dir would leave duplicate/
    # deleted vectors), and destroy-then-build would lose the old index
    # if the new write fails mid-stream
    import shutil

    tmp_dir = f"{index_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    assigned.write_parquet(tmp_dir, partition_cols=["cluster"])
    np.save(os.path.join(tmp_dir, "centroids.npy"), centroids)
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(
            {"n_clusters": int(len(centroids)), "emb_col": emb_col, "dim": int(centroids.shape[1])},
            f,
        )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)
    return centroids


def ivf_search(
    index_dir: str,
    query: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str | None = None,
    round_to: int | None = 4,
) -> pa.Table:
    """Query a materialized IVF index: rank centroids by cosine to the
    query, read ONLY the ``nprobe`` nearest ``cluster=<c>/`` partition
    directories, exact cosine top-k over those vectors.

    ``emb_col`` defaults to the column the index was BUILT with
    (meta.json); the query dimension is validated against the index."""
    import json

    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        idx_meta = json.load(f)
    if emb_col is None:
        emb_col = idx_meta.get("emb_col", "embedding")
    q = np.asarray(query, dtype=np.float64)
    if len(q) != int(idx_meta.get("dim", len(q))):
        raise ValueError(
            f"query dim {len(q)} != index dim {idx_meta['dim']}"
        )
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(centroids @ qn))[:nprobe]
    # read_parquet accepts one directory but a LIST must be files — expand
    import glob

    paths = [
        f
        for c in probe
        for f in sorted(
            glob.glob(os.path.join(index_dir, f"cluster={int(c)}", "*.parquet"))
        )
    ]
    if not paths:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
    candidates = rd.read_parquet(paths)
    return cosine_topk(
        candidates, q, k, id_col=id_col, emb_col=emb_col, round_to=round_to
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
