"""SemDeDup — semantic dedup inside k-means clusters (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

The scale trick of the paper: embedding-space near-duplicate search is
restricted to WITHIN k-means clusters, so the pair volume drops from
O(n²) to Σ_c n_c² — with k scaled to the corpus (the paper uses 50k
clusters for LAION), per-cluster all-pairs is the defined kernel, not
a shortcut. This module composes the repo's deterministic Lloyd
k-means (:func:`lsearch_ray.functions.kmeans.kmeans_assign` — seeded
by the k lowest ids, fixed-point 6-dp grid) with per-cluster cosine
edges and the shared keep-min-per-component survivor rule
(cluster.apply_verified_pairs), so the whole pipeline is replayable by
the SQL twin.

Kernel (mirrored by the twin):

- clusters: kmeans_assign(k, iters) — bit-exact vs the unrolled-CTE
  oracle (the kmeans_clusters contract);
- edges: unordered within-cluster pairs with
  ``floor(cosine · 10^6 + 0.5) ≥ tau_micro`` (the shared 6-dp grid
  that absorbs engine/oracle float summation-order ulps; zero-norm
  vectors never edge);
- survivors: min id per connected component survives; output is the
  surviving id column, ascending.

Scale shape: assignment is map-side against broadcast centroids; the
edge stage is ONE groupby(cluster) shuffle with a vectorized
normalized-matmul per group (assumes a cluster fits a reduce task —
the paper's large-k regime; a skewed mega-cluster should raise k);
components/drop-set application are the existing distributed paths.

Reference counterpart: none; SURVEY §2.9 dedup-family extension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.dedup import arrow_out


def semdedup_edges_ds(
    emb_ds,
    *,
    k: int = 4,
    iters: int = 2,
    tau_micro: int = 500_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int | None = None,
):
    """Within-cluster cosine edges ``(a, b)``, a < b (by id)."""
    import pandas as pd

    from lsearch_ray.functions.cluster import list_to_blob
    from lsearch_ray.functions.joins import (
        cpu_capped_partitions,
        hash_join,
    )
    from lsearch_ray.functions.kmeans import kmeans_assign

    parts = cpu_capped_partitions(num_partitions or 16)
    assign = kmeans_assign(
        emb_ds, k, iters=iters, id_col=id_col, emb_col=emb_col
    )

    # Arrow hash joins reject list<float> payload columns — ship the
    # vectors as fixed-width float32 blobs (the ANN/cluster convention)
    def to_blob(b: pa.Table) -> pa.Table:
        col = b[emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                "__emb": list_to_blob(col, dtype=np.float32),
            }
        )

    joined = hash_join(
        emb_ds.map_batches(to_blob, batch_format="pyarrow"),
        assign,
        on=id_col,
        num_partitions=parts,
    )

    def edges_group(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        M = np.stack(
            [
                np.frombuffer(x, dtype=np.float32)
                for x in g["__emb"].to_numpy()[order]
            ]
        ).astype(np.float64)
        n = len(ids)
        if n < 2:
            return arrow_out(
                pd.DataFrame(
                    {
                        "a": np.empty(0, dtype=np.int64),
                        "b": np.empty(0, dtype=np.int64),
                    }
                )
            )
        norms = np.sqrt((M * M).sum(axis=1))
        ok = norms > 0
        safe = np.where(ok, norms, 1.0)
        cos = (M @ M.T) / np.outer(safe, safe)
        cm = np.floor(cos * 1e6 + 0.5).astype(np.int64)
        iu, ju = np.triu_indices(n, k=1)
        keep = (cm[iu, ju] >= tau_micro) & ok[iu] & ok[ju]
        return arrow_out(
            pd.DataFrame({"a": ids[iu[keep]], "b": ids[ju[keep]]})
        )

    return joined.groupby("cluster").map_groups(
        edges_group, batch_format="pandas"
    )


def semdedup_survivors_ds(
    emb_ds,
    *,
    k: int = 4,
    iters: int = 2,
    tau_micro: int = 500_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int | None = None,
):
    """Surviving ids after SemDeDup: Dataset of ``(id_col,)`` ascending."""
    from lsearch_ray.functions.cluster import apply_verified_pairs
    from lsearch_ray.functions.joins import cpu_capped_partitions

    parts = cpu_capped_partitions(num_partitions or 16)
    edges = semdedup_edges_ds(
        emb_ds,
        k=k,
        iters=iters,
        tau_micro=tau_micro,
        id_col=id_col,
        emb_col=emb_col,
        num_partitions=parts,
    )
    return apply_verified_pairs(
        emb_ds.select_columns([id_col]),
        edges,
        id_col,
        num_partitions=parts,
    ).sort(id_col)
