"""Distributed connected components via iterative min-label propagation.

The clustering path for every near-dup dedup variant: each round every
node adopts the minimum label in its neighborhood, implemented as a
Dataset groupby over the symmetrized edge list. Converges in O(diameter)
rounds; near-dup clusters are dense (tiny diameter), so a handful of
rounds suffices — non-convergence within ``max_rounds`` is surfaced with
a warning (dedup then under-drops, the safe direction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _cc_partitions(requested: int | None, n_rows: int) -> int:
    """Per-round hash-join partition count: cores-scaled when the caller
    passes None, bounded by the live CPU count (far-above-parallelism
    counts deadlock Ray's hash-shuffle aggregators on small sessions) and
    the row volume (≥1 row per partition). Empty PARTITIONS are fine in
    Ray's hash join — what its aggregator rejects is a fully-empty join
    SIDE, which the empty-edges early returns below guard — so no
    64-rows-per-partition strangle here."""
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 2))
        if ray.is_initialized()
        else 2
    )
    if requested is None:
        requested = max(2, cpus)
    return max(1, min(requested, cpus, n_rows or 1))


def connected_components_ds(
    pairs_ds,
    *,
    max_rounds: int = 50,
    num_partitions: int | None = None,
):
    """(a, b) edge Dataset → (node, label) Dataset, label = min node id of
    the component. Pure Dataset transforms; driver holds only the
    convergence counter.

    ``num_partitions`` sizes the per-round hash join — defaults to the
    live cluster's core count (row-bounded); pass an explicit value only
    to pin reducer memory."""
    import ray.data as rd
    from ray.data.aggregate import Min

    # symmetrize edges once: every node sees every neighbor
    def symmetrize(b: pa.Table) -> pa.Table:
        a_col = b["a"].to_numpy(zero_copy_only=False)
        b_col = b["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a_col, b_col]), type=pa.int64()),
                "nbr": pa.array(np.concatenate([b_col, a_col]), type=pa.int64()),
            }
        )

    from lsearch_ray.functions.joins import drop_empty_blocks

    # drop_empty_blocks: the upstream pair stage can hand us schema-less
    # empty blocks (Ray's empty-block map passthrough), which would strip
    # 'node'/'nbr' from some join-side partitions at finalize
    edges = drop_empty_blocks(
        pairs_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        # a fully-empty join SIDE is the one shape Ray's hash-shuffle
        # aggregator rejects at finalize — short-circuit it (no edges ⇒
        # no labeled endpoints)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        )
    num_partitions = _cc_partitions(num_partitions, n_edges)
    # labels start as the node's own id (incl. its neighbors' ids round 1)
    labels = drop_empty_blocks(
        edges.groupby("node")
        .aggregate(Min("nbr", alias_name="label"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "label": pa.compute.min_element_wise(b["node"], b["label"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    converged = False
    for _ in range(max_rounds):
        # propagate: node's label -> its neighbors; take min over incoming
        from lsearch_ray.functions.joins import hash_join

        nbr_labels = labels.map_batches(
            lambda b: pa.table({"lnode": b["node"], "lbl": b["label"]}),
            batch_format="pyarrow",
        )
        incoming = hash_join(
            edges,
            nbr_labels,
            on="nbr",
            right_on="lnode",
            num_partitions=num_partitions,
        ).map_batches(
            lambda b: pa.table({"node": b["node"], "cand": b["lbl"]}),
            batch_format="pyarrow",
        )
        both = incoming.union(
            labels.map_batches(
                lambda b: pa.table({"node": b["node"], "cand": b["label"]}),
                batch_format="pyarrow",
            )
        )
        from lsearch_ray.functions.joins import drop_empty_blocks

        # schema hygiene: the groupby emits one block per hash partition
        # including schema-less empties; a leading one poisons the NEXT
        # round's join-side schema (see joins.drop_empty_blocks)
        new_labels = drop_empty_blocks(
            both.groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        # convergence: total label sum is monotonically decreasing
        old_sum = labels.sum("label")
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            converged = True
            break
    if not converged:
        # diameter > max_rounds (chain-shaped clusters from over-cap bucket
        # chaining): labels are a valid partition refinement but some
        # components may carry several local-minimum labels — dedup then
        # under-drops (safe direction). Surface it instead of staying silent.
        import logging

        logging.getLogger(__name__).warning(
            "connected_components_ds: min-label propagation did not converge "
            "within max_rounds=%d; components with diameter > %d may be "
            "split (dedup will under-drop). Raise max_rounds.",
            max_rounds,
            max_rounds,
        )
    return labels


def component_labels_ds(
    ids_ds,
    pairs_ds,
    id_col: str,
    *,
    max_rounds: int = 50,
    num_partitions: int | None = None,
    sort: bool = True,
):
    """Total component labeling: every id in ``ids_ds`` gets the min id of
    its connected component in the ``(a, b)`` pair graph; ids touching no
    edge label themselves. The direct query surface over
    :func:`connected_components_ds` (which only covers edge endpoints).

    One left-outer hash join of the id universe against the propagated
    labels — both sides stay Datasets; partitions sized to row volume
    (Ray's hash-join aggregator rejects fully-empty partitions).

    Returns ``(id_col, component: int64)`` sorted by ``id_col``.
    Pass ``sort=False`` when the caller immediately re-shuffles the
    result (e.g. feeds it into a hash join) — the terminal range sort is
    a full exchange that such compositions would pay for and then
    destroy."""
    import pyarrow.compute as pc

    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        out = ids_ds.map_batches(
            lambda b: pa.table(
                {id_col: b[id_col], "component": b[id_col]}
            ),
            batch_format="pyarrow",
        )
        return out.sort(id_col) if sort else out
    labels = connected_components_ds(
        pairs_ds, max_rounds=max_rounds, num_partitions=num_partitions
    )
    # size partitions to the SMALLER join side: labels covers only edge
    # endpoints (≤ 2 · n_pairs rows)
    joined = ids_ds.select_columns([id_col]).join(
        labels,
        join_type="left_outer",
        num_partitions=_cc_partitions(
            num_partitions, min(ids_ds.count(), 2 * n_pairs)
        ),
        on=(id_col,),
        right_on=("node",),
    )
    out = joined.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "component": pc.coalesce(
                    pc.cast(b["label"], pa.int64()), b[id_col]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return out.sort(id_col) if sort else out


def drop_ids_from_pairs_ds(
    pairs_ds, *, max_rounds: int = 50, num_partitions: int | None = None
):
    """Distributed counterpart of cluster.drop_ids_from_pairs: every node
    whose component label isn't itself is dropped (keep min per cluster).

    Returns a Dataset with one ``node:int64`` column — the drop set stays
    distributed; apply it with cluster.filter_out_ids_ds (broadcast when
    small, anti-join when large), never a driver-side list."""
    labels = connected_components_ds(
        pairs_ds, max_rounds=max_rounds, num_partitions=num_partitions
    )
    return labels.map_batches(
        lambda b: b.filter(
            pa.compute.not_equal(b["node"], b["label"])
        ).select(["node"]),
        batch_format="pyarrow",
    )
