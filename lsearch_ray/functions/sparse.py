"""Sparse all-pairs cosine similarity over term-frequency vectors.

The classic sparse similarity join (Bayardo et al., WWW'07 "Scaling Up
All Pairs Similarity Search"): candidate pairs come from co-occurrence
in a posting list, with ubiquitous terms pruned by document frequency —
the df cap both bounds the pair blowup (a term of df d emits d(d-1)/2
partial products) and is the standard approximation knob. The operator's
DEFINED kernel is cosine over the PRUNED term space (2 ≤ df ≤ max_df):
norms and dots both use only kept terms, so the result is exact for
that kernel and exactly SQL-expressible — not an approximation with
unstated error.

Scale shape (no broadcast anywhere):
1. one hash-partition shuffle of the (term, doc, tf) triples on term —
   a partition holds ALL rows of its terms, so a term's run length IS
   its global df (no separate df pass, no keep-set broadcast);
2. each partition does one lexsort and emits, in a single vectorized
   pass, (a) per-term partial dot products for kept runs and (b) per-doc
   partial squared norms over kept terms;
3. dots aggregate by (a, b) via a second hash-partition + run-boundary
   sum; norms by a tiny groupby;
4. two distributed hash joins attach n2(a), n2(b); the fixed-point
   similarity ``floor(dot·1e6 / sqrt(n2a·n2b) + 0.5)`` filters the
   threshold. dot and n2 are exact int64; the float expression is one
   multiply, one sqrt, one divide spelled identically in the SQL twin.

Reference counterpart: none (the reference has no similarity ops);
SURVEY §2.9 similarity-family extension alongside MinHash/SimHash/ANN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from lsearch_ray.functions.dedup import arrow_out, partition_ids


def _emit_index_pairs(
    run_starts: np.ndarray, keep: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All (i < j) index pairs inside each kept run of a sorted array.
    Vectorized: the only Python loop is over DISTINCT run lengths."""
    L = np.diff(run_starts)
    starts = run_starts[:-1]
    sel = np.flatnonzero(keep)
    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    fl = L[sel]
    for lv in np.unique(fl):
        runs = starts[sel[fl == lv]]
        ti, tj = np.triu_indices(int(lv), k=1)
        ia_parts.append((runs[:, None] + ti[None, :]).ravel())
        ib_parts.append((runs[:, None] + tj[None, :]).ravel())
    if ia_parts:
        return np.concatenate(ia_parts), np.concatenate(ib_parts)
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)


def sparse_cosine_pairs(
    docs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 50,
    min_sim_micro: int = 200_000,
    num_partitions: int = 32,
):
    """All document pairs with pruned-space cosine ≥ the threshold.

    Returns a Dataset of (a, b, dot, sim_micro), a < b, sorted by (a, b).
    See the module docstring for semantics and the scale plan.
    """
    from ray.data.aggregate import Sum

    from lsearch_ray.pipelines.fulltext import tf_triples

    triples = tf_triples(docs_ds, text_col, id_col)

    def add_part(b: pa.Table) -> pa.Table:
        t = b.select(["term", "doc_id", "tf"])
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["term"], num_partitions))
        )

    def pairs_and_norms(g: pd.DataFrame) -> pa.Table:
        doc = g["doc_id"].to_numpy().astype(np.int64)
        tf = g["tf"].to_numpy().astype(np.int64)
        codes, _ = pd.factorize(g["term"].to_numpy(), sort=False)
        order = np.lexsort((doc, codes))
        codes, doc, tf = codes[order], doc[order], tf[order]
        change = np.flatnonzero(np.diff(codes)) + 1
        run_starts = np.concatenate(([0], change, [len(codes)]))
        L = np.diff(run_starts)
        # a partition holds every row of its terms → run length == global df
        keep = (L >= 2) & (L <= max_df)
        kept_mask = np.repeat(keep, L)
        kd, ktf = doc[kept_mask], tf[kept_mask]
        ud, inv = np.unique(kd, return_inverse=True)
        n2p = np.bincount(inv, weights=(ktf * ktf).astype(np.float64)).astype(
            np.int64
        )
        ia, ib = _emit_index_pairs(run_starts, keep)
        # docs ascend within a run and are distinct per term → a < b
        return arrow_out(pd.DataFrame(
            {
                "kind": np.concatenate(
                    [
                        np.zeros(len(ia), dtype=np.int8),
                        np.ones(len(ud), dtype=np.int8),
                    ]
                ),
                "a": np.concatenate([doc[ia], ud]),
                "b": np.concatenate([doc[ib], np.zeros(len(ud), dtype=np.int64)]),
                "v": np.concatenate([tf[ia] * tf[ib], n2p]),
            }
        ))

    emitted = (
        triples.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_and_norms)
        .materialize()  # feeds both the dots and the norms consumers
    )

    # empty-pair guard: joins downstream of an empty Dataset fail with a
    # FieldRef error (empty join partitions) — return the empty result
    # directly when no run survives the df window
    n_pairs = int(
        emitted.map_batches(
            lambda t: pa.table(
                {"n": [int((np.asarray(t["kind"]) == 0).sum())]}
            ),
            batch_format="pyarrow",
        ).sum("n")
        or 0
    )
    if n_pairs == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "dot": pa.array([], type=pa.int64()),
                    "sim_micro": pa.array([], type=pa.int64()),
                }
            )
        )

    norms = (
        emitted.map_batches(
            lambda t: t.filter(
                pa.compute.equal(t["kind"], pa.scalar(1, pa.int8()))
            ).select(["a", "v"]),
            batch_format="pyarrow",
        )
        .groupby("a")
        .aggregate(Sum("v", alias_name="n2"))
        .select_columns(["a", "n2"])
    )

    def part_pairs(b: pa.Table) -> pa.Table:
        t = b.filter(pa.compute.equal(b["kind"], pa.scalar(0, pa.int8())))
        t = t.select(["a", "b", "v"])
        return t.append_column(
            "__p2", pa.array(partition_ids(t, ["a", "b"], num_partitions))
        )

    def sum_pairs(g: pd.DataFrame) -> pa.Table:
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        v = g["v"].to_numpy().astype(np.int64)
        order = np.lexsort((b, a))
        a, b, v = a[order], b[order], v[order]
        change = np.flatnonzero((np.diff(a) != 0) | (np.diff(b) != 0)) + 1
        starts = np.concatenate(([0], change))
        return arrow_out(pd.DataFrame(
            {
                "a": a[starts],
                "b": b[starts],
                "dot": np.add.reduceat(v, starts),
            })
        )

    dots = (
        emitted.map_batches(part_pairs, batch_format="pyarrow")
        .groupby("__p2")
        .map_groups(sum_pairs)
    )

    from lsearch_ray.functions.joins import hash_join

    na = norms.map_batches(
        lambda t: t.rename_columns(["a", "n2a"]), batch_format="pyarrow"
    )
    nb = norms.map_batches(
        lambda t: t.rename_columns(["b", "n2b"]), batch_format="pyarrow"
    )
    # size the norm joins to the PAIR volume, never the partition knob:
    # Dataset.join spawns hash-shuffle aggregator actors per partition,
    # and over-partitioned joins deadlock at small CPU counts (the
    # editdist payload-join lesson)
    join_parts = max(1, min(16, n_pairs // 100_000 + 1))
    joined = hash_join(
        hash_join(dots, na, on="a", num_partitions=join_parts),
        nb,
        on="b",
        num_partitions=join_parts,
    )

    def finish(t: pa.Table) -> pa.Table:
        dot = t["dot"].to_numpy(zero_copy_only=False).astype(np.float64)
        n2a = t["n2a"].to_numpy(zero_copy_only=False).astype(np.float64)
        n2b = t["n2b"].to_numpy(zero_copy_only=False).astype(np.float64)
        sim = np.floor(dot * 1e6 / np.sqrt(n2a * n2b) + 0.5).astype(np.int64)
        out = pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "dot": t["dot"],
                "sim_micro": pa.array(sim),
            }
        )
        return out.filter(
            pa.compute.greater_equal(out["sim_micro"], min_sim_micro)
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort(["a", "b"])
