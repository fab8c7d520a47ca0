"""SemDeDup (:mod:`lsearch_ray.functions.semdedup`) — brute-force
reference: engine kmeans assignment (its own oracle-tested contract) +
all-pairs within-cluster cosine on the 6-dp grid + union-find
keep-min survivors."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.kmeans import kmeans_assign
from lsearch_ray.functions.semdedup import (
    semdedup_edges_ds,
    semdedup_survivors_ds,
)


def _mk(n: int, dim: int, seed: int, dup_pairs: int = 5):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, dim).astype(np.float32)
    for i in range(dup_pairs):
        # near-duplicate: j = slightly perturbed copy of i
        M[n - 1 - i] = M[i] + rng.randn(dim).astype(np.float32) * 0.01
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), type=pa.int64()),
                "embedding": pa.array(
                    [row for row in M.tolist()],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    ), M


def _ref(ds, M: np.ndarray, k: int, iters: int, tau_micro: int):
    asg = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_assign(ds, k, iters=iters).take_all()
    }
    Md = M.astype(np.float64)
    norms = np.sqrt((Md * Md).sum(axis=1))
    parent = list(range(len(Md)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = []
    for i in range(len(Md)):
        for j in range(i + 1, len(Md)):
            if asg[i] != asg[j] or norms[i] == 0 or norms[j] == 0:
                continue
            cos = float(Md[i] @ Md[j]) / (norms[i] * norms[j])
            if int(np.floor(cos * 1e6 + 0.5)) >= tau_micro:
                edges.append((i, j))
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[max(pi, pj)] = min(pi, pj)
    comp = {}
    for i in range(len(Md)):
        comp.setdefault(find(i), []).append(i)
    survivors = sorted(min(members) for members in comp.values())
    return sorted(edges), survivors


def test_against_union_find_reference():
    ds, M = _mk(60, 8, seed=13)
    tau = 900_000
    ref_edges, ref_surv = _ref(ds, M, k=3, iters=2, tau_micro=tau)
    got_edges = sorted(
        (int(r["a"]), int(r["b"]))
        for r in semdedup_edges_ds(ds, k=3, iters=2, tau_micro=tau).take_all()
    )
    assert got_edges == ref_edges
    assert len(got_edges) >= 5  # the engineered near-dups edge
    surv = semdedup_survivors_ds(ds, k=3, iters=2, tau_micro=tau).to_pandas()
    assert list(surv.columns) == ["vec_id"]
    assert list(surv["vec_id"]) == ref_surv
    assert len(surv) < 60  # something was dropped


def test_no_edges_keeps_everything():
    ds, _ = _mk(20, 6, seed=4, dup_pairs=0)
    surv = semdedup_survivors_ds(
        ds, k=2, iters=1, tau_micro=1_000_001
    ).to_pandas()
    assert list(surv["vec_id"]) == list(range(20))


def test_zero_norm_vectors_never_edge():
    M = np.zeros((4, 5), dtype=np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(4), type=pa.int64()),
                "embedding": pa.array(
                    M.tolist(), type=pa.list_(pa.float32())
                ),
            }
        )
    )
    assert (
        semdedup_edges_ds(ds, k=2, iters=1, tau_micro=0).count() == 0
    )
