"""PageRank over the derived doc link graph: the distributed integer
recurrence must replay bit-exactly against a pure-Python reference, and
the result must be partition-invariant."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.analyzer import tokenize
from lsearch_ray.corpus import fnv1a64
from lsearch_ray.functions.pagerank import (
    TOTAL_MICRO,
    doc_link_edges_ds,
    pagerank_ds,
)

DOCS = [
    "alpha beta gamma",
    "beta gamma delta delta",
    "gamma",
    "",  # token-less -> dangling node
    "alpha alpha zeta",
    "delta zeta",
    "beta zeta epsilon",
    "epsilon",
]


def _ref_edges(n):
    edges = set()
    for i, text in enumerate(DOCS):
        for t in set(tokenize(text)):
            h = int(fnv1a64(pa.array([t]))[0])
            dst = h % n
            if dst != i:
                edges.add((i, dst))
    return sorted(edges)


def _ref_pagerank(edges, n, iters):
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (15 * TOTAL_MICRO) // (100 * n)
    r = {v: TOTAL_MICRO // n for v in range(n)}
    for _ in range(iters):
        dang = sum(r[v] for v in range(n) if v not in deg)
        share = dang // n
        insum = {v: 0 for v in range(n)}
        for s, d in edges:
            insum[d] += r[s] // deg[s]
        r = {v: base + (85 * (insum[v] + share)) // 100 for v in range(n)}
    return r


def _docs_ds(blocks):
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS),
        }
    )
    return rd.from_arrow(tab).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 3])
def test_pagerank_matches_pure_python_reference(blocks):
    n = len(DOCS)
    edges_ds = doc_link_edges_ds(_docs_ds(blocks), n)
    got_edges = sorted(
        (r["src"], r["dst"]) for r in edges_ds.take_all()
    )
    assert got_edges == _ref_edges(n)

    out = pagerank_ds(edges_ds, n, iters=3).to_pandas()
    expect = _ref_pagerank(_ref_edges(n), n, 3)
    assert list(out["doc_id"]) == list(range(n))
    got = dict(zip(out["doc_id"], out["pr_micro"]))
    assert got == expect


def test_pagerank_mass_and_dangling():
    n = len(DOCS)
    edges = _ref_edges(n)
    out = pagerank_ds(doc_link_edges_ds(_docs_ds(2), n), n, iters=3).to_pandas()
    r = out["pr_micro"].to_numpy()
    base = (15 * TOTAL_MICRO) // (100 * n)
    # floor division only ever loses mass; teleport floor keeps ranks >= base
    assert (r >= base).all()
    assert r.sum() <= TOTAL_MICRO
    assert r.sum() >= int(0.95 * TOTAL_MICRO)
    # the dangling doc (index 3) has no in-links in this fixture iff no
    # term hashes to 3 — then its rank is exactly base + 85*share//100
    dsts = {d for _, d in edges}
    if 3 not in dsts:
        assert r[3] < np.median(r)


def test_triangle_count_matches_bruteforce():
    from itertools import combinations

    from lsearch_ray.functions.pagerank import triangle_count_ds

    n = len(DOCS)
    edges = _ref_edges(n)
    und = {(min(a, b), max(a, b)) for a, b in edges}
    nodes = sorted({x for e in und for x in e})
    expect = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in und and (x, z) in und and (y, z) in und
    )
    out = triangle_count_ds(doc_link_edges_ds(_docs_ds(2), n)).to_pandas()
    assert list(out.columns) == ["n_triangles"]
    assert out["n_triangles"].iloc[0] == expect
    # the fixture graph must actually contain triangles for this test
    # to exercise the wedge-close path
    assert expect > 0


def test_triangle_count_empty_graph():
    import ray.data as rd
    from lsearch_ray.functions.pagerank import triangle_count_ds

    empty = rd.from_arrow(
        pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
    out = triangle_count_ds(empty).to_pandas()
    assert out["n_triangles"].iloc[0] == 0


def test_clustering_coeff_matches_bruteforce():
    from itertools import combinations

    from lsearch_ray.functions.pagerank import clustering_coeff_ds

    n = len(DOCS)
    edges = _ref_edges(n)
    und = {(min(a, b), max(a, b)) for a, b in edges}
    nodes = sorted({x for e in und for x in e})
    tri = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in und and (x, z) in und and (y, z) in und
    )
    deg = {v: sum(1 for e in und if v in e) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    out = clustering_coeff_ds(doc_link_edges_ds(_docs_ds(2), n)).to_pandas()
    assert out["n_triangles"].iloc[0] == tri
    assert out["n_wedges"].iloc[0] == wedges
    assert out["coeff_micro"].iloc[0] == (3 * tri * 1_000_000) // wedges


def test_clustering_coeff_empty_graph():
    import ray.data as rd
    from lsearch_ray.functions.pagerank import clustering_coeff_ds

    empty = rd.from_arrow(
        pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
    out = clustering_coeff_ds(empty).to_pandas()
    assert out.iloc[0].tolist() == [0, 0, 0]


def _ref_bfs(edges, n, iters, seed_mod, seed_rem=0):
    INF = 1 << 30
    d = {v: (0 if v % seed_mod == seed_rem else INF) for v in range(n)}
    for _ in range(iters):
        nd = dict(d)
        for s, t in edges:
            if d[s] < INF:
                nd[t] = min(nd[t], d[s] + 1)
        d = nd
    return {v: x for v, x in d.items() if x <= iters}


@pytest.mark.parametrize("blocks", [1, 3])
def test_bfs_distance_matches_pure_python_reference(blocks):
    from lsearch_ray.functions.pagerank import bfs_distance_ds

    n = len(DOCS)
    edges = _ref_edges(n)
    # seed_mod=3 -> several seeds (0, 3, 6); the frontier must expand
    out = bfs_distance_ds(
        doc_link_edges_ds(_docs_ds(blocks), n), n, seed_mod=3, iters=2
    ).to_pandas()
    expect = _ref_bfs(edges, n, 2, 3)
    assert dict(zip(out["doc_id"], out["dist"])) == expect
    assert list(out["doc_id"]) == sorted(out["doc_id"])
    # non-seed reachable nodes must appear at dist >= 1
    assert (out["dist"] <= 2).all()


def test_bfs_distance_unreached_pruned_and_fixed_point():
    from lsearch_ray.functions.pagerank import bfs_distance_ds

    # a 2-node graph with an isolated node: 0 -> 1, node 2 isolated
    edges = rd.from_arrow(
        pa.table({"src": pa.array([0], pa.int64()),
                  "dst": pa.array([1], pa.int64())})
    )
    out = bfs_distance_ds(edges, 3, seed_mod=3, iters=3).to_pandas()
    # seed 0 at dist 0, node 1 at dist 1; isolated node 2 pruned
    assert dict(zip(out["doc_id"], out["dist"])) == {0: 0, 1: 1}


def _ref_hits(edges, n, iters, total=10**9):
    h = {v: total // n for v in range(n)}
    a = {v: 0 for v in range(n)}
    for _ in range(iters):
        ar = {v: 0 for v in range(n)}
        for s, t in edges:
            ar[t] += h[s]
        tot = sum(ar.values())
        a = {v: (ar[v] * total) // tot if tot else 0 for v in range(n)}
        hr = {v: 0 for v in range(n)}
        for s, t in edges:
            hr[s] += a[t]
        tot = sum(hr.values())
        h = {v: (hr[v] * total) // tot if tot else 0 for v in range(n)}
    return a, h


@pytest.mark.parametrize("blocks", [1, 3])
def test_hits_matches_pure_python_reference(blocks):
    from lsearch_ray.functions.pagerank import hits_ds

    n = len(DOCS)
    edges = _ref_edges(n)
    out = hits_ds(doc_link_edges_ds(_docs_ds(blocks), n), n, iters=2).to_pandas()
    ra, rh = _ref_hits(edges, n, 2)
    assert list(out["doc_id"]) == list(range(n))
    assert dict(zip(out["doc_id"], out["auth_micro"])) == ra
    assert dict(zip(out["doc_id"], out["hub_micro"])) == rh
    # normalization conserves (floor-lossy) total mass
    total = 10**9
    assert 0 < out["auth_micro"].sum() <= total
    assert 0 < out["hub_micro"].sum() <= total


def test_hits_edge_free_graph_zero_scores():
    from lsearch_ray.functions.pagerank import hits_ds

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )
    out = hits_ds(empty, 4, iters=2).to_pandas()
    assert (out["auth_micro"] == 0).all()
    assert (out["hub_micro"] == 0).all()
