"""Fixed-iteration PageRank over a deterministically-derived web link graph.

The web-graph member of the operator family: a synthetic link graph is
derived from document text (doc ``u`` links to doc ``fnv63(term) % n``
for each distinct term of ``u`` — a deterministic stand-in for href
extraction, which the sf tables don't carry), then a fixed-iteration
PageRank runs over it.

All rank arithmetic is non-negative int64 in micro-rank units with floor
division (the kmeans/unigram_nll parity discipline), so any engine —
including the DuckDB oracle twin — replays it bit-exactly:

    total = 10**12            # conserved mass, micro-units
    r0    = total // n
    base  = (15 * total) // (100 * n)          # teleport share
    r'(v) = base + (85 * (insum(v) + dang // n)) // 100
    insum(v) = sum over edges (u, v) of r(u) // outdeg(u)
    dang     = sum of r(u) over nodes with no out-edges

Scale shape: the edge list, degree table and rank vector are Datasets
throughout (never driver-side); each iteration is one hash join
(edges ⋈ ranks, partitioned on src), one groupby-sum (the per-iteration
all-to-all on dst) and one left join back to the node set. The only
driver-side value per iteration is the dangling-mass scalar. On a real
cluster the edge Dataset is hash-partitioned once and every iteration
reuses that key (src), so the join side of each round is shuffle-free
for the larger operand.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import term_counts_table
from lsearch_ray.corpus import fnv1a64
from lsearch_ray.functions.dedup import exact_dedup
from lsearch_ray.functions.joins import drop_empty_blocks

TOTAL_MICRO = 10**12


def _edge_batch(batch: pa.Table, n_docs: int, text_col: str, id_col: str) -> pa.Table:
    """documents batch -> distinct (src, dst) link rows, self-loops dropped.

    ``term_counts_table`` already emits one row per distinct (doc, term),
    so the link rule is a vectorized hash + modulo over its output; the
    within-batch pair-unique prunes the shuffle the global distinct does.
    """
    triples = term_counts_table(batch, text_col=text_col, id_col=id_col)
    if triples.num_rows == 0:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    src = triples[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = (fnv1a64(triples["term"]) % np.int64(n_docs)).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # within-batch unique via composite key (dst < n_docs, so no overflow
    # for any real doc-id range: src * n + dst < src_max * n)
    pairs = np.unique(src * np.int64(n_docs) + dst)
    return pa.table(
        {
            "src": pa.array(pairs // np.int64(n_docs), pa.int64()),
            "dst": pa.array(pairs % np.int64(n_docs), pa.int64()),
        }
    )


def doc_link_edges_ds(docs_ds, n_docs: int, *, text_col: str = "text",
                      id_col: str = "doc_id", num_partitions: int = 8):
    """documents Dataset -> globally-distinct (src, dst) edge Dataset."""
    raw = docs_ds.map_batches(
        lambda b: _edge_batch(b, n_docs, text_col, id_col),
        batch_format="pyarrow",
    )
    # global distinct: hash-partition + per-partition drop_duplicates
    return exact_dedup(raw, ["src", "dst"], ["src"], num_partitions=num_partitions)


def pagerank_ds(edges_ds, n_nodes: int, *, iters: int = 3,
                total: int = TOTAL_MICRO, num_partitions: int = 8):
    """(src, dst) edge Dataset -> (doc_id, pr_micro) over nodes 0..n-1.

    Fixed ``iters`` rounds of the integer recurrence above; returns the
    full rank vector sorted by doc_id (deterministic row order for the
    driver's value hash).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    # Ray's hash-join aggregator fails on fully-empty partitions, which
    # tiny node sets with many partitions produce (the insum side can be
    # a handful of hub nodes) — clamp like components/minhash do. At
    # scale pass num_partitions ≈ cluster cores × 4.
    num_partitions = max(1, min(num_partitions, max(1, n_nodes // 512)))

    base = (15 * total) // (100 * n_nodes)
    r0 = total // n_nodes

    deg = edges_ds.groupby("src").aggregate(Count(alias_name="deg")).materialize()

    # edges with the source's out-degree attached, partitioned on src once
    ewd = edges_ds.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("src",)
    ).materialize()

    # node set 0..n-1 with a static is-dangling flag (no out-edges); the
    # flag rides along so the per-iteration dangling mass needs no join
    nodes = rd.range(n_nodes).map_batches(
        lambda b: pa.table({"node": pc.cast(b["id"], pa.int64())}),
        batch_format="pyarrow",
    )
    flagged = nodes.join(
        deg,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("node",),
        right_on=("src",),
    ).map_batches(
        lambda b: pa.table(
            {"node": b["node"], "dang": pc.is_null(b["deg"])}
        ),
        batch_format="pyarrow",
    )
    ranks = flagged.map_batches(
        lambda b: b.append_column(
            "r", pa.array(np.full(b.num_rows, r0, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    # schema hygiene on every loop-carried table: a leading schema-less
    # empty block (Ray's empty-block map passthrough) poisons the next
    # round's join-side schema — see joins.drop_empty_blocks
    ranks = drop_empty_blocks(ranks.materialize())

    for _ in range(iters):
        dang_mass = (
            ranks.map_batches(
                lambda b: b.filter(b["dang"]), batch_format="pyarrow"
            ).sum("r")
            or 0
        )
        share = dang_mass // n_nodes

        def contrib(b: pa.Table) -> pa.Table:
            r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"dst": b["dst"], "c": pa.array(r // d, pa.int64())})

        insum = (
            ewd.join(
                ranks.select_columns(["node", "r"]),
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("node",),
            )
            .map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="insum"))
        )

        def apply_rank(b: pa.Table, share=share) -> pa.Table:
            s = pc.fill_null(b["insum"], 0).to_numpy(zero_copy_only=False)
            s = s.astype(np.int64)
            r = base + (85 * (s + share)) // 100
            return pa.table(
                {"node": b["node"], "dang": b["dang"], "r": pa.array(r, pa.int64())}
            )

        ranks = (
            ranks.select_columns(["node", "dang"])
            .join(
                insum,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("node",),
                right_on=("dst",),
            )
            .map_batches(apply_rank, batch_format="pyarrow")
            .materialize()
        )
        ranks = drop_empty_blocks(ranks)

    return (
        ranks.map_batches(
            lambda b: pa.table({"doc_id": b["node"], "pr_micro": b["r"]}),
            batch_format="pyarrow",
        ).sort("doc_id")
    )


_INF_DIST = 1 << 30


def bfs_distance_ds(edges_ds, n_nodes: int, *, seed_mod: int = 97,
                    seed_rem: int = 0, iters: int = 3,
                    num_partitions: int = 8):
    """K-hop directed BFS from a deterministic seed set (crawl-frontier
    depth): seeds are nodes with ``node % seed_mod == seed_rem``; ``iters``
    rounds of min-distance propagation ``d'(v) = min(d(v), 1 + min over
    edges (u,v) of d(u))``; rows with ``d ≤ iters`` are returned as
    ``(doc_id, dist)`` sorted by id.

    Same distributed shape as :func:`pagerank_ds`: the frontier is a
    filtered view of the distance Dataset, each round is one hash join on
    ``src`` (the reusable partition key), one groupby-min on ``dst`` and
    one left join back — all integers, so any engine replays it exactly.
    Unreached nodes carry the ``_INF_DIST`` sentinel and are pruned only
    at the end (never driver-side).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    num_partitions = max(1, min(num_partitions, max(1, n_nodes // 512)))

    def init(b: pa.Table) -> pa.Table:
        node = pc.cast(b["id"], pa.int64())
        nd = node.to_numpy(zero_copy_only=False)
        d = np.where(nd % seed_mod == seed_rem, 0, _INF_DIST).astype(np.int64)
        return pa.table({"node": node, "d": pa.array(d)})

    dist = rd.range(n_nodes).map_batches(init, batch_format="pyarrow").materialize()
    edges = edges_ds.materialize()
    # an empty edge set poisons the hash join (empty-Dataset pitfall);
    # distances are then just the seed set
    if edges.count() == 0:
        iters = 0

    for _ in range(iters):
        frontier = dist.map_batches(
            lambda b: b.filter(pc.less(b["d"], pa.scalar(_INF_DIST))),
            batch_format="pyarrow",
        )
        cand = (
            edges.join(
                frontier,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("node",),
            )
            .map_batches(
                lambda b: pa.table(
                    {"dst": b["dst"],
                     "nd": pc.add(b["d"], pa.scalar(1, pa.int64()))}
                ),
                batch_format="pyarrow",
            )
            .groupby("dst")
            .aggregate(Min("nd", alias_name="nd"))
            .materialize()
        )
        cand = drop_empty_blocks(cand)
        # an empty Dataset poisons downstream joins (see components.py);
        # no new candidates also means a fixed point — stop early
        if cand.count() == 0:
            break

        def step(b: pa.Table) -> pa.Table:
            d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            nd = pc.fill_null(b["nd"], _INF_DIST).to_numpy(zero_copy_only=False)
            return pa.table(
                {"node": b["node"],
                 "d": pa.array(np.minimum(d, nd.astype(np.int64)))}
            )

        dist = (
            dist.join(
                cand,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("node",),
                right_on=("dst",),
            )
            .map_batches(step, batch_format="pyarrow")
            .materialize()
        )
        dist = drop_empty_blocks(dist)

    return (
        dist.map_batches(
            lambda b: pa.table(
                {"doc_id": b["node"], "dist": b["d"]}
            ).filter(pc.less_equal(b["d"], pa.scalar(iters))),
            batch_format="pyarrow",
        ).sort("doc_id")
    )


def hits_ds(edges_ds, n_nodes: int, *, iters: int = 2,
            total: int = 10**9, num_partitions: int = 8):
    """Fixed-iteration HITS hubs/authorities over the directed link graph,
    in integer micro-score units (Kleinberg '99, re-expressed with the
    pagerank/kmeans floor-division parity discipline).

    Each half-step sums the opposite score across edges and renormalizes
    to a conserved ``total``: ``a(v) = (Σ_{u→v} h(u)) · total // A`` with
    ``A`` the global raw sum (and symmetrically for hubs). Every score is
    ≤ ``total`` and every raw sum is ≤ ``total`` (each node contributes
    its score at most once per distinct edge), so the widest product is
    ``total² = 10^18`` — inside int64 for any graph size; an engine with
    128-bit sums (DuckDB HUGEINT) replays it bit-exactly.

    Scale shape: per half-step one hash join (edges ⋈ scores on the
    stable key) + one groupby-sum + one left join back to the node set;
    the only driver-side value is the normalization scalar.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    num_partitions = max(1, min(num_partitions, max(1, n_nodes // 512)))
    edges = edges_ds.materialize()
    nodes = rd.range(n_nodes).map_batches(
        lambda b: pa.table({"node": pc.cast(b["id"], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    # an empty edge set poisons the hash join (empty-Dataset pitfall);
    # both raw sums are then 0, so every score normalizes to 0
    if edges.count() == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["node"],
                    "auth_micro": pa.array(
                        np.zeros(b.num_rows, dtype=np.int64)
                    ),
                    "hub_micro": pa.array(
                        np.zeros(b.num_rows, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).sort("doc_id")

    h0 = total // n_nodes
    hub = nodes.map_batches(
        lambda b: b.append_column(
            "h", pa.array(np.full(b.num_rows, h0, dtype=np.int64))
        ),
        batch_format="pyarrow",
    ).materialize()
    auth = nodes.map_batches(
        lambda b: b.append_column(
            "a", pa.array(np.zeros(b.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    ).materialize()

    def _half_step(src_scores, score_col, join_on, group_on, out_col):
        """One HITS half-step: sum `score_col` of `src_scores` across
        edges joined on `join_on`, grouped on `group_on`, normalized to
        `total`, left-joined back over all nodes as `out_col`."""
        raw = (
            edges.join(
                src_scores.select_columns(["node", score_col]),
                join_type="inner",
                num_partitions=num_partitions,
                on=(join_on,),
                right_on=("node",),
            )
            .groupby(group_on)
            .aggregate(Sum(score_col, alias_name="s"))
            .materialize()
        )
        raw = drop_empty_blocks(raw)
        tot_raw = int(raw.sum("s") or 0)

        def norm(b: pa.Table, tot_raw=tot_raw) -> pa.Table:
            s = pc.fill_null(b["s"], 0).to_numpy(zero_copy_only=False)
            s = s.astype(np.int64)
            out = (s * total) // tot_raw if tot_raw else np.zeros_like(s)
            return pa.table(
                {"node": b["node"], out_col: pa.array(out.astype(np.int64))}
            )

        half = (
            nodes.join(
                raw,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("node",),
                right_on=(group_on,),
            )
            .map_batches(norm, batch_format="pyarrow")
            .materialize()
        )
        return drop_empty_blocks(half)

    for _ in range(iters):
        auth = _half_step(hub, "h", "src", "dst", "a")
        hub = _half_step(auth, "a", "dst", "src", "h")

    out = auth.join(
        hub, join_type="inner", num_partitions=num_partitions, on=("node",)
    )
    return (
        out.map_batches(
            lambda b: pa.table(
                {"doc_id": b["node"], "auth_micro": b["a"], "hub_micro": b["h"]}
            ),
            batch_format="pyarrow",
        ).sort("doc_id")
    )


def _triangles_and_degrees(edges_ds, num_partitions: int):
    """Shared core of :func:`triangle_count_ds` and
    :func:`clustering_coeff_ds`: exact degree-ordered triangle count plus
    the undirected-degree Dataset. Returns ``(n_triangles, deg_ds)``;
    ``deg_ds`` is ``None`` for an edge-free graph."""
    from ray.data.aggregate import Count

    # undirected distinct pairs a < b
    def und_batch(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        a = np.minimum(s, d)
        bb = np.maximum(s, d)
        keep = a != bb
        a, bb = a[keep].astype(np.int64), bb[keep].astype(np.int64)
        if len(bb) and bb.max() < (1 << 31):
            # batch-local prune via 32-bit packing (ids here are doc
            # ordinals); larger ids skip the prune — the global
            # exact_dedup below is the correctness path either way
            pairs = np.unique((a << 32) | bb)
            a, bb = pairs >> 32, pairs & ((1 << 32) - 1)
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(bb, pa.int64())}
        )

    und = exact_dedup(
        edges_ds.map_batches(und_batch, batch_format="pyarrow"),
        ["a", "b"],
        ["a"],
        num_partitions=num_partitions,
    ).materialize()
    if und.count() == 0:
        return 0, None

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [b["a"].combine_chunks(), b["b"].combine_chunks()]
                )
            }
        )

    deg = (
        und.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="d"))
        .materialize()
    )
    nparts = max(1, min(num_partitions, max(1, deg.count() // 256)))

    da = deg.map_batches(
        lambda b: pa.table({"node": b["node"], "da": b["d"]}),
        batch_format="pyarrow",
    )
    db = deg.map_batches(
        lambda b: pa.table({"node": b["node"], "db": b["d"]}),
        batch_format="pyarrow",
    )

    def orient(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        c = b["b"].to_numpy(zero_copy_only=False)
        x = b["da"].to_numpy(zero_copy_only=False)
        y = b["db"].to_numpy(zero_copy_only=False)
        fwd = (x < y) | ((x == y) & (a < c))
        return pa.table(
            {
                "u": pa.array(np.where(fwd, a, c), pa.int64()),
                "v": pa.array(np.where(fwd, c, a), pa.int64()),
            }
        )

    oriented = (
        und.join(da, join_type="inner", num_partitions=nparts,
                 on=("a",), right_on=("node",))
        .join(db, join_type="inner", num_partitions=nparts,
              on=("b",), right_on=("node",))
        .map_batches(orient, batch_format="pyarrow")
        .materialize()
    )

    o2 = oriented.map_batches(
        lambda b: pa.table({"u": b["u"], "w": b["v"]}), batch_format="pyarrow"
    )
    wedges = (
        oriented.join(o2, join_type="inner", num_partitions=nparts, on=("u",))
        .map_batches(
            lambda b: b.filter(pc.less(b["v"], b["w"])).select(["v", "w"]),
            batch_format="pyarrow",
        )
    )
    closed = wedges.join(
        und,
        join_type="inner",
        num_partitions=nparts,
        on=("v", "w"),
        right_on=("a", "b"),
    )
    return closed.count(), deg


def triangle_count_ds(edges_ds, *, num_partitions: int = 8):
    """Exact triangle count of the undirected link graph, degree-ordered.

    The textbook distributed mitigation for hub skew: orient each
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, enumerate wedges only at out-neighbors of that DAG (wedge volume
    is then Σ min-degree², bounded even when hubs have huge degree — the
    naive join's Σ degree² is not), and close each wedge against the
    undirected edge set. Every triangle is counted exactly once: the
    (degree, id) total order makes each triangle a linear chain x<y<z
    whose unique 2-out-degree source x owns the one matching wedge.

    Returns a one-row Dataset ``(n_triangles)``. Every stage is a
    Dataset transform (two hash joins + one self-join + one semi-join);
    only the final count lands on the driver.
    """
    import ray.data as rd

    n, _ = _triangles_and_degrees(edges_ds, num_partitions)
    return rd.from_arrow(pa.table({"n_triangles": pa.array([n], pa.int64())}))


def clustering_coeff_ds(edges_ds, *, num_partitions: int = 8):
    """Global clustering coefficient of the undirected graph:
    ``3 · triangles / wedges`` with ``wedges = Σ_v d_v(d_v−1)/2``,
    reported in integer micro units (floor) so any engine replays the
    arithmetic bit-exactly. Triangles come from the degree-ordered count
    (:func:`_triangles_and_degrees`); the wedge sum is a vectorized
    per-batch map over the degree Dataset with only the scalar total on
    the driver.

    Returns a one-row Dataset ``(n_triangles, n_wedges, coeff_micro)``.
    """
    import ray.data as rd

    n_tri, deg = _triangles_and_degrees(edges_ds, num_partitions)
    if deg is None:
        n_wedges = 0
    else:
        n_wedges = int(
            deg.map_batches(
                lambda b: pa.table(
                    {
                        "w": pc.divide(
                            pc.multiply(
                                b["d"], pc.subtract(b["d"], pa.scalar(1))
                            ),
                            pa.scalar(2),
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("w")
        )
    coeff = (3 * n_tri * 1_000_000) // n_wedges if n_wedges else 0
    return rd.from_arrow(
        pa.table(
            {
                "n_triangles": pa.array([n_tri], pa.int64()),
                "n_wedges": pa.array([n_wedges], pa.int64()),
                "coeff_micro": pa.array([coeff], pa.int64()),
            }
        )
    )
