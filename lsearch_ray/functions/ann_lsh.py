"""LSH-bucketed approximate similarity search + embedding near-dup.

Random-hyperplane (sign) LSH for cosine similarity (Charikar '02):
``bucket = sign bits of (V @ planes)``. Two uses:

- :func:`lsh_cosine_topk` — the scale path for ANN: probe only the
  buckets within hamming distance ``nprobe_hamming`` of the query's
  bucket (a broadcast bucket-set filter — no shuffle), then exact cosine
  on the surviving fraction. Complements the exact brute-force baseline
  in functions/ann.py.
- :func:`embedding_dedup` — near-duplicate removal by cosine ≥ threshold:
  bucket groupby → candidate pairs → exact-cosine verify → union-find
  survivors (same skeleton as MinHash/SimHash, functions/cluster.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.ann import _stack_embeddings
from lsearch_ray.functions.cluster import (
    apply_verified_pairs,
    attach_pair_payloads,
    bucket_pairs_ds,
    fixed_blob_matrix,
    list_to_blob,
    unique_pairs,
)


def _planes(dim: int, nplanes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(dim, nplanes).astype(np.float64)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes) > 0
    out = np.zeros(len(m), dtype=np.int64)
    for j in range(planes.shape[1]):
        out |= bits[:, j].astype(np.int64) << j
    return out


class HyperplaneBuckets:
    """map_batches transform appending ``bucket:int64``."""

    def __init__(
        self,
        dim: int,
        nplanes: int = 16,
        seed: int = 4242,
        emb_col: str = "embedding",
    ):
        self.planes = _planes(dim, nplanes, seed)
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack_embeddings(batch[self.emb_col]).astype(np.float64)
        if m.shape[0] == 0:
            return batch.append_column("bucket", pa.array([], type=pa.int64()))
        return batch.append_column(
            "bucket", pa.array(_bucket_of(m, self.planes), type=pa.int64())
        )


def _neighbor_buckets(bucket: int, nplanes: int, max_hamming: int) -> list[int]:
    out = {bucket}
    if max_hamming >= 1:
        for j in range(nplanes):
            out.add(bucket ^ (1 << j))
    if max_hamming >= 2:
        for j in range(nplanes):
            for l in range(j + 1, nplanes):
                out.add(bucket ^ (1 << j) ^ (1 << l))
    return sorted(out)


def lsh_cosine_topk(
    emb_ds,
    query: np.ndarray,
    k: int = 10,
    *,
    dim: int | None = None,
    nplanes: int = 12,
    nprobe_hamming: int = 1,
    seed: int = 4242,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = 4,
) -> pa.Table:
    """Approximate cosine top-k: probe the query's LSH bucket
    neighborhood, exact-score only the survivors."""
    from lsearch_ray.functions.ann import cosine_topk

    q = np.asarray(query, dtype=np.float64)
    dim = dim if dim is not None else len(q)
    planes = _planes(dim, nplanes, seed)
    qb = int(_bucket_of(q[None, :], planes)[0])
    probe = pa.array(
        _neighbor_buckets(qb, nplanes, nprobe_hamming), type=pa.int64()
    )
    bucketed = emb_ds.map_batches(
        HyperplaneBuckets(dim, nplanes, seed, emb_col), batch_format="pyarrow"
    )
    candidates = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["bucket"], value_set=probe)),
        batch_format="pyarrow",
    )
    return cosine_topk(
        candidates, q, k, id_col=id_col, emb_col=emb_col, round_to=round_to
    )


def embedding_dedup(
    ds,
    *,
    threshold: float = 0.95,
    dim: int | None = None,
    nplanes: int = 16,
    seed: int = 4242,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Remove near-duplicate embeddings (cosine ≥ threshold); keeps the
    min id per cluster.

    Fully distributed: candidate vectors travel to the pair rows as
    fixed-width float64 blobs through hash joins
    (cluster.attach_pair_payloads), exact cosine runs vectorized per batch
    (row-wise einsum), and clustering + survivor filtering share the
    components/anti-join path with the other dedup variants."""
    from lsearch_ray.functions.minhash import _pair_partitions

    if dim is None:
        first = ds.take(1)
        if not first:
            return ds
        dim = len(first[0][emb_col])
    bucketed = ds.map_batches(
        HyperplaneBuckets(dim, nplanes, seed, emb_col), batch_format="pyarrow"
    )
    pairs = unique_pairs(
        bucket_pairs_ds(bucketed, ["bucket"], id_col)
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds
    np_eff = _pair_partitions(n_pairs)
    vec_blobs = ds.map_batches(
        lambda b: pa.table(
            {id_col: b[id_col], "vb": list_to_blob(b[emb_col], np.float64)}
        ),
        batch_format="pyarrow",
    )
    joined = attach_pair_payloads(pairs, vec_blobs, id_col, num_partitions=np_eff)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ma = fixed_blob_matrix(b["vb_a"], np.float64)
        mb = fixed_blob_matrix(b["vb_b"], np.float64)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = na * nb
        denom[denom == 0] = np.inf  # zero vectors: cosine treated as 0
        sims = np.einsum("ij,ij->i", ma, mb) / denom
        return pa.table({"a": b["a"], "b": b["b"]}).filter(
            pa.array(sims >= threshold)
        )

    verified = joined.map_batches(verify, batch_format="pyarrow")
    return apply_verified_pairs(ds, verified, id_col, num_partitions=np_eff)


def ann_recall_table(
    emb_ds,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    nplanes: int = 10,
    nprobe_hamming: int = 1,
    seed: int = 4242,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Recall@k of LSH-probed cosine search vs the exact brute-force
    answer, for a batch of query vectors, in ONE corpus pass.

    Per batch: one matmul scores every vector against all Q queries; the
    exact arm takes a per-(query) partial top-k, the LSH arm masks to
    vectors whose hyperplane bucket is within hamming ``nprobe_hamming``
    of the query's bucket (the lsh_cosine_topk probe rule, same planes /
    seed) before its partial top-k. The driver merges Q×2×k-row partials
    and reports ``recall_pct = |approx ∩ exact| * 100 // k`` per query.

    Ranking contract: (round(sim, 4) desc, id asc) — the SQL twin ranks
    on the ROUNDED cosine, and raw-float ordering can swap membership at
    the rank-k boundary where two sims tie at 4 decimals; rounding
    before ranking (and an exact lexsort top-k per batch, not a tie-
    arbitrary argpartition) keeps both arms engine-independent.

    Returns a pa.Table (query_id, n_exact, recall_pct) sorted by
    query_id. Q is broadcast once; nothing else leaves the tasks.
    """
    from lsearch_ray.functions.ann import _stack_embeddings as _stack

    q = np.asarray(queries, dtype=np.float64)
    nq, dim = q.shape
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    planes = _planes(dim, nplanes, seed)
    qb = _bucket_of(q, planes)
    probe_sets = [
        np.array(_neighbor_buckets(int(b), nplanes, nprobe_hamming), dtype=np.int64)
        for b in qb
    ]

    class _Partial:
        def __init__(self):
            self.qn = qn
            self.planes = planes
            self.probe_sets = probe_sets

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _stack(batch[emb_col]).astype(np.float64)
            empty = pa.table(
                {
                    "qi": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
            if m.shape[0] == 0:
                return empty
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = np.round((m / norms[:, None]) @ self.qn.T, 4)  # n × Q
            bkt = _bucket_of(m, self.planes)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            out_qi, out_kind, out_id, out_sim = [], [], [], []
            for qi in range(nq):
                s = sims[:, qi]
                for kind, mask in ((0, None), (1, np.isin(bkt, self.probe_sets[qi]))):
                    sv, iv = (s, ids) if mask is None else (s[mask], ids[mask])
                    if len(sv) > k:
                        # exact top-k under (sim desc, id asc): ties at
                        # the boundary must keep the LOWER id, so no
                        # tie-arbitrary argpartition here
                        order = np.lexsort((iv, -sv))[:k]
                        sv, iv = sv[order], iv[order]
                    out_qi.append(np.full(len(sv), qi, dtype=np.int64))
                    out_kind.append(np.full(len(sv), kind, dtype=np.int64))
                    out_id.append(iv.astype(np.int64))
                    out_sim.append(sv)
            return pa.table(
                {
                    "qi": pa.array(np.concatenate(out_qi)),
                    "kind": pa.array(np.concatenate(out_kind)),
                    id_col: pa.array(np.concatenate(out_id)),
                    "sim": pa.array(np.concatenate(out_sim)),
                }
            )

    parts = emb_ds.map_batches(_Partial(), batch_format="pyarrow").take_all()
    by_arm: dict[tuple[int, int], list] = {}
    for r in parts:
        by_arm.setdefault((r["qi"], r["kind"]), []).append((r["sim"], r[id_col]))

    def topk_ids(rows: list) -> list[int]:
        rows.sort(key=lambda t: (-t[0], t[1]))
        return [i for _, i in rows[:k]]

    out_rows = []
    for qi in range(nq):
        exact = topk_ids(by_arm.get((qi, 0), []))
        approx = set(topk_ids(by_arm.get((qi, 1), [])))
        hit = sum(1 for i in exact if i in approx)
        out_rows.append((query_ids[qi], len(exact), hit * 100 // k))
    out_rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], pa.int64()),
            "n_exact": pa.array([r[1] for r in out_rows], pa.int64()),
            "recall_pct": pa.array([r[2] for r in out_rows], pa.int64()),
        }
    )


def project_embeddings_ds(
    emb_ds,
    out_dim: int = 16,
    *,
    seed: int = 4242,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
):
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss):
    project each embedding onto ``out_dim`` seeded Gaussian directions —
    the cheap, data-independent dim reduction used before clustering /
    coarse ANN at scale. The same seeded planes as the LSH family, so
    any engine can replay them from (dim, out_dim, seed).

    Stateless one-pass map: per batch ONE matmul against the broadcast
    (dim × out_dim) plane matrix; nothing shuffles. Returns a Dataset in
    long form (id, dim, coord_pico): both the embedding values and the
    plane entries are fixed-point quantized to the 1e-6 grid
    (``floor(x·1e6 + 0.5)``) BEFORE the dot product, so each coordinate
    is a pure int64 sum (unit 1e-12 ≈ pico) — bit-exact across engines
    regardless of summation order (a float matmul's accumulation order
    differs between BLAS and SQL kernels; measured ulp drift flips the
    rounded value whenever a coordinate lands within ~1 ulp of a
    half-grid boundary). Sorted output is the caller's choice.
    """

    class _Project:
        def __init__(self):
            self.qplanes = None  # lazily sized from the first batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _stack_embeddings(batch[emb_col]).astype(np.float64)
            if m.shape[0] == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "coord_pico": pa.array([], pa.int64()),
                    }
                )
            d = dim if dim is not None else m.shape[1]
            if self.qplanes is None:
                self.qplanes = quantize_micro(_planes(d, out_dim, seed))
            qm = quantize_micro(m)
            coords = qm @ self.qplanes  # n × out_dim, exact int64
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    id_col: pa.array(np.repeat(ids, out_dim)),
                    "dim": pa.array(
                        np.tile(np.arange(out_dim, dtype=np.int64), len(ids))
                    ),
                    "coord_pico": pa.array(coords.reshape(-1)),
                }
            )

    return emb_ds.map_batches(_Project(), batch_format="pyarrow")


def quantize_micro(x: np.ndarray) -> np.ndarray:
    """Fixed-point quantization to the 1e-6 grid, half-up — the shared
    pre-dot-product step of :func:`project_embeddings_ds` and its SQL
    twin (``CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)``)."""
    return np.floor(x * 1e6 + 0.5).astype(np.int64)
