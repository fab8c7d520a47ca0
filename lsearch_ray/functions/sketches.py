"""Heavy-hitters (frequent items) with an exact verification pass.

SURVEY §2.9 "sketches" family (the reference has none — its only
counting is the per-record ``More`` match count, search.rs:274-276).

The 100-TB shape: per-batch truncated counts are the Misra-Gries-style
candidate generator — each batch keeps only its ``per_batch_cap`` most
frequent values, so driver/shuffle state is bounded no matter how large
the value universe is. A value outside a batch's kept set has, in that
batch, a count ≤ the batch's cap-th count; summing those cap-th counts
over all batches gives a global undercount bound B, and a value cut
from a FULL candidate list additionally carries at most the smallest
kept approx count — so U = B + min_kept_approx (when the list is full)
bounds the true count of EVERY non-candidate. A second
broadcast-filtered pass counts the candidates EXACTLY, and if the k-th
exact count exceeds U the top-k is provably exact — the sketch buys
bounded memory, the verify pass buys back exactness (which is what
makes a SQL oracle possible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _value_counts(arr) -> tuple[pa.Array, np.ndarray]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vc = pc.value_counts(arr)
    return vc.field("values"), vc.field("counts").to_numpy(zero_copy_only=False)


def heavy_hitters(
    ds,
    col: str | None = None,
    *,
    values_fn=None,
    k: int = 20,
    per_batch_cap: int = 4096,
    candidate_cap: int | None = None,
    num_partitions: int = 8,
) -> tuple[pa.Table, dict]:
    """Top-``k`` most frequent values of ``col`` (or of the array
    ``values_fn(batch)`` — e.g. a tokenizer, so token streams never
    materialize as rows between stages).

    Returns ``(table(value, n) sorted by (n desc, value), info)`` where
    ``info['provably_exact']`` certifies that no value outside the
    candidate set can displace the reported top-k (k-th exact count >
    the non-candidate bound U — see module docstring) and
    ``info['bound']`` is U.
    """
    if (col is None) == (values_fn is None):
        raise ValueError("heavy_hitters: pass exactly one of col / values_fn")
    cap = per_batch_cap
    cand_cap = candidate_cap or max(8 * k, 1024)

    def partial(b: pa.Table) -> pa.Table:
        vals = values_fn(b) if values_fn else b[col]
        uniq, cnt = _value_counts(vals)
        bound = 0
        if len(cnt) > cap:
            keep = np.argpartition(-cnt, cap - 1)[:cap]
            bound = int(cnt[np.argpartition(-cnt, cap)[cap]])
            uniq = uniq.take(pa.array(np.sort(keep)))
            cnt = cnt[np.sort(keep)]
        out_v = pc.cast(uniq, pa.large_string())
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [out_v.combine_chunks() if isinstance(out_v, pa.ChunkedArray) else out_v,
                     pa.array([None], type=pa.large_string())]
                ),
                "c": pa.array(
                    np.concatenate([cnt.astype(np.int64), [bound]]),
                    type=pa.int64(),
                ),
                "is_bound": pa.array(
                    np.concatenate(
                        [np.zeros(len(cnt), dtype=np.int8), [1]]
                    ),
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Sum

    bound = (
        partials.filter(expr="is_bound == 1")
        .aggregate(Sum("c", alias_name="b"))
    )
    B = int((bound or {}).get("b") or 0)
    approx = (
        partials.filter(expr="is_bound == 0")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c_approx"))
        .sort(["c_approx", "v"], descending=[True, False])
        .limit(cand_cap)
        .take_all()
    )
    cand = pa.array([r["v"] for r in approx], type=pa.large_string())
    # sound undercount bound U for ANY value outside the candidate set:
    # true(v) ≤ approx(v) + B (each batch undercounts v by ≤ its cap-th
    # count), and if the candidate list is FULL, an excluded v lost the
    # approx top-cand_cap sort, so approx(v) ≤ the smallest kept approx.
    # A non-full candidate list means nothing was cut there (approx(v)=0).
    cand_full = len(approx) == cand_cap
    min_approx = int(approx[-1]["c_approx"]) if approx else 0
    U = B + (min_approx if cand_full else 0)
    if len(cand) == 0:
        empty = pa.table(
            {
                "value": pa.array([], type=pa.large_string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        return empty, {"provably_exact": U == 0, "bound": U}

    # exact recount of the candidates only (broadcast value-set filter)
    def exact_partial(b: pa.Table) -> pa.Table:
        vals = values_fn(b) if values_fn else b[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = pc.cast(vals, pa.large_string())
        vals = vals.filter(pc.is_in(vals, value_set=cand))
        uniq, cnt = _value_counts(vals)
        return pa.table(
            {
                "v": pc.cast(uniq, pa.large_string()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="n"))
        .sort(["n", "v"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    table = pa.table(
        {
            "value": pa.array(exact["v"], type=pa.large_string()),
            "n": pa.array(exact["n"], type=pa.int64()),
        }
    )
    kth = int(exact["n"].iloc[-1]) if len(exact) else 0
    # U == 0 ⇒ no batch ever truncated AND the candidate list wasn't cut:
    # the candidates ARE the complete value universe — exact regardless of
    # how many rows came back. Otherwise a full k rows whose k-th exact
    # count beats U certifies that no outside value can displace them.
    # (A previous form compared kth > B only, ignoring the approx mass a
    # cut candidate could carry — an unsound certificate.)
    provable = (U == 0) or (len(exact) == k and kth > U)
    return table, {"provably_exact": provable, "bound": U}


# --------------------------------------------------------- Count-Min ----


def cms_hash_params(depth: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """The CMS row hash coefficients, exposed so the SQL twin embeds the
    SAME (a, b) stream as literals: h_j(x) = ((a_j·x + b_j) mod (2^61−1))
    mod width, the minhash universal-hash convention
    (minhash.MinHashSignatures, minhash.py:130-151)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=depth, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=depth, dtype=np.uint64)
    return a, b


def cms_term_counts_ds(
    docs_ds,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    seed: int = 777,
    text_col: str = "text",
):
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) over the token
    stream, reported as ``(term, exact_n, cms_est)`` for the corpus
    top-``k`` terms by exact count (ties term-asc).

    The sketch is the genuinely MERGEABLE frequency summary: each batch
    contributes a depth×width integer partial that sums associatively,
    so at 100 TB the whole corpus reduces to ``depth·width`` int64s no
    matter the vocabulary size (the exact groupby this query also runs
    for its oracle column is the thing a CMS replaces at scale).
    ``cms_est ≥ exact_n`` always (one-sided error); the overestimate is
    bounded by 2·T/width with probability 1−2^−depth.

    Kernel (replayed exactly by the SQL twin): token hash = 63-bit
    FNV-1a, row hash = ((a_j·(x mod p) + b_j) mod p) mod width with
    p = 2^61−1 and the minhash mulmod; counts are token OCCURRENCES.

    Scale shape: one map pass emits per-batch (row, bucket, count)
    partials (≤ depth·width rows per batch via bincount), one tiny
    groupby merges them; the bounded sketch broadcasts into the top-k
    estimate lookup. The exact top-k rides the combiner-style
    value-counts partial + term groupby.
    """
    from ray.data.aggregate import Sum

    from lsearch_ray.analyzer import flat_tokens_arrow
    from lsearch_ray.corpus import fnv1a64
    from lsearch_ray.functions.minhash import _MERSENNE, _mulmod_mersenne61

    a, b = cms_hash_params(depth, seed)
    w64 = np.uint64(width)

    def _buckets(x: np.ndarray) -> np.ndarray:
        """depth×n bucket ids for 63-bit hashes x."""
        xm = x % _MERSENNE
        out = np.empty((depth, len(x)), dtype=np.int64)
        with np.errstate(over="ignore"):
            for j in range(depth):
                v = (_mulmod_mersenne61(a[j], xm) + b[j]) % _MERSENNE
                out[j] = (v % w64).astype(np.int64)
        return out

    def sketch_partial(batch: pa.Table) -> pa.Table:
        _, flat = flat_tokens_arrow(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    "j": pa.array([], type=pa.int64()),
                    "bkt": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        bk = _buckets(fnv1a64(flat).astype(np.uint64))
        js, bs, cs = [], [], []
        for j in range(depth):
            cnt = np.bincount(bk[j], minlength=width)
            nz = np.flatnonzero(cnt)
            js.append(np.full(len(nz), j, dtype=np.int64))
            bs.append(nz.astype(np.int64))
            cs.append(cnt[nz].astype(np.int64))
        return pa.table(
            {
                "j": pa.array(np.concatenate(js)),
                "bkt": pa.array(np.concatenate(bs)),
                "c": pa.array(np.concatenate(cs)),
            }
        )

    rows = (
        docs_ds.map_batches(sketch_partial, batch_format="pyarrow")
        .groupby(["j", "bkt"])
        .aggregate(Sum("c", alias_name="n"))
        .take_all()  # bounded: ≤ depth·width rows
    )
    sketch = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        sketch[int(r["j"]), int(r["bkt"])] = int(r["n"])

    def exact_partial(batch: pa.Table) -> pa.Table:
        _, flat = flat_tokens_arrow(batch[text_col])
        uniq, cnt = _value_counts(flat)
        return pa.table(
            {
                "term": pc.cast(uniq, pa.large_string()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    top = (
        docs_ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="exact_n"))
        .sort(["exact_n", "term"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    if len(top):
        terms = pa.array(top["term"].tolist(), type=pa.large_string())
        bk = _buckets(fnv1a64(terms).astype(np.uint64))
        est = sketch[np.arange(depth)[:, None], bk].min(axis=0)
    else:
        est = np.empty(0, dtype=np.int64)
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "term": pa.array(top["term"].tolist(), type=pa.string()),
                "exact_n": pa.array(
                    top["exact_n"].to_numpy(dtype=np.int64)
                    if len(top)
                    else [],
                    type=pa.int64(),
                ),
                "cms_est": pa.array(est, type=pa.int64()),
            }
        )
    )
