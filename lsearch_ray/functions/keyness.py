"""Corpus keyness (Dunning '93 log-likelihood ratio, public method):
which terms are most DISTINCTIVE of a target document slice vs the rest
of the corpus — the domain-signature / slice-drift diagnostic of a
training-data pipeline (what vocabulary does the 'en' slice, a source,
or a time window over-use?).

Per term with target count ``a`` and rest count ``b`` (token totals
``A``, ``B``):

    G2 = 2 · (a·ln(a/E1) + b·ln(b/E2)),   E1 = A(a+b)/(A+B),
                                          E2 = B(a+b)/(A+B)

decomposed so every ln argument is an INTEGER ratio spelled identically
in both engines, each bracket rounded to integer micro-nats BEFORE the
count multiply:

    t1 = floor((ln a − ln(a+b) − ln A + ln(A+B)) · 1e6 + 0.5)   [a>0]
    t2 = floor((ln b − ln(a+b) − ln B + ln(A+B)) · 1e6 + 0.5)   [b>0]
    g2_micro = 2 · (a·t1 + b·t2)                 [pure int64]

so outputs are exact integers (the established micro-nat contract).
``assoc`` = +1 when the term is over-represented in the target
(a·B > b·A), −1 when under-represented, 0 at exact proportionality.

Scale shape: one tokenize pass emitting per-batch (term, a, b) partials
(a two-column value-count combiner keyed by the doc's target flag), ONE
term-keyed groupby.sum, vocabulary-sized; scoring is vectorized with
``math.log`` per DISTINCT count (libm parity with DuckDB); top-k via
per-block prune + tiny global sort.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import flat_tokens_arrow


def _ln_micro_of(x: np.ndarray) -> np.ndarray:
    """ln per DISTINCT integer value (float64, un-rounded — callers
    compose brackets then round once)."""
    uniq, inv = np.unique(x, return_inverse=True)
    lns = np.array(
        [math.log(int(v)) if v > 0 else 0.0 for v in uniq], dtype=np.float64
    )
    return lns[inv]


def keyness_terms_ds(
    docs_ds,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-k keyness terms of the target slice vs the rest.

    Returns (term, a, b, assoc, g2_micro) ordered by
    (g2_micro DESC, term ASC) LIMIT k, over terms with a+b ≥ min_count.
    """

    def partial(b: pa.Table) -> pa.Table:
        parents, flat = flat_tokens_arrow(b[text_col])
        empty = pa.table(
            {
                "term": pa.array([], type=pa.large_string()),
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
            }
        )
        if len(flat) == 0:
            return empty
        is_t = (
            pc.fill_null(
                pc.equal(b[target_col], pa.scalar(target_value)), False
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tgt = is_t[parents]
        t = pa.table(
            {
                "term": flat,
                "a": pa.array(tgt),
                "b": pa.array(1 - tgt),
            }
        )
        agg = t.group_by("term").aggregate([("a", "sum"), ("b", "sum")])
        return pa.table(
            {
                "term": agg["term"].combine_chunks().cast(pa.large_string()),
                "a": agg["a_sum"].cast(pa.int64()),
                "b": agg["b_sum"].cast(pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum(["a", "b"])
        .materialize()
    )
    tots = counts.sum(["sum(a)", "sum(b)"]) or {}
    tot_a = int(tots.get("sum(sum(a))") or 0)
    tot_b = int(tots.get("sum(sum(b))") or 0)

    def score(t: pa.Table) -> pa.Table:
        a = t["sum(a)"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["sum(b)"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (a + b) >= min_count
        if not keep.any():
            # same 4-column schema as the data path (assoc is added only
            # in the final driver-side rebuild) — mixed block schemas
            # break stricter concat/sort paths
            return pa.table(
                {
                    "term": pa.array([], type=pa.large_string()),
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "g2_micro": pa.array([], type=pa.int64()),
                }
            )
        term = t["term"].combine_chunks().cast(pa.large_string()).filter(
            pa.array(keep)
        )
        a, b = a[keep], b[keep]
        ab = a + b
        ln_a, ln_b, ln_ab = (
            _ln_micro_of(a),
            _ln_micro_of(b),
            _ln_micro_of(ab),
        )
        ln_ta = math.log(tot_a) if tot_a > 0 else 0.0
        ln_tb = math.log(tot_b) if tot_b > 0 else 0.0
        ln_tt = math.log(tot_a + tot_b)
        # bracket spelled EXACTLY like the SQL twin: ln a − ln(a+b) −
        # ln A + ln(A+B), left-to-right, rounded once per bracket
        t1 = np.floor(((ln_a - ln_ab - ln_ta) + ln_tt) * 1e6 + 0.5).astype(
            np.int64
        )
        t2 = np.floor(((ln_b - ln_ab - ln_tb) + ln_tt) * 1e6 + 0.5).astype(
            np.int64
        )
        # exact Python-int products: a·t1 can exceed int64 at extreme
        # corpus counts (a ~2e11 × t1 ~4e7 µnats) — same overflow-proof
        # treatment as the assoc rebuild below; vocab-sized, so cheap
        t1m = np.where(a > 0, t1, 0)
        t2m = np.where(b > 0, t2, 0)
        # the FINAL value can also exceed int64 when the two products
        # don't cancel (a ~2e11 × t1 ~4e7 µnats ≈ 8e18 > 2^63−1):
        # saturate at the int64 bounds rather than raise — clamped terms
        # tie at the extreme and keep their top-of-ranking position
        lo, hi = -(1 << 63), (1 << 63) - 1
        g2 = pa.array(
            [
                min(hi, max(lo, 2 * (int(ai) * int(t1i) + int(bi) * int(t2i))))
                for ai, t1i, bi, t2i in zip(a, t1m, b, t2m)
            ],
            pa.int64(),
        )
        return pa.table(
            {
                "term": term,
                "a": pa.array(a),
                "b": pa.array(b),
                "g2_micro": g2,
            }
        )

    from lsearch_ray.functions.ngrams import _block_topk

    top = (
        counts.map_batches(score, batch_format="pyarrow")
        .map_batches(
            lambda t: _block_topk(
                t, k, [("g2_micro", "descending"), ("term", "ascending")]
            ),
            batch_format="pyarrow",
        )
        .sort(["g2_micro", "term"], descending=[True, False])
        .limit(k)
        .take_all()
    )

    def sign(x: int) -> int:
        return (x > 0) - (x < 0)

    # assoc on the k result rows with EXACT Python ints — the vectorized
    # a·B − b·A cross-product would wrap int64 at extreme corpus counts
    return pa.table(
        {
            "term": pa.array([r["term"] for r in top], pa.large_string()),
            "a": pa.array([int(r["a"]) for r in top], pa.int64()),
            "b": pa.array([int(r["b"]) for r in top], pa.int64()),
            "assoc": pa.array(
                [
                    sign(int(r["a"]) * tot_b - int(r["b"]) * tot_a)
                    for r in top
                ],
                pa.int64(),
            ),
            "g2_micro": pa.array(
                [int(r["g2_micro"]) for r in top], pa.int64()
            ),
        }
    )


def slice_jaccard_ds(
    docs_ds,
    slices: list[str],
    *,
    slice_col: str = "lang",
    n: int = 3,
    text_col: str = "text",
) -> pa.Table:
    """Exact Jaccard similarity of DISTINCT word n-gram sets between
    document slices (e.g. languages or sources) — the corpus-drift /
    slice-overlap diagnostic: how much surface form do two slices share?

    Returns (slice_a, slice_b, inter, uni, jaccard_micro) for every
    unordered slice pair (slice_a < slice_b by the caller-supplied
    order, which must be sorted), where ``jaccard_micro =
    inter * 1e6 // uni`` (0 when the union is empty) — floor fixed-point
    over non-negative integers, exact in any engine.

    Scale shape: one pass emits per-batch DISTINCT (gram, slice-bit)
    rows; ONE gram-keyed groupby.max merges presence flags (max of 0/1
    = OR); per-batch partial sums reduce the flag table to an
    L + L·(L−1)/2 column vector summed by the engine — nothing
    vocabulary-sized ever reaches the driver.
    """
    if not slices or any(a >= b for a, b in zip(slices, slices[1:])):
        raise ValueError("slices must be strictly increasing and non-empty")
    from lsearch_ray.functions.ngrams import doc_ngrams

    L = len(slices)
    names = [f"b{i}" for i in range(L)]
    pair_idx = [(i, j) for i in range(L) for j in range(i + 1, L)]

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], type=pa.large_string()),
                **{nm: pa.array([], type=pa.int64()) for nm in names},
            }
        )
        parents, grams = doc_ngrams(b[text_col], n)
        if len(grams) == 0:
            return empty
        sidx = pc.index_in(
            b[slice_col], value_set=pa.array(slices, pa.string())
        )
        s = pc.fill_null(sidx, -1).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rs = s[parents]
        keep = rs >= 0
        if not keep.any():
            return empty
        enc = grams.filter(pa.array(keep)).dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        pairs = np.unique(np.stack([codes, rs[keep]], axis=1), axis=0)
        cols = {
            "gram": enc.dictionary.take(pa.array(pairs[:, 0])).cast(
                pa.large_string()
            )
        }
        for i, nm in enumerate(names):
            cols[nm] = pa.array((pairs[:, 1] == i).astype(np.int64))
        return pa.table(cols)

    flags = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .max(names)
    )

    def pairsums(t: pa.Table) -> pa.Table:
        arrs = [
            t[f"max({nm})"].to_numpy(zero_copy_only=False).astype(np.int64)
            for nm in names
        ]
        row: dict[str, list[int]] = {}
        for i in range(L):
            row[f"c{i}"] = [int(arrs[i].sum())]
        for i, j in pair_idx:
            row[f"x{i}_{j}"] = [int((arrs[i] & arrs[j]).sum())]
        return pa.table(row)

    cols = [f"c{i}" for i in range(L)] + [f"x{i}_{j}" for i, j in pair_idx]
    tot = (
        flags.map_batches(pairsums, batch_format="pyarrow").sum(cols) or {}
    )

    def g(c: str) -> int:
        return int(tot.get(f"sum({c})") or 0)

    rows_a, rows_b, inter, uni, jac = [], [], [], [], []
    for i, j in pair_idx:
        x = g(f"x{i}_{j}")
        u = g(f"c{i}") + g(f"c{j}") - x
        rows_a.append(slices[i])
        rows_b.append(slices[j])
        inter.append(x)
        uni.append(u)
        jac.append(x * 10**6 // u if u > 0 else 0)
    return pa.table(
        {
            "slice_a": pa.array(rows_a, pa.large_string()),
            "slice_b": pa.array(rows_b, pa.large_string()),
            "inter": pa.array(inter, pa.int64()),
            "uni": pa.array(uni, pa.int64()),
            "jaccard_micro": pa.array(jac, pa.int64()),
        }
    )
