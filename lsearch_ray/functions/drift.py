"""Per-slice unigram distribution drift — total variation distance of
each slice's token distribution against the REST of the corpus, the
distribution-shift monitor a training-data pipeline runs across
languages, sources or snapshot pairs (is the 'de' slice's vocabulary
profile diverging from everything else? did a new crawl shift a
source's token mix?).

For slice ``l`` with per-term counts ``a_t`` (slice) and
``b_t = tot_t − a_t`` (rest), token totals ``A`` and ``B``:

    TV(P_l, Q_l) = ½ Σ_t |a_t/A − b_t/B| = Σ_t |a_t·B − b_t·A| / (2AB)

reported as the established exact-integer micro contract:

    tv_micro = (Σ_t |a_t·B − b_t·A|) · 1e6 // (2·A·B)     ∈ [0, 1e6]

(0 when the slice IS the whole corpus, i.e. B = 0). Every product is
computed in Python ints — ``a·B`` overflows int64 once corpora pass
~10^9 tokens, and the per-partition tables are vocabulary-sized, so
arbitrary precision is cheap (the keyness.py overflow treatment).

Scale shape: one map-side (term, slice, count) combiner pass, ONE
term-keyed hash-partition shuffle; a term's rows all land in one
partition, so ``tot_t`` is partition-local and each partition emits
per-slice PARTIAL numerators. Terms ABSENT from a slice contribute
``tot_t · A`` without being enumerated: the partition also emits its
covered-total, and the driver combine adds ``(T − covered_l)·A_l`` —
so the shuffle carries only OBSERVED (term, slice) pairs, never the
|vocab|×|slices| cross product. Partials ride as decimal strings
(exact at any magnitude); the driver folds partitions×slices rows —
bounded, never vocabulary-sized. Slice token totals are a
|slices|-row aggregate broadcast (the oov_rate convention).

Reference counterpart: none; SURVEY §2.9 analytics-family extension
alongside keyness (which ranks TERMS of one slice — this scores whole
SLICES, the rollup that pages a human when it moves).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.analyzer import flat_tokens_arrow
from lsearch_ray.functions.dedup import partition_ids

_EMPTY_COUNTS = pa.table(
    {
        "term": pa.array([], type=pa.large_string()),
        "slice": pa.array([], type=pa.large_string()),
        "c": pa.array([], type=pa.int64()),
        "__part": pa.array([], type=pa.int64()),
    }
)


def slice_tv_drift_ds(
    docs_ds,
    *,
    slice_col: str = "lang",
    text_col: str = "text",
    num_partitions: int = 32,
) -> pa.Table:
    """(slice, slice_tokens, rest_tokens, tv_micro) per distinct slice
    value, sorted by slice — the per-slice unigram TV distance against
    the rest of the corpus (null slice values count as ``''``)."""
    import pyarrow.compute as pc

    def counts_part(b: pa.Table) -> pa.Table:
        parents, flat = flat_tokens_arrow(b[text_col])
        if len(flat) == 0:
            return _EMPTY_COUNTS
        sl = pc.fill_null(pc.cast(b[slice_col], pa.large_string()), "")
        t = pa.table({"term": flat, "slice": sl.take(pa.array(parents))})
        agg = t.group_by(["term", "slice"]).aggregate([([], "count_all")])
        out = pa.table(
            {
                "term": agg["term"].combine_chunks().cast(pa.large_string()),
                "slice": agg["slice"]
                .combine_chunks()
                .cast(pa.large_string()),
                "c": agg["count_all"].cast(pa.int64()),
            }
        )
        return out.append_column(
            "__part", pa.array(partition_ids(out, ["term"], num_partitions))
        )

    counts = docs_ds.map_batches(
        counts_part, batch_format="pyarrow"
    ).materialize()

    # |slices|-row totals (A_l), broadcast into the partition pass
    tot_rows = (
        counts.groupby("slice").sum("c").take_all()
    )  # bounded by slice cardinality — langs/sources, not vocab
    a_of = {r["slice"]: int(r["sum(c)"]) for r in tot_rows}
    total = sum(a_of.values())

    def numer_part(g: pa.Table) -> pa.Table:
        # within a term partition: tot_t is local; per-slice partial
        # numerator over OBSERVED (term, slice) pairs plus the covered
        # mass (the driver adds the absent-term term (T−covered)·A).
        # Rows arrive as per-BATCH partials — sum to true (term, slice)
        # counts FIRST, |a·B − b·A| is non-linear in a.
        agg = g.group_by(["term", "slice"]).aggregate([("c", "sum")])
        g = pa.table(
            {"term": agg["term"], "slice": agg["slice"], "c": agg["c_sum"]}
        )
        term = g["term"].combine_chunks().dictionary_encode()
        tcode = term.indices.to_numpy()
        c = g["c"].to_numpy()
        tot_per_code = np.bincount(
            tcode, weights=c.astype(np.float64), minlength=len(term.dictionary)
        ).astype(np.int64)
        sl = g["slice"].to_pylist()
        slices = sorted(set(sl))
        n1: dict[str, int] = {s: 0 for s in slices}
        cov: dict[str, int] = {s: 0 for s in slices}
        tots = [int(v) for v in tot_per_code[tcode]]
        for s, cnt, tt in zip(sl, (int(v) for v in c), tots):
            A = a_of.get(s, 0)
            B = total - A
            # Python ints: a·B and b·A overflow int64 at web scale
            n1[s] += abs(cnt * B - (tt - cnt) * A)
            cov[s] += tt
        return pa.table(
            {
                "slice": pa.array(slices, type=pa.large_string()),
                "n1": pa.array(
                    [str(n1[s]) for s in slices], type=pa.large_string()
                ),
                "covered": pa.array(
                    [str(cov[s]) for s in slices], type=pa.large_string()
                ),
            }
        )

    partials = (
        counts.groupby("__part")
        .map_groups(numer_part, batch_format="pyarrow")
        .take_all()
    )  # ≤ partitions × slices rows — bounded, never vocabulary-sized

    n1_of: dict[str, int] = {s: 0 for s in a_of}
    cov_of: dict[str, int] = {s: 0 for s in a_of}
    for r in partials:
        n1_of[r["slice"]] += int(r["n1"])
        cov_of[r["slice"]] += int(r["covered"])

    out_slices = sorted(a_of)
    tv = []
    for s in out_slices:
        A, B = a_of[s], total - a_of[s]
        n = n1_of[s] + (total - cov_of[s]) * A
        tv.append(n * 10**6 // (2 * A * B) if A > 0 and B > 0 else 0)
    return pa.table(
        {
            "slice": pa.array(out_slices, type=pa.large_string()),
            "slice_tokens": pa.array(
                [a_of[s] for s in out_slices], type=pa.int64()
            ),
            "rest_tokens": pa.array(
                [total - a_of[s] for s in out_slices], type=pa.int64()
            ),
            "tv_micro": pa.array(tv, type=pa.int64()),
        }
    )
