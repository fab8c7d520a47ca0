"""End-to-end training-data curation pipeline — the composition the
individual operator families are built for, in one streamed run:

    quality gate → exact content dedup → near-dup components
    → keep-min-per-cluster → leakage-safe cluster split
    → per-split sequence packing

Per-stage scale shapes (each documented at its definition):
- quality gate: pure map-side vectorized pass (textstats.quality_filter_ds)
- exact dedup: one (hash, id) shuffle + survivor semi-join
  (dedup.exact_dedup_by_content)
- near-dup: MinHash banding candidates + exact shingle verify
  (minhash.ngram_jaccard_pairs) → distributed min-label components
  (components.component_labels_ds)
- split: hash of the COMPONENT label (sampling.hash_split_labels), so a
  near-dup cluster can never straddle train/test — and because the
  labels are computed once, dedup and split share the single banding
  pass
- packing: two-pass per-(group, range) cumsum, no global sort
  (packing.pack_bins_by_group_ds)

The composition is where accidental materializations between families
would hide; bench.py's ``e2e_curation`` entry times it (median-of-3)
over a slice of the synthetic bench corpus (LSR_E2E_DOCS docs, default
100k) at the session's cpu count. The 8-vs-32-cpu measurement on the
full 2M-doc corpus was a separate manual protocol run recorded in
BASELINE.md ("Round 5: end-to-end curation pipeline at 8 vs 32 cpus").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus_ds(
    docs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    pack_capacity: int = 2048,
    num_partitions: int = 16,
    quality_kwargs: dict | None = None,
):
    """documents Dataset → packed curated Dataset
    ``(doc_id, split, n, bin_id)``: one survivor row per kept document
    with its leakage-safe split label and its sequence-packed bin id
    within the split's id-ordered stream."""
    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.dedup import exact_dedup_by_content
    from lsearch_ray.functions.joins import hash_join, safe_partitions
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs
    from lsearch_ray.functions.packing import pack_bins_by_group_ds
    from lsearch_ray.functions.sampling import hash_split_labels
    from lsearch_ray.functions.textstats import quality_filter_ds

    gated = quality_filter_ds(docs_ds, text_col=text_col, id_col=id_col,
                              keep_all=True, **(quality_kwargs or {}))
    exact = exact_dedup_by_content(
        gated, text_col, id_col, num_partitions=num_partitions
    ).materialize()

    pairs = ngram_jaccard_pairs(
        exact, text_col=text_col, id_col=id_col,
        threshold=jaccard_threshold,
    )
    labels = component_labels_ds(
        exact.select_columns([id_col]), pairs, id_col,
        num_partitions=num_partitions,
        # the hash join below re-shuffles by id hash — skip the label
        # table's terminal range sort (a wasted full exchange at 2M rows)
        sort=False,
    )
    labeled = hash_join(
        exact,
        labels,
        on=id_col,
        num_partitions=safe_partitions(num_partitions, exact.count()),
    )

    def keep_and_split(b: pa.Table) -> pa.Table:
        keep = pc.equal(b[id_col], b["component"])
        t = b.filter(keep)
        return t.append_column("split", hash_split_labels(t["component"]))

    survivors = labeled.map_batches(keep_and_split, batch_format="pyarrow")
    return pack_bins_by_group_ds(
        survivors,
        "split",
        capacity=pack_capacity,
        num_partitions=num_partitions,
        text_col=text_col,
        id_col=id_col,
    )
