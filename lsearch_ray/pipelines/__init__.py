"""End-to-end pipelines composed from stages/index/functions."""

from lsearch_ray.pipelines.fulltext import (  # noqa: F401
    bm25_prefix_topk_dataset,
    facet_counts_ds,
    bm25_topk_dataset,
    doc_stats,
    term_df,
    tf_triples,
)
