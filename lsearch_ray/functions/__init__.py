"""Large-scale training-data pipeline operations.

First-class components alongside the fulltext engine: deduplication
(exact, MinHash-LSH, n-gram Jaccard, SimHash, embedding cosine),
similarity search (exact + LSH-bucketed), text analysis (language id,
quality, token counting, fingerprints), multimodal plumbing, and skew
helpers for Zipf-keyed shuffles.
"""

from lsearch_ray.functions.ann import cosine_topk, knn_join  # noqa: F401
from lsearch_ray.functions.ann_ivf import (  # noqa: F401
    build_ivf_index,
    ivf_cosine_topk,
    ivf_search,
    train_centroids,
)
from lsearch_ray.functions.components import (  # noqa: F401
    connected_components_ds,
    drop_ids_from_pairs_ds,
)
from lsearch_ray.functions.joins import (  # noqa: F401
    broadcast_join,
    broadcast_semi_join,
    hash_join,
    sessionize,
)
from lsearch_ray.functions.ann_lsh import (  # noqa: F401
    ann_recall_table,
    embedding_dedup,
    lsh_cosine_topk,
    project_embeddings_ds,
)
from lsearch_ray.functions.bloom import (  # noqa: F401
    bloom_semi_join,
    build_bloom_filter,
)
from lsearch_ray.functions.dedup import (  # noqa: F401
    exact_dedup,
    exact_dedup_by_content,
)
from lsearch_ray.functions.minhash import (  # noqa: F401
    fuzzy_decontaminate,
    minhash_dedup,
    ngram_jaccard_dedup,
)
from lsearch_ray.functions.editdist import (  # noqa: F401
    deletion_variants,
    edit1_mask,
    edit1_matches_ds,
)
from lsearch_ray.functions.funnel import (  # noqa: F401
    audience_overlap_ds,
    funnel_stages,
    grouped_distinct_count_ds,
    retention_cohorts_ds,
)
from lsearch_ray.functions.grouped import (  # noqa: F401
    grouped_running_ds,
    grouped_topk_ds,
    rollup_sum_ds,
)
from lsearch_ray.functions.ngrams import (  # noqa: F401
    benchmark_grams,
    bigram_nll_ds,
    decontaminate_ds,
    doc_ngrams,
    doc_repetition_stats,
    ngram_counts_ds,
    ngram_novelty_ds,
    oov_rate_by_slice_ds,
    pmi_bigrams_ds,
    skipgram_counts_ds,
    term_clusters_ds,
)
from lsearch_ray.functions.dsir import dsir_weights_ds  # noqa: F401
from lsearch_ray.functions.bpe import (  # noqa: F401
    bpe_apply_ds,
    bpe_merges_ds,
)
from lsearch_ray.functions.keyness import (  # noqa: F401
    keyness_terms_ds,
    slice_jaccard_ds,
)
from lsearch_ray.functions.chunks import (  # noqa: F401
    chunk_exact_dedup,
    doc_chunks,
    doc_chunks_overlap,
    overlap_chunks_ds,
)
from lsearch_ray.functions.dupspans import (  # noqa: F401
    dup_shingle_stats_ds,
    dup_span_removal_ds,
)
from lsearch_ray.functions.lines import (  # noqa: F401
    boilerplate_lines_ds,
    line_dedup_ds,
    reflow_lines_ds,
)
from lsearch_ray.functions.kmeans import kmeans_assign  # noqa: F401
from lsearch_ray.functions.snippets import snippets_ds  # noqa: F401
from lsearch_ray.functions.winnow import (  # noqa: F401
    winnow_dup_pairs_ds,
    winnow_fingerprints_ds,
)
from lsearch_ray.functions.mixture import quota_sample  # noqa: F401
from lsearch_ray.functions.simhash import simhash_dedup  # noqa: F401
from lsearch_ray.functions.sampling import hash_sample, kmv_distinct  # noqa: F401
from lsearch_ray.functions.skew import salted_groupby_sum  # noqa: F401
from lsearch_ray.functions.windows import (  # noqa: F401
    sliding_window_agg,
    tumbling_window_agg,
)
from lsearch_ray.functions.textstats import (  # noqa: F401
    LangId,
    bpe_ish_token_count,
    doc_entropy_ds,
    extract_matches_ds,
    fingerprint,
    grouped_quality_percentile_gate_ds,
    quality_percentile_gate_ds,
    quality_stats,
    redact_ds,
    redact_text,
)
from lsearch_ray.functions.pagerank import (  # noqa: F401
    clustering_coeff_ds,
    doc_link_edges_ds,
    pagerank_ds,
    triangle_count_ds,
)
from lsearch_ray.functions.stats import (  # noqa: F401
    decayed_topk_ds,
    grouped_corr_ds,
)
from lsearch_ray.functions.stats import zscore_outliers_ds  # noqa: F401
from lsearch_ray.functions.quantiles import (  # noqa: F401
    grouped_mad_ds,
    grouped_weighted_median_ds,
)
from lsearch_ray.functions.sampling import (  # noqa: F401
    hash_rank_ds,
    negative_pairs_ds,
)
