"""Large-scale training-data pipeline operations.

First-class components alongside the fulltext engine: deduplication
(exact + near-dup families), similarity search over embeddings, text
analysis, multimodal plumbing, skew-handling helpers.
"""

from lsearch_ray.functions.dedup import exact_dedup, exact_dedup_by_content  # noqa: F401
from lsearch_ray.functions.ann import cosine_topk  # noqa: F401
