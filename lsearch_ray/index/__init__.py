"""Inverted-index build, posting codec, and BM25 query engine.

The Ray-Data-native generalization of the reference's count→sort→top ranking
(``More`` scorer search.rs:267-283, sort cli.rs:495-496) to a doc-sharded
inverted index with BM25 (k1=1.2, b=0.75) top-k, per the north star.
"""

from lsearch_ray.index.codec import (  # noqa: F401
    decode_posting_column,
    encode_shard_postings,
    varint_decode,
    varint_encode,
)
