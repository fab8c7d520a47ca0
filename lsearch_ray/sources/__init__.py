"""Corpus sources: pattern expansion + parquet readers."""

from lsearch_ray.sources.pages import (  # noqa: F401
    expand_pattern,
    read_pages,
    read_web_corpus,
)
