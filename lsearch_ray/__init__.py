"""lsearch_ray — a Ray-Data-native fulltext index + BM25 query engine.

A from-scratch reimplementation of the *capabilities* of the reference
``jacksoncodispoti/lsearch`` (a single-threaded Rust CLI file-search engine,
see SURVEY.md), re-expressed Ray-Data-first for Common-Crawl-scale Parquet
corpora:

- ``analyzer``   — the lowercase + alphanumeric-split analyzer (generalizes the
  reference's ``to_ascii_lowercase`` fold at cli.rs:384-386 and substring
  counting at search.rs:274-276 into token counting).
- ``corpus``     — deterministic synthetic CC-style web-page table
  (url, warc_ts, html, text, lang) + the byte-identical ``extract_text``.
- ``stages``     — the reference's scalar operators (Is/Not/Has/Hasnt/More,
  content projections, run chaining) as vectorized Arrow batch transforms.
- ``index``      — (term, doc_id, tf) triple extraction, groupby(term) shuffle,
  delta+varint block-max posting codec, sharded Parquet index with
  per-partition lineage manifests, BM25 (k1=1.2, b=0.75) top-k query engine.
- ``functions``  — large-scale training-data-pipeline ops: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), text analysis
  (lang-id, quality, token counts, fingerprints), ANN similarity search,
  multimodal plumbing.

No module in this package calls ``ray.init()`` / ``ray.shutdown()``; session
ownership belongs to bench.py / CLI scripts / the test fixture.
"""

__version__ = "0.1.0"
