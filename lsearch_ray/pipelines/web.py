"""The flagship web pipeline: CC-style pages → index → BM25 serving.

North-star lifecycle (SURVEY.md §3):

build:  read_parquet(pages) → extract text from html (byte-identical per
        url — corpus.extract_text_batch) → normalize urls → stable doc
        ids → exact dedup by normalized url (hash-partitioned, reference
        canonicalize semantics cli.rs:454) → tokenize → doc-sharded
        triples → external shuffle → codec-encoded shards with manifests
        (index.build) — every stage a streaming Arrow batch transform.

query:  BatchSearcher actor pool over a query table, or the QueryEngine
        scatter-gather actors (index.search); both block-max pruned and
        rank-identical to golden.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.index.build import IndexMeta, build_index


def prepare_web_docs(pages_ds, *, extracted: bool = True):
    """Pages table → deduped (doc_id, text) docs ready for indexing.

    ``extracted=True`` derives text from ``html`` via the byte-identical
    extractor and *verifies the invariant* against the ``text`` column
    when both exist (poisoned rows — extraction mismatch — are dropped
    and counted rather than crashing, SURVEY.md §4 retries row).
    """
    from lsearch_ray.corpus import assign_doc_ids, extract_text_batch
    from lsearch_ray.functions.dedup import exact_dedup

    ds = pages_ds.map_batches(assign_doc_ids, batch_format="pyarrow")

    if extracted:

        def extract_and_check(b: pa.Table) -> pa.Table:
            b = extract_text_batch(b)
            ext = b["text_extracted"]
            if "text" in b.column_names:
                ok = pc.fill_null(pc.equal(ext, b["text"]), False)
                b = b.filter(ok)
                ext = b["text_extracted"]
            keep = [c for c in ("doc_id", "url_norm", "warc_ts", "lang") if c in b.column_names]
            out = b.select(keep)
            return out.append_column("text", ext)

        ds = ds.map_batches(extract_and_check, batch_format="pyarrow")
    else:
        ds = ds.map_batches(
            lambda b: b.select(
                [c for c in ("doc_id", "url_norm", "warc_ts", "lang", "text") if c in b.column_names]
            ),
            batch_format="pyarrow",
        )
    # exact dedup by normalized url: doc_id is a hash of url_norm, so
    # dedup by doc_id ≡ dedup by canonical url; keep earliest warc_ts
    order = ["warc_ts"] if "warc_ts" in ds.schema().names else ["doc_id"]
    return exact_dedup(ds, ["doc_id"], order)


def index_web_corpus(
    pages_ds,
    index_dir: str,
    *,
    num_shards: int = 8,
    extracted: bool = True,
    resume: bool = True,
) -> IndexMeta:
    docs = prepare_web_docs(pages_ds, extracted=extracted)
    return build_index(
        docs, index_dir, num_shards=num_shards, resume=resume
    )


def search_web_corpus(index_dir: str, queries: list[str], k: int = 10) -> pa.Table:
    """Answer a query list through the streaming actor-pool path."""
    import ray.data as rd

    from lsearch_ray.index.search import BatchSearcher

    qt = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": queries,
        }
    )
    out = rd.from_arrow(qt).map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=max(1, len(queries) // 2),
        concurrency=2,
    )
    return pa.Table.from_pylist(
        out.take_all(),
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("rank", pa.int32()),
                ("doc_id", pa.int64()),
                ("score", pa.float64()),
            ]
        ),
    )
