"""Fulltext pipelines expressed purely in Ray Data Dataset transforms.

These are the SQL-oracle-checkable counterparts of the codec-backed index
engine (index/): same analyzer, same BM25 math, expressed as
map_batches → groupby → sort so DuckDB can verify them end-to-end
(``__ray_entry__.oracle_sql``). The codec path is verified separately by
rank-identity tests against golden.py.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from lsearch_ray.analyzer import term_counts_table, tokenize
from lsearch_ray.index.build import B, K1


def tf_triples(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """documents → (term, doc_id, tf, dl) triples (stateless, zero-copy)."""
    return docs_ds.map_batches(
        lambda b: term_counts_table(b, text_col, id_col), batch_format="pyarrow"
    )


def term_df(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Global document frequency per term.

    Triples are already unique per (term, doc) — i.e. the per-batch
    combiner has run inside ``term_counts_table`` — so the groupby only
    shuffles one row per (doc, distinct term).
    """
    from ray.data.aggregate import Count

    return (
        tf_triples(docs_ds, text_col, id_col)
        .select_columns(["term"])
        .groupby("term")
        .aggregate(Count(alias_name="df"))
    )


def doc_stats(docs_ds, text_col: str = "text", id_col: str = "doc_id") -> dict:
    """Global corpus stats {n_docs, avgdl, total_tokens} — tiny result."""
    from ray.data.aggregate import Count, Sum

    from lsearch_ray.analyzer import doc_lengths_table

    dl = docs_ds.map_batches(
        lambda b: doc_lengths_table(b, text_col, id_col), batch_format="pyarrow"
    )
    agg = dl.aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="total_tokens"))
    n, tot = int(agg["n_docs"]), int(agg["total_tokens"])
    return {"n_docs": n, "avgdl": tot / n if n else 0.0, "total_tokens": tot}


def bm25_topk_dataset(
    docs_ds,
    query: str,
    k: int = 10,
    mode: str = "or",
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = 4,
) -> pa.Table:
    """BM25 top-k as a pure Dataset composition (no codec, no actors).

    Plan: triples → broadcast-filter to query terms (semi-join against a
    tiny in-closure set — no shuffle) → per-row score contribution with
    broadcast (df, N, avgdl) → groupby(doc_id) sum → top-k sort.
    Scores are rounded (default 4 dp) because groupby-sum order is not
    deterministic across backends; the codec path keeps exact floats.
    """
    terms = sorted(set(tokenize(query)))
    if not terms:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    stats = doc_stats(docs_ds, text_col, id_col)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    triples = tf_triples(docs_ds, text_col, id_col)
    term_set = pa.array(terms)
    matched = triples.map_batches(
        lambda b: b.filter(pa.compute.is_in(b["term"], value_set=term_set)),
        batch_format="pyarrow",
    )
    # df per query term: tiny aggregate (≤ len(terms) rows)
    from ray.data.aggregate import Count

    df_rows = matched.groupby("term").aggregate(Count(alias_name="df")).take_all()
    dfs = {r["term"]: r["df"] for r in df_rows}
    idf = {
        t: math.log(1.0 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
    }

    def contrib(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        # vectorized idf lookup: dictionary-encode terms, index an idf array
        tcol = b["term"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        denc = tcol.dictionary_encode()
        idf_by_code = np.array(
            [idf[t] for t in denc.dictionary.to_pylist()], dtype=np.float64
        )
        w = idf_by_code[np.asarray(denc.indices)]
        c = w * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl)))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "contrib": pa.array(c, type=pa.float64()),
                "hit": pa.array(np.ones(len(c), dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    scored = (
        matched.map_batches(contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("contrib", alias_name="score"), Sum("hit", alias_name="nt"))
    )
    if mode == "and":
        n_req = len(terms)
        scored = scored.map_batches(
            lambda b: b.filter(pa.compute.equal(b["nt"], n_req)),
            batch_format="pyarrow",
        )
    if round_to is not None:
        # round BEFORE sort+limit: the oracle orders by the rounded alias,
        # so sorting unrounded floats could pick a different k-th doc when
        # two scores round to the same value (latent top-k boundary flake)
        def round_score(b: pa.Table) -> pa.Table:
            return b.set_column(
                b.schema.get_field_index("score"),
                "score",
                pa.compute.round(b["score"], ndigits=round_to),
            )

        scored = scored.map_batches(round_score, batch_format="pyarrow")
    top = (
        scored.sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    if len(top) == 0 or "score" not in top.columns:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    return pa.table(
        {
            "doc_id": pa.array(top["doc_id"], type=pa.int64()),
            "score": pa.array(top["score"], type=pa.float64()),
        }
    )
