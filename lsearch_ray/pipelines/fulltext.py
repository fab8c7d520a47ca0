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
import pyarrow.compute as pc

from lsearch_ray.analyzer import term_counts_table, tokenize
from lsearch_ray.index.build import B, K1


def tf_triples(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """documents → (term, doc_id, tf, dl) triples (stateless, zero-copy)."""
    return docs_ds.map_batches(
        lambda b: term_counts_table(b, text_col, id_col), batch_format="pyarrow"
    )


def term_df(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Global document frequency per term.

    Triples are unique per (term, doc), so df(term) = its triple-row
    count; a per-batch ``value_counts`` partial collapses that to ONE row
    per (batch, distinct term) before the shuffle (vocab-per-batch rather
    than docs×terms — the combine-before-shuffle rule), then a
    groupby-sum finishes.
    """
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.dedup import value_counts_table

    def partial(b: pa.Table) -> pa.Table:
        return value_counts_table(b["term"], "term")

    return (
        tf_triples(docs_ds, text_col, id_col)
        .select_columns(["term"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="df"))
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
    weights: dict[str, float] | None = None,
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
    triples = tf_triples(docs_ds, text_col, id_col)
    term_set = pa.array(terms)

    # Corpus avgdl rides the SAME tokenize pass as the term filter: each
    # batch appends one sidecar row carrying its token total, so the
    # corpus is tokenized ONCE (doc_stats would be a whole second pass).
    # The sidecar is flagged by a dedicated ``_side`` marker column with
    # a NULL id — never an in-band id value, so no real doc id (of any
    # type, any sign) can collide with it. n_docs comes from the
    # metadata-only count().
    def match_and_count(b: pa.Table) -> pa.Table:
        t = b.filter(pa.compute.is_in(b["term"], value_set=term_set))
        t = t.append_column(
            "_side", pa.array(np.zeros(t.num_rows, dtype=np.int8))
        )
        total = pa.compute.sum(b["tf"]).as_py() or 0
        sidecar = pa.table(
            {
                "term": pa.array([""], type=b["term"].type),
                id_col: pa.array([None], type=b[id_col].type),
                "tf": pa.array([total], type=b["tf"].type),
                "dl": pa.array([0], type=b["dl"].type),
                "_side": pa.array([1], type=pa.int8()),
            }
        ).select(t.schema.names)
        return pa.concat_tables([t, sidecar])

    # materialize: `matched` is tiny (only the query terms' rows plus one
    # sidecar per batch) and is consumed THREE times (stats, df
    # aggregate, scoring) — without this the whole read+tokenize chain
    # re-executes for each consumer
    matched = triples.map_batches(
        match_and_count, batch_format="pyarrow"
    ).materialize()

    def split(b: pa.Table, sidecars: bool) -> pa.Table:
        is_side = pa.compute.equal(b["_side"], pa.scalar(1, pa.int8()))
        keep = b.filter(is_side if sidecars else pa.compute.invert(is_side))
        return keep.drop_columns(["_side"])

    n_docs = docs_ds.count()
    total_tokens = sum(
        r["tf"]
        for r in matched.map_batches(
            lambda b: split(b, True), batch_format="pyarrow"
        ).take_all()
    )
    avgdl = total_tokens / n_docs if n_docs else 0.0
    matched = matched.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    )
    return _bm25_score_matched(
        matched, terms, n_docs, avgdl, k, mode, id_col, round_to,
        weights=weights,
    )


def _bm25_score_matched(
    matched, terms, n_docs, avgdl, k, mode, id_col, round_to,
    weights: dict[str, float] | None = None,
) -> pa.Table:
    """Score a (term, id, tf, dl) Dataset already filtered to the query
    terms: broadcast idf lookup, groupby-sum, round-before-sort top-k.
    ``weights`` scales each term's idf (Rocchio-style expansion-term
    down-weighting; default 1.0 — plain BM25)."""
    # df per query term: tiny aggregate (≤ len(terms) rows)
    from ray.data.aggregate import Count

    df_rows = matched.groupby("term").aggregate(Count(alias_name="df")).take_all()
    dfs = {r["term"]: r["df"] for r in df_rows}
    weights = weights or {}
    idf = {
        t: weights.get(t, 1.0)
        * math.log(1.0 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
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
                "doc_id": b[id_col],
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


def bm25_prefix_topk_dataset(
    docs_ds,
    prefix: str,
    k: int = 10,
    max_expansions: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = 4,
) -> pa.Table:
    """Prefix (wildcard ``pre*``) BM25 top-k: the query names a term
    PREFIX; it expands against the corpus term dictionary to the top
    ``max_expansions`` matching terms by (df desc, term asc) — Lucene's
    multi-term rewrite cap, so a one-letter prefix over a web-scale
    vocabulary can never explode the query — then scores as OR-BM25
    over the expansion set (per-term idf, not constant-score).

    Plan: ONE tokenize pass (triples) filtered map-side by
    ``starts_with`` with the per-batch avgdl sidecar (the
    bm25_topk_dataset trick, so the corpus is never tokenized twice);
    expansion = term-df aggregate over MATCHED rows only + lossless
    per-block top-cap prune (a term lives in one block after the
    groupby) + tiny global sort/limit; scoring reuses
    :func:`_bm25_score_matched` on the matched rows re-filtered to the
    expansion set.
    """
    toks = tokenize(prefix)
    pre = toks[0] if toks else ""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )
    if not pre:
        return empty
    triples = tf_triples(docs_ds, text_col, id_col)

    def match_and_count(b: pa.Table) -> pa.Table:
        t = b.filter(pc.starts_with(b["term"], pattern=pre))
        t = t.append_column(
            "_side", pa.array(np.zeros(t.num_rows, dtype=np.int8))
        )
        total = pc.sum(b["tf"]).as_py() or 0
        sidecar = pa.table(
            {
                "term": pa.array([""], type=b["term"].type),
                id_col: pa.array([None], type=b[id_col].type),
                "tf": pa.array([total], type=b["tf"].type),
                "dl": pa.array([0], type=b["dl"].type),
                "_side": pa.array([1], type=pa.int8()),
            }
        ).select(t.schema.names)
        return pa.concat_tables([t, sidecar])

    matched = triples.map_batches(
        match_and_count, batch_format="pyarrow"
    ).materialize()

    def split(b: pa.Table, sidecars: bool) -> pa.Table:
        is_side = pc.equal(b["_side"], pa.scalar(1, pa.int8()))
        keep = b.filter(is_side if sidecars else pc.invert(is_side))
        return keep.drop_columns(["_side"])

    n_docs = docs_ds.count()
    total_tokens = sum(
        r["tf"]
        for r in matched.map_batches(
            lambda b: split(b, True), batch_format="pyarrow"
        ).take_all()
    )
    avgdl = total_tokens / n_docs if n_docs else 0.0
    matched = matched.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    ).materialize()

    from ray.data.aggregate import Count

    agg = matched.groupby("term").aggregate(Count(alias_name="df"))

    def prune(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("df", "descending"), ("term", "ascending")]
        )
        return b.take(idx.slice(0, max_expansions))

    top = (
        agg.map_batches(prune, batch_format="pyarrow")
        .sort(["df", "term"], descending=[True, False])
        .limit(max_expansions)
        .take_all()
    )
    terms = sorted(r["term"] for r in top)
    if not terms:
        return empty
    term_set = pa.array(terms)
    matched = matched.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=term_set)),
        batch_format="pyarrow",
    )
    return _bm25_score_matched(
        matched, terms, n_docs, avgdl, k, "or", id_col, round_to
    )


def facet_counts_ds(
    docs_ds,
    query: str,
    facet_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Search-facet aggregation: (facet, n_docs) per ``facet_col``
    value over the documents matching ANY query term (the search
    page's sidebar counts — language / source buckets next to the
    ranked hits).

    Pure map-side + one |facets|-row groupby: each batch tokenizes its
    docs once, flags rows with a term-set ``is_in`` hit, and emits
    per-facet partial counts — the corpus never shuffles and nothing
    doc-shaped leaves the batch. Null facet values count as ``''``.
    """
    from lsearch_ray.analyzer import flat_tokens_arrow

    terms = sorted(set(tokenize(query)))
    empty = pa.table(
        {
            "facet": pa.array([], type=pa.large_string()),
            "n_docs": pa.array([], type=pa.int64()),
        }
    )
    if not terms:
        import ray.data as rd

        return rd.from_arrow(empty)
    term_set = pa.array(terms)

    def partial(b: pa.Table) -> pa.Table:
        parents, flat = flat_tokens_arrow(b[text_col])
        if len(flat) == 0:
            return empty
        hit_tok = pc.is_in(flat, value_set=term_set).to_numpy(
            zero_copy_only=False
        )
        matched = np.zeros(b.num_rows, dtype=bool)
        matched[parents[hit_tok]] = True
        if not matched.any():
            return empty
        fc = pc.fill_null(pc.cast(b[facet_col], pa.large_string()), "")
        enc = fc.filter(pa.array(matched)).dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        counts = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        return pa.table(
            {"facet": enc.dictionary, "n_docs": pa.array(counts)}
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("facet")
        .sum("n_docs")
        .map_batches(
            lambda b: pa.table(
                {
                    "facet": b["facet"],
                    "n_docs": b["sum(n_docs)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("facet")
    )


def bm25_prf_topk_dataset(
    docs_ds,
    query: str,
    k: int = 10,
    *,
    fb_k: int = 5,
    n_exp: int = 3,
    exp_weight: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Pseudo-relevance-feedback BM25 — Rocchio-style automatic query
    expansion (public-knowledge IR technique; the reference engine has no
    feedback surface, SURVEY §2.9).

    Round 1 ranks with plain BM25 and takes the top ``fb_k`` feedback
    docs (rounded-score, doc-id tiebreak — the deterministic top-k
    convention). The ``n_exp`` non-query terms with the highest total tf
    inside the feedback docs (integer Σtf DESC, term ASC — engine-exact)
    expand the query; round 2 rescores over original ∪ expansion terms
    with each expansion term's idf scaled by ``exp_weight``.

    Scale shape: PRF is inherently two-phase, so this is three streaming
    passes over the corpus (round-1 match, feedback-doc term harvest,
    round-2 match), each a broadcast-filter with no extra shuffle; the
    harvest keeps only rows of the ``fb_k`` feedback docs, and the only
    driver-side state is the feedback-doc vocabulary.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    orig = sorted(set(tokenize(query)))
    if not orig:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    r1 = bm25_topk_dataset(
        docs_ds, query, k=fb_k, text_col=text_col, id_col=id_col
    )
    fb_ids = r1["doc_id"].to_pylist()

    exp: list[str] = []
    if fb_ids:
        fb_arr = pa.array(sorted(fb_ids), pa.int64())
        orig_arr = pa.array(orig)

        def harvest(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.is_in(b[id_col], value_set=fb_arr),
                pc.invert(pc.is_in(b["term"], value_set=orig_arr)),
            )
            t = b.filter(keep)
            return pa.table({"term": t["term"], "tf": t["tf"]})

        rows = (
            tf_triples(docs_ds, text_col, id_col)
            .map_batches(harvest, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("tf", alias_name="s"))
            .take_all()
        )
        rows.sort(key=lambda r: (-r["s"], r["term"]))
        exp = [r["term"] for r in rows[:n_exp]]

    return bm25_topk_dataset(
        docs_ds,
        " ".join(orig + exp),
        k=k,
        text_col=text_col,
        id_col=id_col,
        weights={t: exp_weight for t in exp},
    )


def more_like_this_dataset(
    docs_ds,
    source_id: int,
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> pa.Table:
    """Similar-document retrieval: top-k docs by TF-IDF cosine against one
    source doc (the classic "more like this" query).

    Weights are ``w(d,t) = tf · (ln N − ln df(t))`` — both lns over
    integer counts (the PMI parity discipline), the subtraction BEFORE
    the tf multiply, so every engine computes identical per-row products;
    cosine is ``dot / (sqrt(‖d‖²) · sqrt(‖src‖²))`` rounded before the
    top-k sort (the bm25 convention for sum-order independence).

    Scale shape: ONE tokenize pass (triples materialized, consumed by
    the df aggregate, the norm aggregate and the dot aggregate); the
    source vector and the df table are driver-side broadcasts (df is
    vocabulary-sized — swap to a hash join for vocabularies beyond the
    broadcast budget, see functions.joins.hash_join); the dot pass
    filters to the source's terms so only matching rows shuffle.
    """
    import math

    from ray.data.aggregate import Sum

    triples = tf_triples(docs_ds, text_col, id_col).materialize()
    n_docs = docs_ds.count()

    df_rows = (
        triples.map_batches(
            lambda b: pa.table({"term": b["term"]}), batch_format="pyarrow"
        )
        .groupby("term")
        .count()
        .take_all()
    )
    ln_n = math.log(n_docs)
    idf = {r["term"]: ln_n - math.log(int(r["count()"])) for r in df_rows}

    src_rows = triples.map_batches(
        lambda b: b.filter(pc.equal(b[id_col], pa.scalar(source_id))),
        batch_format="pyarrow",
    ).take_all()
    if not src_rows:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
    src_w = {r["term"]: r["tf"] * idf[r["term"]] for r in src_rows}
    src_norm = math.sqrt(sum(w * w for w in src_w.values()))
    if src_norm == 0.0:
        # every source term appears in every doc (idf 0) — cosine is
        # undefined (0/0); an unguarded division would emit NaN rows
        # that sort into the top-k
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
    src_terms = pa.array(sorted(src_w))

    def weights(b: pa.Table, lookup: dict, col_name: str) -> pa.Table:
        tcol = b["term"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        denc = tcol.dictionary_encode()
        by_code = np.array(
            [lookup[t] for t in denc.dictionary.to_pylist()],
            dtype=np.float64,
        )
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = tf * by_code[np.asarray(denc.indices)]
        return pa.table({id_col: b[id_col], col_name: pa.array(w)})

    norms = (
        triples.map_batches(
            lambda b: (
                lambda t: pa.table(
                    {id_col: t[id_col], "c": pc.multiply(t["w"], t["w"])}
                )
            )(weights(b, idf, "w")),
            batch_format="pyarrow",
        )
        .groupby(id_col)
        .aggregate(Sum("c", alias_name="n2"))
        .materialize()
    )

    def dot_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["term"], value_set=src_terms))
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], b[id_col].type),
                 "c": pa.array([], pa.float64())}
            )
        wd = weights(t, idf, "w")["w"]
        tcol = t["term"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        denc = tcol.dictionary_encode()
        sw = np.array(
            [src_w[x] for x in denc.dictionary.to_pylist()], dtype=np.float64
        )
        c = wd.to_numpy(zero_copy_only=False) * sw[np.asarray(denc.indices)]
        return pa.table({id_col: t[id_col], "c": pa.array(c)})

    dots = (
        triples.map_batches(dot_partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("c", alias_name="dot"))
        .materialize()
    )
    if dots.count() == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        # n2 == 0 docs (all terms idf 0) have undefined cosine — drop
        # them rather than divide 0/0 into NaN (SQL twin: WHERE n2 > 0)
        b = b.filter(
            pc.greater(b["n2"], pa.scalar(0.0))
        )
        dot = b["dot"].to_numpy(zero_copy_only=False)
        n2 = b["n2"].to_numpy(zero_copy_only=False)
        cos = dot / (np.sqrt(n2) * src_norm)
        out = pa.table(
            {
                "doc_id": pc.cast(b[id_col], pa.int64()),
                "cos_sim": pa.array(
                    np.floor(cos * 10.0**round_to + 0.5) / 10.0**round_to
                ),
            }
        )
        return out.filter(pc.not_equal(out["doc_id"], pa.scalar(source_id)))

    top = (
        dots.join(
            norms,
            join_type="inner",
            num_partitions=max(
                1, min(8, dots.count() // 64 or 1)
            ),
            on=(id_col,),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort(["cos_sim", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "doc_id": pa.array(top["doc_id"], pa.int64()),
            "cos_sim": pa.array(top["cos_sim"], pa.float64()),
        }
    )


def rrf_fuse(
    ranked_lists: list[pa.Table],
    *,
    k: int = 10,
    rrf_k: int = 60,
    scale: int = 10**6,
    id_col: str = "doc_id",
) -> pa.Table:
    """Reciprocal-rank fusion of top-K lists (Cormack et al. '09), the
    standard hybrid-retrieval combiner, in integer micro units so any
    engine replays it exactly:

        fused(d) = Σ over lists containing d of  scale // (rrf_k + rank_d)

    Each input is a table whose ROW ORDER is its ranking (rank = 1-based
    position). Output: top-``k`` ``(doc_id, rrf_micro)`` by
    (score DESC, id ASC).

    Driver-side by design: RRF fuses top-K lists (bounded, typically
    ≤ 1000 rows each), not corpora — the distributed work is producing
    the input rankings (BM25 scatter-gather, ANN probes); fusing them is
    O(K · n_lists).
    """
    scores: dict = {}
    for lst in ranked_lists:
        ids = lst[id_col].to_pylist()
        for rank, d in enumerate(ids, start=1):
            scores[d] = scores.get(d, 0) + scale // (rrf_k + rank)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in top], pa.int64()),
            "rrf_micro": pa.array([s for _, s in top], pa.int64()),
        }
    )


def tfidf_top_terms(
    docs_ds,
    k: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    broadcast_df: bool = True,
):
    """Per-document top-k keyword extraction by tf·idf.

    Returns a Dataset of (doc_id, term, rnk, tfidf): each doc's k
    highest-tf·idf terms, idf = ln(n_docs/df), tfidf rounded half-away
    to 4 dp BEFORE ranking (ties break on term asc — a deterministic
    total order shared with the SQL oracle).

    Scale plan: triples and df are both derived map-side; the df table
    joins back in either of two shapes — ``broadcast_df=True`` collects
    the vocab-sized (term, df) table once and ships it per task (right
    whenever vocab ≪ corpus, the common web case), else a partitioned
    hash join on term (``functions.joins.hash_join``) for vocabularies
    too big to broadcast. The per-doc top-k then hash-partitions on
    doc_id (the ``exact_dedup`` pattern): ONE shuffle, and within each
    partition a single mergesort + run-boundary rank pass — no per-doc
    Python. idf uses ``math.log`` per distinct df (libm parity with
    DuckDB's ln; np.log can differ in the last ulp).
    """
    import pandas as pd

    from lsearch_ray.functions.dedup import arrow_out, partition_ids

    from ray.data.aggregate import Count

    n_docs = docs_ds.count()  # metadata-only on parquet sources
    # tokenize ONCE: df is derived from the materialized triples rather
    # than a second tf_triples pass (term_df would re-run the tokenizer
    # over the whole corpus — the dominant map-side cost — a second time)
    trip = tf_triples(docs_ds, text_col, id_col).materialize()
    df_ds = (
        trip.select_columns(["term"]).groupby("term").aggregate(Count(alias_name="df"))
    )
    if broadcast_df:
        rows = df_ds.take_all()
        df_tab = pa.table(
            {
                # triples carry large_string terms (zero-copy tokenizer
                # output); the join key types must match exactly
                "term": pa.array(
                    [r["term"] for r in rows], type=pa.large_string()
                ),
                "df": pa.array([r["df"] for r in rows], type=pa.int64()),
            }
        )
        from lsearch_ray.functions.joins import broadcast_join

        joined = broadcast_join(
            trip.select_columns(["term", id_col, "tf"]), df_tab, on="term"
        )
    else:
        from lsearch_ray.functions.joins import hash_join

        # the groupby aggregate narrows term to string; the join key
        # types must match the triples' large_string exactly
        df_wide = df_ds.map_batches(
            lambda b: pa.table(
                {
                    "term": b["term"].cast(pa.large_string()),
                    "df": b["df"],
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            trip.select_columns(["term", id_col, "tf"]),
            df_wide,
            on="term",
            num_partitions=num_partitions,
        )

    def score(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = b["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(dfv, return_inverse=True)
        idf = np.array(
            [math.log(n_docs / int(d)) for d in uniq], dtype=np.float64
        )
        x = tf * idf[inv]
        tfidf = np.floor(x * 1e4 + 0.5) / 1e4  # half-away, 4 dp
        return pa.table(
            {
                id_col: b[id_col],
                "term": b["term"],
                "tfidf": pa.array(tfidf, type=pa.float64()),
                "__part": pa.array(
                    partition_ids(b, [id_col], num_partitions)
                ),
            }
        )

    def topk_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            [id_col, "tfidf", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        ids = g[id_col].to_numpy()
        n = len(ids)
        if n == 0:
            return arrow_out(
                pd.DataFrame(
                    {
                        id_col: np.empty(0, dtype=np.int64),
                        "term": np.empty(0, dtype=object),
                        "rnk": np.empty(0, dtype=np.int64),
                        "tfidf": np.empty(0, dtype=np.float64),
                    }
                )
            )
        # rank within doc runs: position minus each run's start offset
        starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
        run_of = np.cumsum(np.concatenate(([False], ids[1:] != ids[:-1])))
        rnk = np.arange(n, dtype=np.int64) - starts[run_of] + 1
        keep = rnk <= k
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: ids[keep],
                    "term": g["term"].to_numpy()[keep],
                    "rnk": rnk[keep],
                    "tfidf": g["tfidf"].to_numpy()[keep],
                }
            )
        )

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(topk_partition, batch_format="pandas")
    )


def unigram_nll(
    docs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    broadcast_costs: bool = True,
):
    """Per-document negative log-likelihood under the corpus unigram LM —
    the perplexity-style quality signal of a training-data pipeline (docs
    whose tokens are improbable under the corpus distribution score high).

    Returns a Dataset of (doc_id, n_tokens, nll_micro):
    ``cost(t) = floor(-ln(tf_global(t) / T) * 1e6 + 0.5)`` in integer
    micro-nats (T = total corpus tokens), ``nll_micro = Σ_t tf·cost(t)``.
    Each term's log-cost is rounded to an INTEGER before the weighted
    sum, so the per-doc totals are pure integer arithmetic — bit-exact
    across engines regardless of summation order (the float-sum ulp
    hazard that forces fixed-point outputs elsewhere never arises).

    Scale plan: one tokenize pass (triples materialized, consumed by the
    totals aggregate and the scoring join); term totals are vocab-sized —
    ``broadcast_costs=True`` ships the (term, cost) table once per task,
    else a partitioned hash join on term. Scoring is a per-batch partial
    groupby (one row per (doc, batch) through the final doc_id shuffle).
    ln via ``math.log`` per DISTINCT total (libm parity with DuckDB's
    ln; np.log can differ in the last ulp).
    """
    from ray.data.aggregate import Sum

    trip = tf_triples(docs_ds, text_col, id_col).materialize()
    tot_ds = trip.select_columns(["term", "tf"]).groupby("term").sum("tf")

    def cost_table(terms: pa.Array, tfg: np.ndarray, total: int) -> pa.Table:
        uniq, inv = np.unique(tfg, return_inverse=True)
        c = np.array(
            [math.floor(-math.log(int(g) / total) * 1e6 + 0.5) for g in uniq],
            dtype=np.int64,
        )
        return pa.table(
            {
                # triples carry large_string terms (zero-copy tokenizer
                # output); the join key types must match exactly
                "term": terms.cast(pa.large_string()),
                "__cost": pa.array(c[inv], type=pa.int64()),
            }
        )

    if broadcast_costs:
        rows = tot_ds.take_all()
        total = sum(int(r["sum(tf)"]) for r in rows)
        costs = cost_table(
            pa.array([r["term"] for r in rows]),
            np.array([r["sum(tf)"] for r in rows], dtype=np.int64),
            total,
        )
        from lsearch_ray.functions.joins import broadcast_join

        joined = broadcast_join(trip, costs, on="term")
    else:
        tot_ds = tot_ds.materialize()
        # Dataset.sum returns None on an empty dataset — guard before int()
        # (an empty corpus yields no term rows, so cost_table never runs).
        total = int(tot_ds.sum("sum(tf)") or 0)
        costs_ds = tot_ds.map_batches(
            lambda b: cost_table(
                b["term"].combine_chunks(),
                b["sum(tf)"].to_numpy(zero_copy_only=False).astype(np.int64),
                total,
            ),
            batch_format="pyarrow",
        )
        from lsearch_ray.functions.joins import hash_join

        joined = hash_join(
            trip, costs_ds, on="term", num_partitions=num_partitions
        )

    def partial(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        contrib = tf * b["__cost"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                id_col: b[id_col],
                "tf": pa.array(tf, type=pa.int64()),
                "contrib": pa.array(contrib, type=pa.int64()),
            }
        )
        return t.group_by(id_col).aggregate(
            [("tf", "sum"), ("contrib", "sum")]
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("tf_sum", alias_name="n_tokens"),
            Sum("contrib_sum", alias_name="nll_micro"),
        )
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_tokens": b["n_tokens"].cast(pa.int64()),
                "nll_micro": b["nll_micro"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def perplexity_buckets_ds(
    docs_ds,
    *,
    group_col: str = "lang",
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    per-doc perplexity proxy under the corpus unigram LM, bucketed PER
    GROUP (language) into ``n_buckets`` — bucket 0 = head (most
    fluent), ``n_buckets−1`` = tail.

    Kernel (integer end to end, mirrored by the SQL twin):

    - ``ppl_milli = (nll_micro · 1000) // n_tokens`` (the per-token NLL
      of :func:`unigram_nll` in milli-micro-nats; floor division);
    - threshold ``t_b`` = the group's ppl_milli at 0-indexed ascending
      rank ``(b · (n_g − 1)) // n_buckets`` for b in 1..n_buckets−1;
    - ``bucket`` = count of thresholds STRICTLY below the doc's
      ppl_milli (a doc at a threshold falls to the lower bucket).

    Docs that tokenize to nothing have no perplexity and are excluded
    (the unigram_nll convention). Returns a Dataset of
    ``(id_col, group_col, n_tokens, ppl_milli, bucket)``.

    Scale plan: unigram_nll (one tokenize pass, vocab-bounded cost
    join) → one hash join on the doc id to attach the group → one
    group-keyed shuffle producing the |groups|·(n_buckets−1)-row
    threshold table (a bounded aggregate, broadcast into the final map
    pass). No global sort, nothing doc-shaped on the driver — the
    all-docs rank that NTILE would need is replaced by the two order
    statistics per group.
    """
    from lsearch_ray.functions.joins import cpu_capped_partitions, hash_join
    from lsearch_ray.functions.quantiles import grouped_rank_values_ds

    if n_buckets < 2:
        raise ValueError("n_buckets must be at least 2")

    nll = unigram_nll(
        docs_ds,
        text_col=text_col,
        id_col=id_col,
        num_partitions=num_partitions,
    )
    grp = docs_ds.select_columns([id_col, group_col])
    joined = hash_join(
        nll, grp, on=id_col,
        num_partitions=cpu_capped_partitions(num_partitions),
    )

    def add_ppl(b: pa.Table) -> pa.Table:
        n = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["nll_micro"].to_numpy(zero_copy_only=False).astype(np.int64)
        ppl = (v * 1000) // n  # n ≥ 1: nll rows exist only for token-ful docs
        return pa.table(
            {
                id_col: b[id_col],
                group_col: b[group_col],
                "n_tokens": pa.array(n, type=pa.int64()),
                "ppl_milli": pa.array(ppl, type=pa.int64()),
            }
        )

    ppl = joined.map_batches(add_ppl, batch_format="pyarrow").materialize()

    fracs = [(b, n_buckets) for b in range(1, n_buckets)]
    th_rows = grouped_rank_values_ds(
        ppl, group_col, "ppl_milli", fracs, num_partitions=num_partitions
    ).take_all()  # bounded: |groups| × (n_buckets − 1) rows
    by_group: dict = {}
    for r in th_rows:
        by_group.setdefault(r[group_col], []).append(
            (int(r["num"]), int(r["value"]))
        )
    thresholds = {
        g: np.array([v for _, v in sorted(pairs)], dtype=np.int64)
        for g, pairs in by_group.items()
    }

    def assign(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vals = b["ppl_milli"].to_numpy(zero_copy_only=False)
        bucket = np.zeros(len(vals), dtype=np.int64)
        for g, t in thresholds.items():
            m = pc.equal(b[group_col], g).to_numpy(zero_copy_only=False)
            if m.any():
                # count of thresholds < v  (ties fall to the lower bucket)
                bucket[m] = np.searchsorted(t, vals[m], side="left")
        return b.append_column("bucket", pa.array(bucket, type=pa.int64()))

    return ppl.map_batches(assign, batch_format="pyarrow")


def bm25f_topk_dataset(
    docs_ds,
    query: str,
    k: int = 10,
    *,
    title_tokens: int = 5,
    title_weight: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = 4,
) -> pa.Table:
    """Field-weighted BM25 top-k (simplified BM25F, the Lucene-style
    field boost the flat scorer lacks): the first ``title_tokens``
    tokens of each doc form a pseudo-title field whose occurrences carry
    ``title_weight`` EXTRA votes —

        wtf(term, doc) = tf + title_weight · tf_title
        wdl(doc)       = dl + title_weight · min(dl, title_tokens)

    scored with the standard BM25 saturation over the weighted
    quantities (Robertson & Zaragoza 2009 §5: per-field weighted tf with
    the length normalization folded into the weighted dl). idf stays
    document-level (df = docs containing the term anywhere). Integer
    weights keep wtf/wdl exact, so score parity with the SQL twin holds
    at the shared 4-dp rounding.

    Same plan shape as :func:`bm25_topk_dataset`: ONE tokenize pass
    emits the query-filtered weighted triples plus a per-batch weighted
    total-dl sidecar (no second corpus pass), then the shared broadcast
    idf → groupby-sum → round-before-sort top-k finisher.
    """
    from lsearch_ray.analyzer import flat_tokens_arrow

    terms = sorted(set(tokenize(query)))
    if not terms:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    term_set = pa.array(terms)
    T, tw = title_tokens, title_weight

    def weighted_triples(b: pa.Table) -> pa.Table:
        n = b.num_rows
        parents, flat = flat_tokens_arrow(b[text_col])
        counts = (
            np.bincount(parents, minlength=n).astype(np.int64)
            if len(parents)
            else np.zeros(n, dtype=np.int64)
        )
        wdl_doc = counts + tw * np.minimum(counts, T)
        sidecar = pa.table(
            {
                "term": pa.array([""], type=pa.large_string()),
                id_col: pa.array([None], type=pa.int64()),
                "tf": pa.array([int(wdl_doc.sum())], type=pa.int64()),
                "dl": pa.array([0], type=pa.int64()),
                "_side": pa.array([1], type=pa.int8()),
            }
        )
        if len(flat) == 0:
            return sidecar
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = np.arange(len(flat), dtype=np.int64) - starts[parents]
        keep = pc.is_in(flat, value_set=term_set)
        km = keep.to_numpy(zero_copy_only=False)
        if not km.any():
            return sidecar
        ids = (
            b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        t = pa.table(
            {
                "term": flat.filter(keep).cast(pa.large_string()),
                id_col: pa.array(ids[parents[km]]),
                "one": pa.array(np.ones(int(km.sum()), dtype=np.int64)),
                "tft": pa.array((pos[km] < T).astype(np.int64)),
            }
        )
        g = t.group_by(["term", id_col]).aggregate(
            [("one", "sum"), ("tft", "sum")]
        )
        tf = g["one_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        tft = g["tft_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        gid = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        row_of = order[np.searchsorted(ids, gid, sorter=order)]
        rows = pa.table(
            {
                "term": g["term"],
                id_col: g[id_col],
                "tf": pa.array(tf + tw * tft),
                "dl": pa.array(wdl_doc[row_of]),
                "_side": pa.array(np.zeros(len(tf), dtype=np.int8)),
            }
        )
        return pa.concat_tables([rows, sidecar])

    matched = docs_ds.map_batches(
        weighted_triples, batch_format="pyarrow"
    ).materialize()

    def split(b: pa.Table, sidecars: bool) -> pa.Table:
        is_side = pc.equal(b["_side"], pa.scalar(1, pa.int8()))
        keep = b.filter(is_side if sidecars else pc.invert(is_side))
        return keep.drop_columns(["_side"])

    n_docs = docs_ds.count()
    total_wdl = sum(
        r["tf"]
        for r in matched.map_batches(
            lambda b: split(b, True), batch_format="pyarrow"
        ).take_all()
    )
    avgdl = total_wdl / n_docs if n_docs else 0.0
    matched = matched.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    )
    return _bm25_score_matched(
        matched, terms, n_docs, avgdl, k, "or", id_col, round_to
    )


def bm25_fuzzy_topk_dataset(
    docs_ds,
    term: str,
    k: int = 10,
    max_expansions: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = 4,
) -> pa.Table:
    """Fuzzy-term BM25 top-k (Lucene ``term~1``): the query term expands
    against the corpus dictionary to the top ``max_expansions`` terms
    within Levenshtein distance ≤ 1, by (df desc, term asc) — the same
    binding multi-term rewrite cap as :func:`bm25_prefix_topk_dataset`
    — then scores as OR-BM25 over the expansion set (per-term idf).
    The retrieval-side composition of the spell-suggestion primitive
    (functions.editdist): a misspelled query still ranks documents.

    Plan: identical to the prefix pipeline except the map-side match
    runs the vectorized edit1 alignment kernel on each batch's term
    DICTIONARY (length-prefiltered dictionary_encode — candidates per
    batch are vocabulary-sized, not row-sized), never per row.
    """
    from lsearch_ray.functions.editdist import edit1_mask

    toks = tokenize(term)
    q = toks[0] if toks else ""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )
    if not q:
        return empty
    qlen = len(q.encode())
    triples = tf_triples(docs_ds, text_col, id_col)

    def match_and_count(b: pa.Table) -> pa.Table:
        tcol = b["term"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        denc = tcol.dictionary_encode()
        vocab = denc.dictionary
        vl = pc.binary_length(vocab).to_numpy(zero_copy_only=False)
        near = np.abs(vl.astype(np.int64) - qlen) <= 1
        ok_codes = np.zeros(len(vocab), dtype=bool)
        if near.any():
            names = vocab.filter(pa.array(near)).to_pylist()
            ok_codes[np.flatnonzero(near)] = edit1_mask(
                [q] * len(names), names
            )
        keep = ok_codes[np.asarray(denc.indices)]
        t = b.filter(pa.array(keep))
        t = t.append_column(
            "_side", pa.array(np.zeros(t.num_rows, dtype=np.int8))
        )
        total = pc.sum(b["tf"]).as_py() or 0
        sidecar = pa.table(
            {
                "term": pa.array([""], type=b["term"].type),
                id_col: pa.array([None], type=b[id_col].type),
                "tf": pa.array([total], type=b["tf"].type),
                "dl": pa.array([0], type=b["dl"].type),
                "_side": pa.array([1], type=pa.int8()),
            }
        ).select(t.schema.names)
        return pa.concat_tables([t, sidecar])

    matched = triples.map_batches(
        match_and_count, batch_format="pyarrow"
    ).materialize()

    def split(b: pa.Table, sidecars: bool) -> pa.Table:
        is_side = pc.equal(b["_side"], pa.scalar(1, pa.int8()))
        keep = b.filter(is_side if sidecars else pc.invert(is_side))
        return keep.drop_columns(["_side"])

    n_docs = docs_ds.count()
    total_tokens = sum(
        r["tf"]
        for r in matched.map_batches(
            lambda b: split(b, True), batch_format="pyarrow"
        ).take_all()
    )
    avgdl = total_tokens / n_docs if n_docs else 0.0
    matched = matched.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    ).materialize()

    from ray.data.aggregate import Count

    agg = matched.groupby("term").aggregate(Count(alias_name="df"))

    def prune(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("df", "descending"), ("term", "ascending")]
        )
        return b.take(idx.slice(0, max_expansions))

    top = (
        agg.map_batches(prune, batch_format="pyarrow")
        .sort(["df", "term"], descending=[True, False])
        .limit(max_expansions)
        .take_all()
    )
    terms = sorted(r["term"] for r in top)
    if not terms:
        return empty
    term_set = pa.array(terms)
    matched = matched.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=term_set)),
        batch_format="pyarrow",
    )
    return _bm25_score_matched(
        matched, terms, n_docs, avgdl, k, "or", id_col, round_to
    )


def index_profile_ds(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Posting-list skew profile: terms and posting mass per log2
    document-frequency bucket — the operational report behind shard
    sizing and the salted-repartition hot-term threshold (SURVEY §4
    "head-term skew"; the build pipeline's ~2-4M-triples/shard rule is
    tuned from exactly this histogram).

    Returns (df_bucket:int64, n_terms:int64, n_postings:int64) where
    df_bucket = floor(log2(df)), n_postings = Σ df over the bucket's
    terms. One combiner term shuffle (term_df) + a ≤64-row groupby;
    nothing vocabulary-sized leaves the cluster.
    """
    from ray.data.aggregate import Sum

    def bucket_partial(b: pa.Table) -> pa.Table:
        df = b["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # floor(log2(df)) for df ≥ 1, exact via frexp (df < 2^53 — a
        # document frequency, bounded by corpus doc count)
        bucket = (
            np.frexp(df.astype(np.float64))[1].astype(np.int64) - 1
        )
        t = pa.table(
            {
                "df_bucket": pa.array(bucket),
                "one": pa.array(np.ones(len(df), dtype=np.int64)),
                "df": pa.array(df),
            }
        )
        g = t.group_by(["df_bucket"]).aggregate(
            [("one", "sum"), ("df", "sum")]
        )
        return pa.table(
            {
                "df_bucket": g["df_bucket"],
                "n_terms": g["one_sum"].cast(pa.int64()),
                "n_postings": g["df_sum"].cast(pa.int64()),
            }
        )

    return (
        term_df(docs_ds, text_col, id_col)
        .map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("df_bucket")
        .aggregate(
            Sum("n_terms", alias_name="n_terms"),
            Sum("n_postings", alias_name="n_postings"),
        )
        .sort("df_bucket")
    )


def bm25_collapse_topk_dataset(
    docs_ds,
    query: str,
    k: int = 10,
    *,
    pool: int = 30,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Near-duplicate-collapsed search results (the "omitted similar
    results" feature): take the BM25 top-``pool`` candidates, keep only
    the best-ranked doc of each near-dup cluster, return the top-k
    survivors. Clusters are the corpus-wide exact-verified n-gram
    Jaccard components (the dup_components contract) — in a production
    engine those labels are computed once at index-build time and this
    query only joins against them.

    Scale shape: the candidate pool is k-bounded (driver holds ≤ pool
    rows); cluster labels for the pool come back through a map-side
    ``is_in`` filter over the label Dataset — the corpus-wide label
    table itself never reaches the driver. Collapse order is
    (score desc, id asc), matching the rounded-score BM25 contract.
    """
    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs

    top = bm25_topk_dataset(
        docs_ds, query, k=pool, text_col=text_col, id_col=id_col
    )
    if top.num_rows == 0:
        return top
    pool_ids = top[id_col]
    pairs = ngram_jaccard_pairs(
        docs_ds, text_col=text_col, id_col=id_col, threshold=threshold
    )
    labels = component_labels_ds(
        docs_ds, pairs, id_col, num_partitions=8, sort=False
    )
    lab_rows = labels.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=pool_ids)),
        batch_format="pyarrow",
    ).take_all()  # <= pool rows
    comp = {int(r[id_col]): int(r["component"]) for r in lab_rows}

    ids = top[id_col].to_pylist()
    scores = top["score"].to_pylist()
    seen: set[int] = set()
    out_ids: list[int] = []
    out_scores: list[float] = []
    # `top` is already (score desc, id asc) ordered by contract
    for i, s in zip(ids, scores):
        c = comp.get(int(i), int(i))
        if c in seen:
            continue
        seen.add(c)
        out_ids.append(int(i))
        out_scores.append(float(s))
        if len(out_ids) == k:
            break
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "score": pa.array(out_scores, pa.float64()),
        }
    )


def regex_rank_ds(
    docs_ds,
    pattern: str,
    k: int = 20,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Regex-ranked retrieval: score = 1 + count of non-overlapping RE2
    matches of ``pattern`` in the doc, top-k by (score desc, id asc) —
    the regex generalization of the reference's ``More`` scorer
    (`search.rs:267-283`: 1 + literal substring count; SURVEY §2 R1).
    Pure map-side (one ``count_substring_regex`` kernel per batch +
    per-block lossless top-k prune), one k-row sort. Both Arrow and
    DuckDB run RE2, so the SQL twin replays the pattern exactly.
    """
    from lsearch_ray.functions.ngrams import _block_topk

    def score(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = pc.count_substring_regex(txt, pattern=pattern)
        t = pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                "score": pc.add(n.cast(pa.int64()), pa.scalar(1)).cast(
                    pa.int64()
                ),
            }
        )
        return _block_topk(
            t, k, [("score", "descending"), (id_col, "ascending")]
        )

    out = (
        docs_ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            id_col: pa.array(out[id_col], pa.int64()),
            "score": pa.array(out["score"], pa.int64()),
        }
    )


def related_terms_ds(
    docs_ds,
    seed_term: str,
    k: int = 5,
    *,
    text_col: str = "text",
):
    """Query suggestion by corpus continuation: the top-k words that
    FOLLOW ``seed_term`` by bigram count, ordered (n desc, w2 asc) —
    the "related searches" box next to the ranked hits. One combiner
    bigram-count shuffle filtered map-side to the seed's continuations
    (so only the seed's fan-out, not the bigram type table, reaches the
    sort) + a k-row sort.
    """
    from lsearch_ray.functions.ngrams import (
        GRAM_SEP,
        _block_topk,
        _count_partial,
    )

    seed = tokenize(seed_term)
    w1 = seed[0] if seed else ""
    empty = pa.table(
        {
            "w2": pa.array([], pa.large_string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if not w1:
        return empty
    prefix = w1 + GRAM_SEP

    def grams(b: pa.Table) -> pa.Table:
        t = _count_partial(b, 2, text_col)
        return t.filter(pc.starts_with(t["gram"], pattern=prefix))

    agg = (
        docs_ds.map_batches(grams, batch_format="pyarrow")
        .groupby("gram")
        .sum("n")
    )

    def split(b: pa.Table) -> pa.Table:
        g = b["gram"].combine_chunks().cast(pa.large_string())
        w2 = pc.utf8_slice_codeunits(g, len(prefix), 1 << 30)
        t = pa.table({"w2": w2, "n": b["sum(n)"].cast(pa.int64())})
        return _block_topk(t, k, [("n", "descending"), ("w2", "ascending")])

    out = (
        agg.map_batches(split, batch_format="pyarrow")
        .sort(["n", "w2"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "w2": pa.array(out["w2"], pa.large_string()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def complete_prefix_ds(
    docs_ds,
    prefix: str,
    k: int = 8,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Type-ahead completion: the top-k dictionary terms starting with
    ``prefix``, ranked (df desc, term asc) — the suggest-as-you-type
    box over the same term dictionary the prefix-wildcard query
    expands against. One combiner df shuffle + a map-side
    ``starts_with`` filter + lossless per-block top-k prune; returns
    (term, df)."""
    from lsearch_ray.functions.ngrams import _block_topk

    toks = tokenize(prefix)
    pre = toks[0] if toks else ""
    empty = pa.table(
        {
            "term": pa.array([], pa.large_string()),
            "df": pa.array([], pa.int64()),
        }
    )
    if not pre:
        return empty

    def prune(b: pa.Table) -> pa.Table:
        t = b.filter(pc.starts_with(b["term"], pattern=pre))
        t = pa.table(
            {
                "term": t["term"].combine_chunks().cast(pa.large_string()),
                "df": t["df"].cast(pa.int64()),
            }
        )
        return _block_topk(t, k, [("df", "descending"), ("term", "ascending")])

    out = (
        term_df(docs_ds, text_col, id_col)
        .map_batches(prune, batch_format="pyarrow")
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "term": pa.array(out["term"], pa.large_string()),
            "df": pa.array(out["df"], pa.int64()),
        }
    )


def percolate_ds(
    docs_ds,
    stored_queries: dict[int, str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Stored-query matching (the percolator / alerting primitive,
    reversing the usual search direction): every incoming doc is tested
    against a registry of conjunctive term queries; a doc matches a
    query when it contains EVERY query term (the reference's
    conjunctive short-circuit semantics, `cli.rs:405-408`, applied
    doc→query). Returns (doc_id, query_id) match pairs.

    Scale shape: the stored-query registry is tiny and broadcast in
    the map closure (alerting registries are thousands of rows — MBs);
    each batch tokenizes its docs ONCE, collapses to distinct
    (doc, term) pairs, and answers every query with one ``is_in`` +
    ``bincount`` — per-query work is O(distinct pairs), no shuffle,
    nothing leaves the batch but the match pairs.
    """
    from lsearch_ray.analyzer import flat_tokens_arrow

    compiled = {
        int(qid): sorted(set(tokenize(q)))
        for qid, q in stored_queries.items()
    }
    compiled = {qid: ts for qid, ts in compiled.items() if ts}

    def match(b: pa.Table) -> pa.Table:
        n = b.num_rows
        parents, flat = flat_tokens_arrow(b[text_col])
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "query_id": pa.array([], pa.int64()),
            }
        )
        if len(flat) == 0 or not compiled:
            return empty
        # distinct (doc, term) pairs once per batch
        t = pa.table({"p": pa.array(parents), "term": flat})
        g = t.group_by(["p", "term"]).aggregate([])
        gp = g["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        gterm = g["term"]
        if isinstance(gterm, pa.ChunkedArray):
            gterm = gterm.combine_chunks()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_doc: list[np.ndarray] = []
        out_q: list[np.ndarray] = []
        for qid, terms in compiled.items():
            m = pc.is_in(gterm, value_set=pa.array(terms)).to_numpy(
                zero_copy_only=False
            )
            cnt = np.bincount(gp[m], minlength=n)
            hit = np.flatnonzero(cnt == len(terms))
            if len(hit):
                out_doc.append(ids[hit])
                out_q.append(np.full(len(hit), qid, dtype=np.int64))
        if not out_doc:
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_doc)),
                "query_id": pa.array(np.concatenate(out_q)),
            }
        )

    return docs_ds.map_batches(match, batch_format="pyarrow")
