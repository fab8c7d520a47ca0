"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline (index build + BM25 search) on sf0.001.
``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2);
each callable takes ``sf_dir`` and returns a Dataset / DataFrame / Table.
``oracle_sql()`` — DuckDB-equivalent SQL per query (column names match).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in lsearch_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75
BM25_QUERY = "scan merge sort"
MORE_TERM = "scan"
HAS_TERM = "merge"


def _clean_schema(path: str, columns):
    """The file's schema with the ``b'pandas'`` metadata removed (pruned
    to ``columns`` when given): ``hash(pa.Schema)`` raises ``unhashable
    type: 'dict'`` on that metadata, making every sort/groupby shuffle
    log ``Failed to hash the schemas (for deduplication)`` per reduce
    task. Passing the cleaned schema to ``read_parquet`` strips it at
    the source — block layout, column pruning and the metadata-only
    ``count()`` shortcut all stay intact (a post-read ``map_batches``
    strip costs ~15-20% on count-using pipelines: it turns the
    metadata-only count into a full read)."""
    import pyarrow.parquet as pq

    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    path = os.path.join(sf_dir, "documents.parquet")
    return rd.read_parquet(
        path, columns=columns, schema=_clean_schema(path, columns)
    )


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    path = os.path.join(sf_dir, f"{table}.parquet")
    return rd.read_parquet(
        path, columns=columns, schema=_clean_schema(path, columns)
    )


# ---------------------------------------------------------------- entry ----


def entry() -> Any:
    """Flagship: build the sharded BM25 index over sf0.001 documents, then
    answer a query batch through the Dataset query path."""
    import ray.data as rd

    from lsearch_ray.index.build import build_index
    from lsearch_ray.index.search import BatchSearcher

    sf_dir = "/root/testdata/sf0.001"
    index_dir = "/tmp/lsearch_ray_entry_index"
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    build_index(docs, index_dir, num_shards=4)
    queries_tbl = pa.table(
        {
            "query_id": pa.array(range(4), type=pa.int64()),
            "query": ["scan merge", "hash join", "window order sort", "spark"],
        }
    )
    out = rd.from_arrow(queries_tbl).map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "k": 10, "mode": "or"},
        batch_format="pyarrow",
        batch_size=2,
        concurrency=2,
    )
    return out


# -------------------------------------------------------------- queries ----


def _q_tf_triples(sf_dir: str):
    from lsearch_ray.pipelines import tf_triples

    docs = _docs(sf_dir, ["doc_id", "text"])
    docs = docs.map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], 200)), batch_format="pyarrow"
    )
    return tf_triples(docs).map_batches(
        lambda b: pa.table(
            {
                "term": b["term"],
                "doc_id": b["doc_id"],
                "tf": b["tf"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_term_df(sf_dir: str):
    from lsearch_ray.pipelines import term_df

    return term_df(_docs(sf_dir, ["doc_id", "text"]))


def _q_doc_stats(sf_dir: str):
    from lsearch_ray.pipelines import doc_stats

    s = doc_stats(_docs(sf_dir, ["doc_id", "text"]))
    # avgdl as exact integer fixed-point (millionths): float rounding of
    # total/n differs between engines at the ulp (round() is banker's,
    # DuckDB's is half-away); integer floor-division is representation-free
    avgdl_e6 = (s["total_tokens"] * 1_000_000) // s["n_docs"] if s["n_docs"] else 0
    return pa.table(
        {
            "n_docs": pa.array([s["n_docs"]], type=pa.int64()),
            "avgdl_e6": pa.array([avgdl_e6], type=pa.int64()),
            "total_tokens": pa.array([s["total_tokens"]], type=pa.int64()),
        }
    )


def _q_bm25_or(sf_dir: str):
    from lsearch_ray.pipelines import bm25_topk_dataset

    return bm25_topk_dataset(_docs(sf_dir, ["doc_id", "text"]), BM25_QUERY, k=10)


def _q_bm25_and(sf_dir: str):
    from lsearch_ray.pipelines import bm25_topk_dataset

    return bm25_topk_dataset(
        _docs(sf_dir, ["doc_id", "text"]), BM25_QUERY, k=10, mode="and"
    )


def _q_more_rank(sf_dir: str):
    from lsearch_ray.stages import ContentRun, ScoreOp, run_pipeline

    out = run_pipeline(
        _docs(sf_dir, ["doc_id", "text"]),
        [ContentRun("text", (ScoreOp("more", MORE_TERM),), insensitive=False)],
        id_col="doc_id",
        k=20,
    )
    return out.map_batches(
        lambda b: b.select(["doc_id", "score"]), batch_format="pyarrow"
    )


def _q_has_filter(sf_dir: str):
    from lsearch_ray.stages import ContentRun, ScoreOp, run_pipeline

    out = run_pipeline(
        _docs(sf_dir, ["doc_id", "text", "n_chars"]),
        [ContentRun("text", (ScoreOp("has", HAS_TERM),), insensitive=False)],
        sort=False,
    )
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow"
    )


def _q_events_filter(sf_dir: str):
    from lsearch_ray.stages import ContentRun, ScoreOp, run_pipeline

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "props", "value"])
    out = run_pipeline(
        ev,
        [
            ContentRun("event_type", (ScoreOp("is", "click"),), insensitive=False),
            ContentRun("props", (ScoreOp("hasnt", "x"),), insensitive=False),
        ],
        sort=False,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "value"]), batch_format="pyarrow"
    )


def _q_q1_agg(sf_dir: str):
    from ray.data.aggregate import Sum

    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    # per-batch PARTIAL aggregation: the global groupby shuffles one row
    # per (batch, flag, status) — a handful of groups — instead of every
    # lineitem row (combine-before-shuffle)
    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("l_discount", "sum"),
                ("l_discount", "count"),
            ]
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty_f"),
            Sum("l_extendedprice_sum", alias_name="sum_price_f"),
            Sum("l_discount_sum", alias_name="disc_sum"),
            Sum("l_discount_count", alias_name="n"),
        )
    )

    # fixed-point integer outputs: float sums differ between engines by
    # summation order (~1e-7 rel), which survives rounding at the ulp
    # level and would break the driver's value hash; integer
    # cents/millionths absorb it. floor(x + 0.5) = explicit half-away
    # (positive sums) shared with the oracle — pc.round is half-to-even
    # and diverges from SQL round() on exactly-representable halves
    def finish(b: pa.Table) -> pa.Table:
        qty = b["sum_qty_f"].to_numpy(zero_copy_only=False)
        price = b["sum_price_f"].to_numpy(zero_copy_only=False)
        dsum = b["disc_sum"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": pa.array(np.floor(qty + 0.5).astype(np.int64)),
                "sum_price_cents": pa.array(
                    np.floor(price * 100.0 + 0.5).astype(np.int64)
                ),
                "avg_disc_e6": pa.array(
                    np.floor(dsum / n * 1e6 + 0.5).astype(np.int64)
                ),
                "n": pa.array(n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_top_orders(sf_dir: str):
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return o.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def _q_dedup_events(sf_dir: str):
    from lsearch_ray.functions import exact_dedup

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    out = exact_dedup(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return out.map_batches(
        lambda b: b.select(["user_id", "event_type", "event_id"]),
        batch_format="pyarrow",
    ).sort(["user_id", "event_type"])  # canonical order for the value hash


def _q_dedup_documents(sf_dir: str):
    from lsearch_ray.functions import exact_dedup_by_content

    docs = _docs(sf_dir, ["doc_id", "text"])
    out = exact_dedup_by_content(docs, "text", "doc_id")
    return out.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")


def _q_ann_cosine(sf_dir: str):
    import pyarrow.parquet as pq

    from lsearch_ray.functions import cosine_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = np.array(
        pq.read_table(emb_path, filters=[("vec_id", "=", 0)])["embedding"][0].as_py(),
        dtype=np.float64,
    )
    return cosine_topk(_read(sf_dir, "embeddings"), qvec, k=10)


def _q_token_count(sf_dir: str):
    from lsearch_ray.analyzer import doc_lengths_table

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": doc_lengths_table(b)["dl"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_lang_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))
    )


def _q_events_hourly(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def trunc(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.floor_temporal(b["ts"], unit="hour"),
                "value": b["value"],
            }
        )

    agg = (
        ev.map_batches(trunc, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "hour": b["hour"],
                "n": b["n"],
                "sum_value": pc.round(b["sum_value"], 3),
            }
        ),
        batch_format="pyarrow",
    )


def _q_events_sliding(sf_dir: str):
    """Sliding event-time windows (2h size, 1h slide): each event lands
    in two windows via a vectorized flat-map, then one groupby."""
    from lsearch_ray.functions import sliding_window_agg

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    agg = sliding_window_agg(
        ev, key_cols=["event_type"], size_s=7200.0, slide_s=3600.0
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "window_start": b["window_start"],
                "n": b["n"],
                "sum_value": pc.round(b["sum_value"], 3),
            }
        ),
        batch_format="pyarrow",
    ).sort(["event_type", "window_start"])


_PRICE_BANDS = [
    ("low", 0.0, 60_000.0),
    ("mid", 40_000.0, 160_000.0),  # overlaps low AND high on purpose
    ("high", 120_000.0, 10**9),
]


def _q_range_join_orders(sf_dir: str):
    """Interval join of orders against OVERLAPPING price bands (broadcast
    small side, vectorized membership — one row per matching band)."""
    from ray.data.aggregate import Count, Sum

    from lsearch_ray.functions.joins import range_join

    bands = pa.table(
        {
            "band": [b[0] for b in _PRICE_BANDS],
            "lo": [b[1] for b in _PRICE_BANDS],
            "hi": [b[2] for b in _PRICE_BANDS],
        }
    )
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    joined = range_join(o, bands, value_col="o_totalprice")
    agg = joined.groupby("band").aggregate(
        Count(alias_name="n"), Sum("o_totalprice", alias_name="total")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "band": b["band"],
                "n": b["n"],
                # explicit half-away (positive totals) shared with the
                # oracle — pc.round is half-to-even, SQL round half-away
                "total_cents": pa.array(
                    np.floor(
                        b["total"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                    ).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _q_asof_clicks_views(sf_dir: str):
    """As-of join: each click gets the user's most recent prior (or
    simultaneous) view — hash-partition co-group + per-partition
    vectorized merge_asof (functions.joins.asof_join)."""
    from lsearch_ray.functions.joins import asof_join

    from ray.data.aggregate import Min

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def side(kind: str):
        return ev.map_batches(
            lambda b, k=kind: b.filter(
                pc.equal(b["event_type"], k)
            ).select(["event_id", "user_id", "ts"]),
            batch_format="pyarrow",
        )

    # enforce asof_join's unique-(key, ts) precondition on the right side
    # (min event_id wins a tie — mirrored in the oracle SQL)
    views = (
        side("view")
        .groupby(["user_id", "ts"])
        .aggregate(Min("event_id", alias_name="event_id"))
    )
    out = asof_join(
        side("click"),
        views,
        key_col="user_id",
        ts_col="ts",
        right_cols=["event_id"],
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"].cast(pa.int64()),
                "user_id": b["user_id"].cast(pa.int64()),
                "last_view_id": pc.fill_null(
                    b["event_id_right"].cast(pa.int64(), safe=False), -1
                ),
            }
        ),
        batch_format="pyarrow",
    ).sort("event_id")


def _q_sample_events(sf_dir: str):
    """Deterministic 10% sample keyed on hash(event_id) — same rows on
    any cluster size / batch split, reproducible in SQL."""
    from lsearch_ray.functions import hash_sample

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    return hash_sample(ev, "event_id", num=1, denom=10).sort("event_id")


def _q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling: 50% of clicks, 10% of views,
    all purchases, drop the rest — one vectorized filter per batch, no
    shuffle, SQL-reproducible hash arithmetic."""
    from lsearch_ray.functions.sampling import stratified_hash_sample

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return stratified_hash_sample(
        ev,
        "event_id",
        "event_type",
        {"click": (1, 2), "view": (1, 10), "purchase": (1, 1)},
    ).sort("event_id")


def _q_heavy_terms(sf_dir: str):
    """Top-20 corpus terms via the bounded-memory heavy-hitters sketch +
    exact verification pass; the query RAISES unless the result is
    provably exact, so the SQL twin applies."""
    from lsearch_ray.analyzer import flat_tokens_arrow
    from lsearch_ray.functions.sketches import heavy_hitters

    docs = _docs(sf_dir, ["doc_id", "text"])
    table, info = heavy_hitters(
        docs,
        values_fn=lambda b: flat_tokens_arrow(b["text"])[1],
        k=20,
        per_batch_cap=4096,
    )
    if not info["provably_exact"]:
        raise RuntimeError(
            f"heavy_hitters not provably exact (bound={info['bound']})"
        )
    return table


def _q_quantiles_value(sf_dir: str):
    """Exact p50/p90/p99 of events.value by iterative histogram
    refinement — no full sort, driver state is one histogram per round."""
    from lsearch_ray.functions.quantiles import exact_quantiles

    ev = _read(sf_dir, "events", ["value"])
    return exact_quantiles(
        ev, "value", [0.5, 0.9, 0.99], n_buckets=512, collect_limit=20_000
    )


def _q_quantiles_by_type(sf_dir: str):
    """Exact per-group p50/p90/p99 of events.value: one hash-partition
    shuffle on event_type, vectorized run-boundary rank gather per
    partition (the grouped counterpart of quantiles_value)."""
    from lsearch_ray.functions.quantiles import grouped_quantiles_ds

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles_ds(
        ev, "event_type", "value", [0.5, 0.9, 0.99], num_partitions=16
    ).sort(["event_type", "q"])


def _q_distinct_users_kmv(sf_dir: str):
    """KMV distinct-count sketch over user_id (deterministic: FNV hashes
    → same kth-minimum → same estimate on any partitioning)."""
    from lsearch_ray.functions import kmv_distinct

    ev = _read(sf_dir, "events", ["user_id"])
    s = kmv_distinct(ev, "user_id", k=64)
    return pa.table(
        {
            "estimate_e3": pa.array([s["estimate_e3"]], type=pa.int64()),
            "kth_hash": pa.array([s["kth_hash"]], type=pa.int64()),
            "k": pa.array([s["k"]], type=pa.int64()),
        }
    )


def _q_hll_users(sf_dir: str):
    """HyperLogLog register table over user_id (p=9, 512 buckets): the
    sketch rows are integer-exact (bucket = top hash bits, register =
    max leading-zero rank), so the SQL twin replays them bit-for-bit;
    the float estimate (hll_estimate) is pytest-verified separately."""
    from lsearch_ray.functions.sampling import hll_buckets

    ev = _read(sf_dir, "events", ["user_id"])
    return hll_buckets(ev, "user_id", p=9)


def _q_priority_sample(sf_dir: str):
    """Weighted sample (priority sampling, Duffield-Lund-Thorup): top-50
    lineitems by q = w/u with hash-derived 40-bit uniforms — pure int64
    arithmetic, inclusion ∝ l_quantity, deterministic on any split."""
    from lsearch_ray.functions.sampling import priority_sample

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def add_key(b: pa.Table) -> pa.Table:
        lk = pc.binary_join_element_wise(
            pc.cast(b["l_orderkey"], pa.string()),
            pc.cast(b["l_linenumber"], pa.string()),
            "-",
        )
        return b.append_column("lk", lk)

    out = priority_sample(
        li.map_batches(add_key, batch_format="pyarrow"),
        "lk",
        "l_quantity",
        50,
    )
    rows = out.take_all()  # 50 rows, already (priority desc, h, lk) ordered
    return pa.table(
        {
            "lk": pa.array([r["lk"] for r in rows], type=pa.string()),
            "qty": pa.array(
                [int(r["l_quantity"]) for r in rows], type=pa.int64()
            ),
            "priority": pa.array(
                [int(r["priority"]) for r in rows], type=pa.int64()
            ),
        }
    )


_SPARSE_MAX_DF = 200
_SPARSE_MIN_SIM = 400_000


def _q_sparse_dup_pairs(sf_dir: str):
    """Sparse all-pairs cosine over tf vectors (Bayardo-style df-pruned
    similarity join): document pairs with pruned-space cosine ≥ 0.4 —
    the near-dup mining form of the similarity join. One term-partition
    shuffle emits dots + norms, pair aggregation by hash partition, no
    broadcast anywhere."""
    from lsearch_ray.functions.sparse import sparse_cosine_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = sparse_cosine_pairs(
        docs,
        max_df=_SPARSE_MAX_DF,
        min_sim_micro=_SPARSE_MIN_SIM,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "dot": pa.compute.cast(t["dot"], pa.int64()),
                "sim_micro": t["sim_micro"],
            }
        ),
        batch_format="pyarrow",
    )


_CDC_DIVISOR = 4


def _cdc_sql() -> str:
    """CDC chunk table (doc_id, chunk_id, n_tokens, chunk) — the same
    63-bit mixed hash decides boundaries (per DISTINCT term, joined
    back); chunk_id = count of boundary tokens strictly before the token
    within its doc (a boundary token ENDS its chunk). Shared by the
    cdc_chunks and cdc_dedup oracles."""
    return (
        "WITH toks AS (" + _ORDERED_TOKS + "), "
        "dt AS (SELECT DISTINCT term FROM toks), "
        f"th AS (SELECT term, ({_mixed_hash63_of('term')}) % {_CDC_DIVISOR} AS hmod FROM dt), "
        "tb AS (SELECT t.doc_id, t.pos, t.term, (th.hmod = 0) AS bnd "
        "       FROM toks t JOIN th USING(term)), "
        "c AS (SELECT doc_id, pos, term, "
        "  CAST(COALESCE(SUM(CASE WHEN bnd THEN 1 ELSE 0 END) OVER ("
        "    PARTITION BY doc_id ORDER BY pos "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "    AS BIGINT) AS chunk_id "
        "  FROM tb) "
        "SELECT doc_id, chunk_id, count(*) AS n_tokens, "
        "string_agg(term, ' ' ORDER BY pos) AS chunk "
        "FROM c GROUP BY doc_id, chunk_id"
    )


def _q_cdc_chunks(sf_dir: str):
    """Content-defined chunking: boundaries where the token hash ≡ 0
    (mod 4) — shift-robust chunk grids for sub-document dedup (the
    rsync/LBFS rolling-boundary idea on the token stream). Pure map-side
    flat-map, no shuffle."""
    from lsearch_ray.functions.chunks import cdc_chunks_table

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(
        lambda b: cdc_chunks_table(b, divisor=_CDC_DIVISOR),
        batch_format="pyarrow",
    ).sort(["doc_id", "chunk_id"])


def _q_distinct_users_hourly(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per tumbling hour — the windowed
    form of distinct_users_by_type (streaming-analytics shape): hour
    truncation map-side, then the pair-partitioned exact distinct."""
    from lsearch_ray.functions import grouped_distinct_count_ds

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def trunc(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(b["ts"], unit="hour"),
                "user_id": b["user_id"],
            }
        )

    return grouped_distinct_count_ds(
        ev.map_batches(trunc, batch_format="pyarrow"),
        "hour",
        "user_id",
        num_partitions=16,
    ).sort("hour")


def _q_props_stats(sf_dir: str):
    """Semi-structured ETL: vectorized RE2 extraction of the integer
    'k' field from the flat-JSON props column, per-type integer stats
    (map-side partial aggregation, one tiny groupby)."""
    from lsearch_ray.functions.textstats import props_field_stats_ds

    ev = _read(sf_dir, "events", ["event_type", "props"])
    out = props_field_stats_ds(ev, field="k")
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "n": pc.cast(b["n"], pa.int64()),
                "sum_k": pc.cast(b["sum_k"], pa.int64()),
                "min_k": pc.cast(b["min_k"], pa.int64()),
                "max_k": pc.cast(b["max_k"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("event_type")


def _q_cdc_dedup(sf_dir: str):
    """Content-defined sub-document dedup: CDC chunks → hash-partitioned
    exact dedup keeping each distinct chunk's first global
    (doc_id, chunk_id) occurrence — the shift-robust form of
    chunk_dedup (an upstream edit no longer re-grids every chunk, so
    repeated boilerplate still collides)."""
    from lsearch_ray.functions.chunks import cdc_chunks_table
    from lsearch_ray.functions.dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    chunked = docs.map_batches(
        lambda b: cdc_chunks_table(b, divisor=_CDC_DIVISOR),
        batch_format="pyarrow",
    )
    return exact_dedup(
        chunked, key_cols=["chunk"], order_cols=["doc_id", "chunk_id"]
    ).sort(["doc_id", "chunk_id"])


_FH_DIM = 32


def _q_feature_hash(sf_dir: str):
    """Feature-hashing (hashing-trick) document projection: signed tf
    sums per (doc, dim=h%32) — the no-vocabulary text → vector bridge
    feeding kmeans/knn/ANN; integer-exact relational form. Pure
    map-side, no shuffle (a document's triples complete in its batch)."""
    from lsearch_ray.functions.feathash import feature_hash_relational

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return feature_hash_relational(docs, dim=_FH_DIM).sort(
        ["doc_id", "dim"]
    )


def _q_quality(sf_dir: str):
    from lsearch_ray.functions import quality_stats

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_stats, batch_format="pyarrow"
    )
    return out.map_batches(
        lambda b: b.select(
            ["doc_id", "n_tokens", "alpha_ratio", "digit_ratio", "stopword_ratio"]
        ),
        batch_format="pyarrow",
    )


def _q_bpe_count(sf_dir: str):
    from lsearch_ray.functions import bpe_ish_token_count

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: bpe_ish_token_count(b).select(["doc_id", "n_bpe_tokens"]),
        batch_format="pyarrow",
    )


def _q_salted_term_df(sf_dir: str):
    """Salted two-stage term-df aggregation — must equal the plain
    term_df oracle (skew path correctness)."""
    from lsearch_ray.functions import salted_groupby_sum
    from lsearch_ray.pipelines import tf_triples

    ones = tf_triples(_docs(sf_dir, ["doc_id", "text"])).map_batches(
        lambda b: pa.table(
            {"term": b["term"], "df": pa.array(np.ones(b.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    return salted_groupby_sum(ones, "term", ["df"], salt=8)


def _q_fingerprint(sf_dir: str):
    from lsearch_ray.functions import fingerprint

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: fingerprint(b).select(["doc_id", "fp64"]), batch_format="pyarrow"
    )


def _q_langid(sf_dir: str):
    from lsearch_ray.functions import LangId

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId,
        batch_format="pyarrow",
        concurrency=2,
    ).map_batches(
        lambda b: b.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
    )


def _q_minhash_dedup(sf_dir: str):
    from lsearch_ray.functions import minhash_dedup

    out = minhash_dedup(_docs(sf_dir, ["doc_id", "text"]), threshold=0.8)
    return out.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")


def _q_simhash_dedup(sf_dir: str):
    from lsearch_ray.functions import simhash_dedup

    out = simhash_dedup(_docs(sf_dir, ["doc_id", "text"]), max_hamming=2)
    return out.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")


def _q_ngram_jaccard_dedup(sf_dir: str):
    from lsearch_ray.functions import ngram_jaccard_dedup

    out = ngram_jaccard_dedup(_docs(sf_dir, ["doc_id", "text"]), threshold=0.8)
    return out.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    ).sort("doc_id")


def _q_embedding_dedup(sf_dir: str):
    from lsearch_ray.functions import embedding_dedup

    out = embedding_dedup(_read(sf_dir, "embeddings"), threshold=0.999)
    return out.map_batches(
        lambda b: b.select(["vec_id"]), batch_format="pyarrow"
    ).sort("vec_id")


def _q_lsh_ann(sf_dir: str):
    import pyarrow.parquet as pq

    from lsearch_ray.functions import lsh_cosine_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = np.array(
        pq.read_table(emb_path, filters=[("vec_id", "=", 0)])["embedding"][0].as_py(),
        dtype=np.float64,
    )
    return lsh_cosine_topk(_read(sf_dir, "embeddings"), qvec, k=10, nplanes=10)


_WINSOR_LO, _WINSOR_HI = 0.05, 0.95


def _q_winsorized_sums(sf_dir: str):
    """Winsorized robust aggregate: clip value at the exact p05/p95
    order statistics (functions.quantiles.exact_quantiles — histogram
    refinement, no full sort), then per-type clipped fixed-point sums
    with a per-batch combiner. The clip picks exact data values, so no
    new arithmetic happens before quantization — bit-stable."""
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.quantiles import exact_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"]).materialize()
    qt = exact_quantiles(ev, "value", [_WINSOR_LO, _WINSOR_HI])
    lo, hi = qt["value"][0].as_py(), qt["value"][1].as_py()

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        v = np.minimum(np.maximum(v[fin], lo), hi)
        vm = np.floor(v * 1e6 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"].filter(pa.array(fin)),
                "vm": pa.array(vm),
            }
        )
        return t.group_by("event_type").aggregate(
            [("vm", "sum"), ("vm", "count")]
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("vm_sum", alias_name="wsum_micro"),
            Sum("vm_count", alias_name="n"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b["event_type"],
                    "wsum_micro": b["wsum_micro"].cast(pa.int64()),
                    "n": b["n"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("event_type")
    )


_RANGE_WIN_US = 3_600_000_000  # 1h trailing window


def _q_trailing_window(sf_dir: str):
    """Per-user trailing 1-hour RANGE-frame window sum/count over the
    event stream (functions.grouped.grouped_range_window_ds): one
    hash-partition shuffle, then composite-timestamp searchsorted +
    prefix-sum gather per partition."""
    from lsearch_ray.functions.grouped import grouped_range_window_ds

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "v_micro": pa.array(v),
            }
        )

    out = grouped_range_window_ds(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        "ts",
        "v_micro",
        window=_RANGE_WIN_US,
        carry_cols=["event_id"],
        num_partitions=16,
    )
    return out.sort(["user_id", "ts", "event_id"])


_FUNNEL = ["view", "click", "purchase"]


def _q_funnel_counts(sf_dir: str):
    """Ordered funnel over the event stream (view → click → purchase,
    strictly increasing timestamps): per-user max stage via ONE
    hash-partition shuffle + a reduceat pass per stage
    (functions.funnel.funnel_stages), then users-reaching-stage counts."""
    import pandas as pd

    from lsearch_ray.functions import funnel_stages

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    per_user = funnel_stages(ev, _FUNNEL, num_partitions=16)
    counts = (
        per_user.groupby("stage_reached").count().to_pandas()
    )  # ≤ len(stages)+1 tiny rows
    by_stage = dict(zip(counts["stage_reached"], counts["count()"]))
    n_users = [
        int(sum(v for s, v in by_stage.items() if s >= i))
        for i in range(1, len(_FUNNEL) + 1)
    ]
    return pd.DataFrame(
        {
            "stage_idx": pd.array(range(1, len(_FUNNEL) + 1), dtype="int64"),
            "stage": _FUNNEL,
            "n_users": pd.array(n_users, dtype="int64"),
        }
    )


def _q_distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type
    (functions.funnel.grouped_distinct_count_ds)."""
    from lsearch_ray.functions import grouped_distinct_count_ds

    return grouped_distinct_count_ds(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        "event_type",
        "user_id",
        num_partitions=16,
    ).sort("event_type")


def _q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(returnflag, linestatus) — subtotals and grand
    total via one combiner-aggregated groupby per rollup level
    (functions.grouped.rollup_sum_ds), quantity quantized to cents."""
    from lsearch_ray.functions import rollup_sum_ds

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        qty = np.floor(
            b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pa.array(qty),
            }
        )

    return rollup_sum_ds(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        "qty",
        sum_col="qty_cents",
    ).sort(["l_returnflag", "l_linestatus"])


_KNN_K = 5


def _q_knn_join(sf_dir: str):
    """All-pairs similarity search: every embedding's top-k cosine
    neighbors (functions.ann.knn_join — matrix broadcast once, one
    matmul per batch, k·N output rows)."""
    from lsearch_ray.functions import knn_join

    return knn_join(_read(sf_dir, "embeddings"), k=_KNN_K).sort(
        ["vec_id", "rn"]
    )


def _q_join_revenue(sf_dir: str):
    """lineitem ⋈ orders (partitioned hash join) with a broadcast
    semi-join against BUILDING-segment customers; revenue per priority."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    from lsearch_ray.functions.joins import broadcast_semi_join, hash_join

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    building = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderpriority"])
    orders = broadcast_semi_join(
        orders, building.combine_chunks(), "o_custkey"
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": rev})

    li = li.map_batches(revenue, batch_format="pyarrow")
    joined = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    )
    agg = joined.groupby("o_orderpriority").aggregate(
        Sum("revenue", alias_name="revenue"), Count(alias_name="n")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                # half-away via floor(x+0.5) (positive revenues), mirrored
                # in the oracle: pc.round defaults to half-to-even while
                # DuckDB round() is half-away — latent 1-cent flake
                "revenue_cents": pa.array(
                    np.floor(
                        b["revenue"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                    ).astype(np.int64)
                ),
                "n": b["n"],
            }
        ),
        batch_format="pyarrow",
    )


def _q_distinct_segments(sf_dir: str):
    vals = sorted(_read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, type=pa.string())})


def _q_sessionize(sf_dir: str):
    from lsearch_ray.functions.joins import sessionize

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return sessionize(ev, gap_seconds=1800.0)


def _ivf_query_vec(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    return np.array(
        pq.read_table(emb_path, filters=[("vec_id", "=", 0)])["embedding"][0].as_py(),
        dtype=np.float64,
    )


def _q_ivf_ann(sf_dir: str):
    """IVF through the SERVING path: build the materialized
    cluster-partitioned layout (build_ivf_index), then probe it
    (ivf_search). nprobe = n_clusters makes IVF exact → the brute-force
    SQL oracle applies (the approximation knob is nprobe < n_clusters),
    while the driver still exercises the real build+probe layout."""
    import hashlib

    from lsearch_ray.functions.ann_ivf import build_ivf_index, ivf_search

    qvec = _ivf_query_vec(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    index_dir = f"/tmp/lsr_ivf_idx_{tag}"
    build_ivf_index(_read(sf_dir, "embeddings"), index_dir, n_clusters=8)
    return ivf_search(index_dir, qvec, k=10, nprobe=8)


def _q_ivf_ann_oneshot(sf_dir: str):
    """Secondary form: the one-shot inline-assignment path (no
    materialized layout), same exactness argument (nprobe = n_clusters)."""
    from lsearch_ray.functions.ann_ivf import ivf_cosine_topk

    qvec = _ivf_query_vec(sf_dir)
    return ivf_cosine_topk(
        _read(sf_dir, "embeddings"), qvec, k=10, n_clusters=8, nprobe=8
    )


def _q_bm25_phrase(sf_dir: str):
    """Exact-phrase BM25 top-10 through the REAL positional index path:
    build_index(positions=True) → codec positions blobs → phrase_search
    (adjacency on decoded position lists)."""
    import hashlib
    import shutil

    from lsearch_ray.index.build import build_index
    from lsearch_ray.index.search import phrase_search

    # stable content-derived name: hash() is salted per process, which
    # would leak a fresh /tmp dir per run instead of reusing+cleaning one
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    index_dir = f"/tmp/lsr_phrase_idx_{tag}"
    shutil.rmtree(index_dir, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    build_index(docs, index_dir, num_shards=4, positions=True)
    out = phrase_search(index_dir, PHRASE_QUERY, k=10)
    return pa.table(
        {
            "doc_id": out["doc_id"],
            "score": pc.round(out["score"], 4),
        }
    )


def _web_flagship_result(sf_dir: str):
    """The raw flagship pipeline run (no golden comparison — used by
    tools/make_web_golden.py to regenerate the contract)."""
    import shutil

    import ray.data as rd

    from lsearch_ray.corpus import make_corpus
    from lsearch_ray.pipelines.web import index_web_corpus, search_web_corpus

    index_dir = "/tmp/lsr_entry_web_index"
    shutil.rmtree(index_dir, ignore_errors=True)
    corpus = make_corpus(800, seed=42)
    index_web_corpus(rd.from_arrow(corpus), index_dir, num_shards=4)
    return search_web_corpus(
        index_dir, ["the data search", "biology music", "word042"], k=10
    )


def _check_golden(name: str, result, cols: list[str]):
    """Shared golden gate for the queries SQL can't express (web
    flagship, the three multimodal *_embed_knn): compare the live rows —
    projected to ``cols`` and normalized to the golden's JSON value
    types — against the committed contract tests/golden/<name>.json and
    RAISE on drift, so the driver's rows-only check is gated on
    committed bytes. Returns ``result`` unchanged."""
    import json

    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests",
        "golden",
        f"{name}.json",
    )
    with open(golden_path) as f:
        golden = json.load(f)
    want = [tuple(r[c] for c in cols) for r in golden["rows"]]
    casts = [
        float if want and isinstance(want[0][i], float) else int
        for i in range(len(cols))
    ]
    got = [
        tuple(cast(r[c]) for c, cast in zip(cols, casts))
        for r in result.to_pylist()
    ]
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise RuntimeError(
            f"{name} drifted from committed golden "
            f"({len(got)} vs {len(want)} rows; first diffs {diffs})"
        )
    return result


def _q_web_flagship(sf_dir: str):
    """End-to-end north-star pipeline on the deterministic synthetic web
    corpus (input_hint schema): html → byte-identical extract → url dedup
    → sharded index → block-max BM25 top-k. No SQL can run this, so the
    machine-checked contract is the committed golden
    tests/golden/web_flagship.json (seed-42 corpus is deterministic):
    the query compares its live (query_id, rank, doc_id, score) rows
    against the golden and RAISES on drift — the driver's rows-only
    check is thereby gated on committed bytes."""
    return _check_golden(
        "web_flagship",
        _web_flagship_result(sf_dir),
        ["query_id", "rank", "doc_id", "score"],
    )


def _image_embed_knn_result():
    """Raw multimodal flagship: deterministic PPM fixture → real pure-numpy
    decode (actor pool) → real classic-CV feature (grid mean-pool + color
    histogram, L2-normalized) → exact knn_join. Used by
    tools/make_multimodal_golden.py to regenerate the committed contract."""
    import ray.data as rd

    from lsearch_ray.functions.ann import knn_join
    from lsearch_ray.functions.multimodal import (
        DecodeImage,
        embed_image,
        make_ppm_fixture,
    )

    fixture = make_ppm_fixture(48)
    decoded = rd.from_arrow(fixture).repartition(4).map_batches(
        DecodeImage,
        fn_constructor_kwargs={"image_col": "image", "fake": False},
        batch_format="pyarrow",
        concurrency=2,
    )
    emb = decoded.map_batches(embed_image, batch_format="pyarrow").select_columns(
        ["img_id", "embedding"]
    )
    out = (
        knn_join(emb, id_col="img_id", k=3)
        .sort(["img_id", "rn"])
        .to_pandas()
    )
    return pa.table(
        {
            "img_id": pa.array(out["img_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rn": pa.array(out["rn"], type=pa.int64()),
            "sim_micro": pa.array(out["sim_micro"], type=pa.int64()),
        }
    )


def _q_image_embed_knn(sf_dir: str):
    """Multimodal decode → embed → similarity pipeline on the
    deterministic synthetic PPM fixture (no image table exists in the
    sf dirs and no SQL can run the decode, so — like web_flagship — the
    machine-checked contract is the committed golden
    tests/golden/image_embed_knn.json): the query compares its live
    (img_id, neighbor_id, rn, sim_micro) rows against the golden and
    RAISES on drift."""
    return _check_golden(
        "image_embed_knn",
        _image_embed_knn_result(),
        ["img_id", "neighbor_id", "rn", "sim_micro"],
    )


def _audio_embed_knn_result():
    """Audio multimodal flagship: deterministic WAV PCM16 fixture → real
    pure-numpy RIFF/WAVE decode (actor pool) → real DSP feature (energy
    envelope + zero-crossing + amplitude histogram, L2-normalized) →
    exact knn_join. Used by tools/make_multimodal_golden.py to regenerate the
    committed contract."""
    import ray.data as rd

    from lsearch_ray.functions.ann import knn_join
    from lsearch_ray.functions.multimodal import (
        DecodeAudio,
        embed_audio,
        make_wav_fixture,
    )

    fixture = make_wav_fixture(48)
    decoded = rd.from_arrow(fixture).repartition(4).map_batches(
        DecodeAudio,
        fn_constructor_kwargs={"audio_col": "audio", "fake": False},
        batch_format="pyarrow",
        concurrency=2,
    )
    emb = decoded.map_batches(embed_audio, batch_format="pyarrow").select_columns(
        ["clip_id", "embedding"]
    )
    out = (
        knn_join(emb, id_col="clip_id", k=3)
        .sort(["clip_id", "rn"])
        .to_pandas()
    )
    return pa.table(
        {
            "clip_id": pa.array(out["clip_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rn": pa.array(out["rn"], type=pa.int64()),
            "sim_micro": pa.array(out["sim_micro"], type=pa.int64()),
        }
    )


def _q_audio_embed_knn(sf_dir: str):
    """Audio decode → embed → similarity pipeline on the deterministic
    synthetic WAV fixture (no audio table exists in the sf dirs and no
    SQL can run the decode, so — like image_embed_knn — the
    machine-checked contract is the committed golden
    tests/golden/audio_embed_knn.json): the query compares its live
    (clip_id, neighbor_id, rn, sim_micro) rows against the golden and
    RAISES on drift."""
    return _check_golden(
        "audio_embed_knn",
        _audio_embed_knn_result(),
        ["clip_id", "neighbor_id", "rn", "sim_micro"],
    )


def _q_curation_pipeline(sf_dir: str):
    """The composed training-data flagship as ONE streamed run
    (pipelines/curation.curate_corpus_ds): quality gate → exact content
    dedup → ngram-Jaccard near-dup components → keep-min-per-cluster →
    leakage-safe cluster split → per-split sequence packing. Returns
    (doc_id, grp, n_tokens, bin_id) sorted by doc_id."""
    from lsearch_ray.pipelines.curation import curate_corpus_ds

    return curate_corpus_ds(_docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def _curation_pipeline_sql() -> str:
    """Exact composed twin of _q_curation_pipeline, stitched from the
    per-stage twins: the quality_filter threshold gate over
    _quality_sql's rounded signals; exact content dedup via the 63-bit
    FNV of the FULL text (byte-exact — the sf corpora are pure ASCII so
    per-character ord == per-byte); brute-force exact Jaccard edges over
    the deduped set (the engine's MinHash banding has <1e-7 miss
    probability at threshold 0.8 — the ngram_jaccard_dedup argument);
    recursive-closure components, keep-min survivors; the cluster_split
    hash of the component label; and the pack_by_lang window-cumsum
    pattern partitioned by split with capacity 2048."""
    return f"""
WITH q AS ({_quality_sql()}),
gated AS (
  SELECT d.doc_id, d.text FROM documents d JOIN q ON d.doc_id = q.doc_id
  WHERE q.n_tokens BETWEEN 10 AND 100000 AND q.alpha_ratio >= 0.5
    AND q.digit_ratio <= 0.3 AND q.stopword_ratio >= 0.01
),
th AS (SELECT doc_id, text, ({_fnv63_of('text')}) AS h FROM gated),
keepmin AS (SELECT min(doc_id) AS doc_id FROM th GROUP BY h),
kept AS (SELECT t.doc_id, t.text FROM th t JOIN keepmin k USING (doc_id)),
{_ngram_edges_body('kept')},
sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.src, s.b FROM r JOIN sym s ON r.dst = s.a
  ) SELECT src, dst FROM r
),
lbl AS (SELECT src, least(src, min(dst)) AS comp FROM reach GROUP BY src),
surv AS (
  SELECT k.doc_id,
         CAST(coalesce(l.comp, k.doc_id) AS BIGINT) AS component
  FROM kept k LEFT JOIN lbl l ON l.src = k.doc_id
  WHERE coalesce(l.comp, k.doc_id) = k.doc_id
),
spl AS (
  SELECT doc_id,
         CASE WHEN hb < 90 THEN 'train' WHEN hb < 95 THEN 'val'
              ELSE 'test' END AS grp
  FROM (SELECT doc_id,
          ({_mixed_hash63_of('CAST(component AS VARCHAR)')}) % 100 AS hb
        FROM surv)
),
dl AS (
  SELECT s.doc_id, s.grp, coalesce(x.n, 0) AS n
  FROM spl s LEFT JOIN (
    SELECT doc_id, count(*) AS n FROM ({_TOKS}) GROUP BY doc_id
  ) x ON s.doc_id = x.doc_id
)
SELECT doc_id, grp, CAST(n AS BIGINT) AS n_tokens,
CAST(coalesce(sum(n) OVER (PARTITION BY grp ORDER BY doc_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
  AS BIGINT) AS bin_id
FROM dl ORDER BY doc_id
"""


def _video_embed_knn_result():
    """Video multimodal flagship: deterministic Y4M fixture → real
    pure-numpy frame split (actor pool, every 2nd frame) → real
    luma-plane frame feature → per-video mean pool (one hash shuffle) →
    exact knn_join. Used by tools/make_multimodal_golden.py to regenerate the
    committed contract."""
    import ray.data as rd

    from lsearch_ray.functions.ann import knn_join
    from lsearch_ray.functions.multimodal import (
        SampleFrames,
        embed_yuv_frame,
        make_y4m_fixture,
        mean_pool_embeddings,
    )

    fixture = make_y4m_fixture(48)
    frames = rd.from_arrow(fixture).repartition(4).map_batches(
        SampleFrames,
        fn_constructor_kwargs={"video_col": "video", "every_n": 2, "fake": False},
        batch_format="pyarrow",
        concurrency=2,
    )
    per_frame = frames.map_batches(
        embed_yuv_frame, batch_format="pyarrow"
    ).select_columns(["vid_id", "embedding"])
    emb = mean_pool_embeddings(per_frame, "vid_id")
    out = (
        knn_join(emb, id_col="vid_id", k=3)
        .sort(["vid_id", "rn"])
        .to_pandas()
    )
    return pa.table(
        {
            "vid_id": pa.array(out["vid_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rn": pa.array(out["rn"], type=pa.int64()),
            "sim_micro": pa.array(out["sim_micro"], type=pa.int64()),
        }
    )


def _q_video_embed_knn(sf_dir: str):
    """Video frame-sample → embed → mean-pool → similarity pipeline on
    the deterministic synthetic Y4M fixture (no video table exists in
    the sf dirs and no SQL can run the frame split, so — like
    image_embed_knn / audio_embed_knn — the machine-checked contract is
    the committed golden tests/golden/video_embed_knn.json): the query
    compares its live rows against the golden and RAISES on drift."""
    return _check_golden(
        "video_embed_knn",
        _video_embed_knn_result(),
        ["vid_id", "neighbor_id", "rn", "sim_micro"],
    )


_FRAME_DEDUP_TAU = 980_000


def _frame_dedup_result():
    """Within-video keyframe thinning over the same Y4M fixture as
    video_embed_knn: real frame split → per-frame luma embed → greedy
    near-dup drop in frame order (functions.multimodal.frame_dedup_ds —
    one vid-keyed shuffle, per-group matmul greedy; group size is the
    per-video sampled frame count). Used by
    tools/make_multimodal_golden.py to regenerate the contract."""
    import ray.data as rd

    from lsearch_ray.functions.multimodal import (
        SampleFrames,
        embed_yuv_frame,
        frame_dedup_ds,
        make_y4m_fixture,
    )

    fixture = make_y4m_fixture(48)
    frames = rd.from_arrow(fixture).repartition(4).map_batches(
        SampleFrames,
        fn_constructor_kwargs={"video_col": "video", "every_n": 2, "fake": False},
        batch_format="pyarrow",
        concurrency=2,
    )
    per_frame = frames.map_batches(
        embed_yuv_frame, batch_format="pyarrow"
    ).select_columns(["vid_id", "frame_idx", "embedding"])
    out = (
        frame_dedup_ds(per_frame, tau_micro=_FRAME_DEDUP_TAU)
        .sort(["vid_id", "frame_idx"])
        .to_pandas()
    )
    return pa.table(
        {
            "vid_id": pa.array(out["vid_id"], type=pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], type=pa.int64()),
            "kept": pa.array(out["kept"], type=pa.int64()),
        }
    )


def _q_frame_dedup(sf_dir: str):
    """Within-video near-duplicate frame removal (keyframe thinning —
    the video SemDeDup): golden-gated like the *_embed_knn trio (no
    video table in the sf dirs, no SQL frame split); the committed
    contract is tests/golden/frame_dedup.json and the query raises on
    drift. An independent pure-Python greedy replay pytest pins the
    semantics."""
    return _check_golden(
        "frame_dedup",
        _frame_dedup_result(),
        ["vid_id", "frame_idx", "kept"],
    )


_NGRAM_N = 3
_NGRAM_K = 20
_DECON_N = 8
# docs with doc_id % mod == 0 act as the "benchmark" suite; 31 chosen so
# the slice shares 8-grams with the corpus (near-dup pairs) at sf0.001
# AND sf0.01 — a 0-hit query would gate nothing
_DECON_MOD = 31


def _q_ngram_counts(sf_dir: str):
    from lsearch_ray.functions import ngram_counts_ds

    return ngram_counts_ds(
        _docs(sf_dir, ["doc_id", "text"]), n=_NGRAM_N, k=_NGRAM_K
    )


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: a deterministic slice of the corpus
    (doc_id % mod == 0) plays the eval suite; every other doc sharing an
    8-token gram with it is flagged. Map-side only: the gram set is
    broadcast, the corpus streams through once."""
    from lsearch_ray.functions import benchmark_grams, decontaminate_ds

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _slice(batch: pa.Table, keep_bench: bool) -> pa.Table:
        mod = np.asarray(batch["doc_id"]) % _DECON_MOD == 0
        return batch.filter(pa.array(mod if keep_bench else ~mod))

    bench = docs.map_batches(
        lambda b: _slice(b, True), batch_format="pyarrow"
    )
    corpus = docs.map_batches(
        lambda b: _slice(b, False), batch_format="pyarrow"
    )
    grams = benchmark_grams(bench, _DECON_N)
    return decontaminate_ds(corpus, grams, n=_DECON_N).sort("doc_id")


def _q_cust_order_dist(sf_dir: str):
    """TPC-H Q13 shape: distribution of per-customer order counts
    including zero-order customers — a distributed left-outer hash join
    (functions.joins.hash_join how='left_outer'), per-customer counts
    with a combiner, then the tiny count-of-counts groupby."""
    from ray.data.aggregate import Count, Sum

    from lsearch_ray.functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = hash_join(
        cust, orders, "c_custkey", right_on="o_custkey",
        how="left_outer", num_partitions=16,
    )

    def partial(b: pa.Table) -> pa.Table:
        # count matched orders per customer: unmatched rows carry null
        # o_orderkey, which Arrow's count (valid-only) excludes
        return b.group_by("c_custkey").aggregate([("o_orderkey", "count")])

    per_cust = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("o_orderkey_count", alias_name="c_count"))
    )
    dist = (
        per_cust.map_batches(
            lambda b: pa.table(
                {"c_count": b["c_count"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("c_count")
        .aggregate(Count(alias_name="n_customers"))
    )
    return dist.map_batches(
        lambda b: pa.table(
            {
                "c_count": b["c_count"],
                "n_customers": b["n_customers"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort(["n_customers", "c_count"], descending=[True, True])


_SKIP_W = 2
_SKIP_K = 25


def _q_skipgram_counts(sf_dir: str):
    """Top-k skip-gram co-occurrence counts (window 2): ordered token
    pairs within 2 positions, per-batch value_counts partials, one
    groupby-sum, per-block top-k prune (functions.ngrams
    skipgram_counts_ds)."""
    from lsearch_ray.functions import skipgram_counts_ds

    return skipgram_counts_ds(
        _docs(sf_dir, ["text"]), window=_SKIP_W, k=_SKIP_K
    )


_FUZZY_MOD = 5
_FUZZY_TAU = 0.8


def _q_fuzzy_decontaminate(sf_dir: str):
    """Fuzzy benchmark decontamination: the doc_id % 5 == 0 slice plays
    the eval suite; corpus docs with exact 3-gram Jaccard ≥ 0.8 against
    any bench doc are flagged. Candidates from MinHash banding over the
    union (cross-table pairs only), exact shingle-set verify through
    hash joins (functions.minhash.fuzzy_decontaminate)."""
    from lsearch_ray.functions import fuzzy_decontaminate

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _slice(batch: pa.Table, keep_bench: bool) -> pa.Table:
        mod = np.asarray(batch["doc_id"]) % _FUZZY_MOD == 0
        return batch.filter(pa.array(mod if keep_bench else ~mod))

    bench = docs.map_batches(lambda b: _slice(b, True), batch_format="pyarrow")
    corpus = docs.map_batches(lambda b: _slice(b, False), batch_format="pyarrow")
    return fuzzy_decontaminate(corpus, bench, threshold=_FUZZY_TAU).sort(
        "doc_id"
    )


_REP_N = 2


def _q_doc_repetition(sf_dir: str):
    from lsearch_ray.functions import doc_repetition_stats

    return doc_repetition_stats(
        _docs(sf_dir, ["doc_id", "text"]), n=_REP_N
    ).sort("doc_id")


def _q_name_matches(sf_dir: str):
    """Fuzzy string matching (entity-resolution shape): distinct part
    names within Levenshtein distance 1, via symmetric-deletion banding
    + vectorized alignment verify (functions.editdist.edit1_matches_ds)
    — never an all-pairs comparison."""
    from lsearch_ray.functions.dedup import exact_dedup
    from lsearch_ray.functions.editdist import edit1_matches_ds

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"])
    distinct = exact_dedup(parts, ["p_name"], ["p_partkey"])
    pairs = edit1_matches_ds(distinct, "p_name", "p_partkey")

    def by_name(b: pa.Table) -> pa.Table:
        # id order is arbitrary relative to name order — normalize
        lo = pc.min_element_wise(b["nm_a"], b["nm_b"])
        hi = pc.max_element_wise(b["nm_a"], b["nm_b"])
        return pa.table({"name_a": lo, "name_b": hi})

    return pairs.map_batches(by_name, batch_format="pyarrow").sort(
        ["name_a", "name_b"]
    )


_OVL_W, _OVL_S = 8, 4


def _q_overlap_chunks(sf_dir: str):
    """RAG-style sliding-window chunking: width-8 word windows every 4
    tokens (functions.chunks.doc_chunks_overlap — one vectorized gather
    over the flat token stream, pure map-side)."""
    from lsearch_ray.functions import overlap_chunks_ds

    return overlap_chunks_ds(
        _docs(sf_dir, ["doc_id", "text"]), width=_OVL_W, stride=_OVL_S
    ).sort(["doc_id", "chunk_idx"])


def _q_doc_entropy(sf_dir: str):
    """Per-doc token-distribution entropy in exact integer micro-nat·dl
    units (functions.textstats.doc_entropy — lnm rounded per distinct
    count BEFORE the weighted sum, the unigram_nll convention)."""
    from lsearch_ray.functions import doc_entropy_ds

    return doc_entropy_ds(_docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def _q_quality_pctl_gate(sf_dir: str):
    """Dynamic percentile quality gate: keep the top half of the corpus
    by the integer entropy signal, with the cutoff LEARNED as the exact
    median of ent_microdl (rank floor(0.5·(n−1)) ascending, every doc AT
    the threshold kept) — the Gopher-style corpus-relative gate
    (functions.textstats.quality_percentile_gate_ds: one scoring pass,
    streamed histogram-refinement quantile, one filter pass)."""
    from lsearch_ray.functions import quality_percentile_gate_ds

    return quality_percentile_gate_ds(
        _docs(sf_dir, ["doc_id", "text"]), frac=0.5
    )


def _q_lang_pctl_gate(sf_dir: str):
    """Per-language dynamic quality gate: each language keeps its own
    top half by the integer entropy signal, the cutoff learned PER GROUP
    (functions.textstats.grouped_quality_percentile_gate_ds — one
    group-keyed quantile shuffle, |groups|-row threshold table joined
    back by broadcast / hash join past the budget)."""
    from lsearch_ray.functions import grouped_quality_percentile_gate_ds

    return grouped_quality_percentile_gate_ds(
        _docs(sf_dir, ["doc_id", "text", "lang"]), "lang", frac=0.5
    )


_OOV_K = 10


def _q_oov_rate(sf_dir: str):
    """Out-of-vocabulary token mass per language with the vocabulary
    fixed to the corpus top-10 terms by frequency (ties term-asc) — the
    tokenizer-budget / slice-coverage diagnostic
    (functions.ngrams.oov_rate_by_slice_ds: combiner unigram counts,
    block-pruned top-k, bounded vocab broadcast, one membership pass
    into a |slices|-row groupby)."""
    from lsearch_ray.functions.ngrams import oov_rate_by_slice_ds

    return oov_rate_by_slice_ds(
        _docs(sf_dir, ["doc_id", "text", "lang"]),
        k=_OOV_K,
        slice_col="lang",
    )


_EXTRACT_PAT = "s[a-z]+"


def _q_extract_matches(sf_dir: str):
    """Regex extract-all + explode (functions.textstats.extract_matches
    — the vectorized mark/split composition of Arrow RE2 kernels)."""
    from lsearch_ray.functions import extract_matches_ds

    return extract_matches_ds(
        _docs(sf_dir, ["doc_id", "text"]), _EXTRACT_PAT
    ).sort(["doc_id", "idx"])


def _q_redact(sf_dir: str):
    from lsearch_ray.functions import redact_ds

    return redact_ds(_docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def _q_tfidf_terms(sf_dir: str):
    from lsearch_ray.pipelines.fulltext import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), k=3).sort(
        ["doc_id", "rnk"]
    )


def _q_brand_revenue(sf_dir: str):
    """lineitem ⋈ part (broadcast — part is the small dimension) with
    per-batch PARTIAL aggregation: the global groupby shuffles one row
    per (batch, brand) instead of one per lineitem row (the
    combine-before-shuffle rule for wide aggregates)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.joins import broadcast_join

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    joined = broadcast_join(li, part, on="l_partkey", right_on="p_partkey")

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table({"p_brand": b["p_brand"], "rev": rev})
        # rev is never null, so its count is the group's row count — no
        # ones column through the shuffle
        return t.group_by("p_brand").aggregate([("rev", "sum"), ("rev", "count")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("rev_sum", alias_name="revenue"), Sum("rev_count", alias_name="n"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "p_brand": b["p_brand"],
                # half-AWAY (floor(x+0.5), values positive): pc.round's
                # default is half-to-even while DuckDB round() is
                # half-away — a .50-cent group would differ by 1 under
                # the exact int compare. Both sides use this formula.
                "revenue_cents": pa.array(
                    np.floor(
                        b["revenue"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                    ).astype(np.int64)
                ),
                "n": b["n"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("p_brand")


_GTOPK_K = 3
_PMI_K = 20
_PMI_MIN = 5
# lineitem counts per orderkey run 1-7: threshold 5 classifies a real
# slice of keys hot, so BOTH the broadcast and the hash-join legs carry
# rows through the oracle compare
_SKEW_HOT = 5


def _q_priority_revenue(sf_dir: str):
    """Skew-aware large-large join (functions.joins.skew_join): hot
    orderkeys broadcast, cold orderkeys hash-join, then the
    combine-before-shuffle revenue aggregate by order priority."""
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.joins import skew_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = skew_join(
        li, orders, "l_orderkey", right_on="o_orderkey",
        hot_threshold=_SKEW_HOT, num_partitions=16,
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table({"o_orderpriority": b["o_orderpriority"], "rev": rev})
        return t.group_by("o_orderpriority").aggregate(
            [("rev", "sum"), ("rev", "count")]
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("rev_sum", alias_name="revenue"),
            Sum("rev_count", alias_name="n"),
        )
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                # floor(x+0.5) half-away, shared with the oracle
                "revenue_cents": pa.array(
                    np.floor(
                        b["revenue"].to_numpy(zero_copy_only=False) * 100.0
                        + 0.5
                    ).astype(np.int64)
                ),
                "n": b["n"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("o_orderpriority")


def _q_top_docs_per_lang(sf_dir: str):
    """Grouped top-k (the row_number window pattern): the k longest
    documents per language. Map-side per-batch partial top-k prune, then
    ONE hash-partition shuffle on lang with a vectorized run-boundary
    rank pass per partition — no per-group Python."""
    from lsearch_ray.functions import grouped_topk_ds

    return grouped_topk_ds(
        _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
        "lang",
        "n_chars",
        id_col="doc_id",
        k=_GTOPK_K,
    ).sort(["lang", "rn"])


def _q_urgent_revenue(sf_dir: str):
    """Bloom-filter semi-join (functions.bloom.bloom_semi_join): the fact
    table is pruned against an m-bit bloom of the urgent-order keys
    (never shuffled), then exact-verified, then aggregated with a
    per-batch combiner. m_bits is sized small on purpose so real false
    positives exist at sf0.01 and the exact verify is load-bearing."""
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.bloom import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_returnflag"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    keys = orders.map_batches(
        lambda b: b.filter(
            pc.equal(b["o_orderpriority"], "1-URGENT")
        ).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    semi = bloom_semi_join(
        li, keys, "l_orderkey", key_col="o_orderkey", m_bits=1 << 14
    )

    def partial(b: pa.Table) -> pa.Table:
        qty = np.floor(
            b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table({"l_returnflag": b["l_returnflag"], "qty": pa.array(qty)})
        return t.group_by("l_returnflag").aggregate(
            [("qty", "sum"), ("qty", "count")]
        )

    agg = (
        semi.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("qty_sum", alias_name="qty_cents"),
            Sum("qty_count", alias_name="n"),
        )
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "qty_cents": b["qty_cents"].cast(pa.int64()),
                "n": b["n"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("l_returnflag")


def _q_running_totals(sf_dir: str):
    """Per-user running window aggregates over the event stream: value is
    quantized to integer micro-units (bit-stable cumsum), then ONE
    hash-partition shuffle on user_id and a vectorized run-boundary
    cumsum/lag pass per partition (functions.grouped.grouped_running_ds).
    delta coalesces to the row's own value on each user's first event
    (lag-default-0 semantics), keeping the output null-free so both
    engines emit plain int64."""
    from lsearch_ray.functions.grouped import grouped_running_ds

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "v_micro": pa.array(v),
            }
        )

    out = grouped_running_ds(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        "v_micro",
        cum_col="cum_micro",
        delta_col="delta_micro",
        num_partitions=16,
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("delta_micro"),
            "delta_micro",
            pc.coalesce(b["delta_micro"], b["v_micro"]),
        ),
        batch_format="pyarrow",
    ).sort(["user_id", "ts", "event_id"])


def _q_unigram_nll(sf_dir: str):
    """Perplexity-style quality scoring: per-doc negative log-likelihood
    under the corpus unigram LM, in integer micro-nats (per-term log
    costs rounded BEFORE the weighted sum — integer arithmetic end to
    end, no float-summation-order hazard)."""
    from lsearch_ray.pipelines.fulltext import unigram_nll

    return unigram_nll(_docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def _q_pmi_bigrams(sf_dir: str):
    from lsearch_ray.functions import pmi_bigrams_ds

    return pmi_bigrams_ds(
        _docs(sf_dir, ["doc_id", "text"]), k=_PMI_K, min_count=_PMI_MIN
    )


_CHUNK_W = 10
_KMEANS_K = 4
_KMEANS_ITERS = 2


def _q_chunk_dedup(sf_dir: str):
    from lsearch_ray.functions import chunk_exact_dedup

    return chunk_exact_dedup(
        _docs(sf_dir, ["doc_id", "text"]), width=_CHUNK_W
    ).sort(["doc_id", "chunk_idx"])


_DUPSPAN_N = 5


def _q_dup_shingle_stats(sf_dir: str):
    """Per-doc duplicated-shingle mass (Lee et al. 2022 curation signal):
    what share of a doc's distinct 5-shingles appears in another doc."""
    from lsearch_ray.functions import dup_shingle_stats_ds

    return dup_shingle_stats_ds(
        _docs(sf_dir, ["doc_id", "text"]), n=_DUPSPAN_N
    )


def _q_dup_span_removal(sf_dir: str):
    """Exact duplicated-span removal: every token covered by a
    cross-doc-duplicated 5-shingle occurrence is dropped and the doc is
    rebuilt from the surviving normalized tokens."""
    from lsearch_ray.functions import dup_span_removal_ds

    return dup_span_removal_ds(
        _docs(sf_dir, ["doc_id", "text"]), n=_DUPSPAN_N
    )


_LINE_WORDS = 5


def _lined_docs(sf_dir: str):
    """The line-family input: documents re-segmented into 5-word
    ``\\n``-lines (the synthetic corpus carries no newlines, so the
    CCNet-style line operators need a deterministic segmentation both
    the engine and the SQL twin can derive from the same table)."""
    from lsearch_ray.functions import reflow_lines_ds

    return reflow_lines_ds(
        _docs(sf_dir, ["doc_id", "text"]), words_per_line=_LINE_WORDS
    )


def _q_boilerplate_lines(sf_dir: str):
    """CCNet-style boilerplate-line detector: every line appearing in
    >= 2 distinct documents with its distinct-doc frequency."""
    from lsearch_ray.functions import boilerplate_lines_ds

    return boilerplate_lines_ds(_lined_docs(sf_dir), min_docs=2)


def _q_line_dedup(sf_dir: str):
    """CCNet-style per-line boilerplate removal: docs rebuilt with every
    >= 2-doc line dropped, plus per-doc line/removal counts."""
    from lsearch_ray.functions import line_dedup_ds

    return line_dedup_ds(_lined_docs(sf_dir), min_docs=2)


_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _textio_roundtrip(sf_dir: str, fmt: str):
    """documents → sharded JSONL/CSV under /tmp → Dataset: the
    interchange-ingest gate (both hops are streaming Ray pipelines;
    the oracle is the untouched parquet table, so any roundtrip
    infidelity breaks the value hash)."""
    from lsearch_ray.sources import textio

    out = os.path.join(
        "/tmp/lsearch_textio",
        os.path.basename(os.path.normpath(sf_dir)),
        f"documents_{fmt}",
    )
    getattr(textio, f"to_{fmt}")(_docs(sf_dir), out)
    reader = getattr(textio, f"read_{fmt}")
    return reader(out).select_columns(_DOC_COLS).sort("doc_id")


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL interchange ingest: parquet → sharded JSONL → Dataset."""
    return _textio_roundtrip(sf_dir, "jsonl")


def _q_csv_roundtrip(sf_dir: str):
    """CSV interchange ingest: parquet → sharded CSV → Dataset."""
    return _textio_roundtrip(sf_dir, "csv")


def _q_jsonl_gz_roundtrip(sf_dir: str):
    """Gzip-JSONL interchange ingest (the WET/WARC-sidecar compressed
    drop form): parquet → sharded .json.gz → Dataset, compression and
    decompression inside the read/write tasks via pyarrow's stream
    codec (sources.textio.to_jsonl_gz / read_jsonl_gz)."""
    return _textio_roundtrip(sf_dir, "jsonl_gz")


PREFIX_QUERY = "s"
PREFIX_MAX_EXP = 4  # binds at every sf (the corpus has 6 's'-terms)


def _q_bm25_prefix(sf_dir: str):
    """Wildcard ``s*`` BM25 top-10 with a BINDING Lucene-style rewrite
    cap: the prefix expands to the top-4 matching terms by (df desc,
    term asc), then scores as OR-BM25 over the expansion set."""
    from lsearch_ray.pipelines import bm25_prefix_topk_dataset

    return bm25_prefix_topk_dataset(
        _docs(sf_dir, ["doc_id", "text"]),
        PREFIX_QUERY,
        k=10,
        max_expansions=PREFIX_MAX_EXP,
    )


def _q_search_facets(sf_dir: str):
    """Search-facet sidebar counts: matching-doc count per language for
    the BM25 query's term set (any-term match; one map-side pass, a
    |facets|-row groupby, no doc-shaped shuffle)."""
    from lsearch_ray.pipelines import facet_counts_ds

    return facet_counts_ds(
        _docs(sf_dir, ["doc_id", "text", "lang"]), BM25_QUERY, facet_col="lang"
    )


def _q_slice_drift(sf_dir: str):
    """Per-language unigram total-variation drift vs the rest of the
    corpus — the slice-level distribution-shift monitor (exact-integer
    micro contract; functions.drift.slice_tv_drift_ds: one term-keyed
    combiner shuffle, partition-local numerator partials, bounded
    driver combine)."""
    from lsearch_ray.functions.drift import slice_tv_drift_ds

    return slice_tv_drift_ds(
        _docs(sf_dir, ["doc_id", "text", "lang"]), slice_col="lang"
    )


def _q_source_drift(sf_dir: str):
    """Per-source unigram TV drift vs the rest of the corpus — the
    same monitor keyed by source (crawl/feed provenance) instead of
    language."""
    from lsearch_ray.functions.drift import slice_tv_drift_ds

    return slice_tv_drift_ds(
        _docs(sf_dir, ["doc_id", "text", "source"]), slice_col="source"
    )


def _q_quality_classifier(sf_dir: str):
    """fastText-style linear quality classifier: deterministic
    distributed logistic regression (hashed features, full-batch GD)
    trained on lang=='en' as the proxy label, scoring every document.
    Iterative training — no SQL twin; gated by the bitwise-determinism
    and numpy-reference pytests (tests/test_classifier.py)."""
    from lsearch_ray.functions.classifier import (
        score_logreg_ds,
        train_logreg_ds,
    )

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    w = train_logreg_ds(
        docs, label_col="lang", label_value="en", dim=64, epochs=6, lr=1.0
    )
    return score_logreg_ds(_docs(sf_dir, ["doc_id", "text"]), w, dim=64)


_WINNOW_K = 4
_WINNOW_W = 4
_WINNOW_MAXDF = 64
_WINNOW_MINSH = 2


def _q_winnow_fps(sf_dir: str):
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS): distinct
    window-selected k-gram hashes with 1-based start positions."""
    from lsearch_ray.functions import winnow_fingerprints_ds

    return winnow_fingerprints_ds(
        _docs(sf_dir, ["doc_id", "text"]), k=_WINNOW_K, w=_WINNOW_W
    )


def _q_winnow_pairs(sf_dir: str):
    """Doc pairs sharing >= min_shared winnowing fingerprints, with
    boilerplate fingerprints pruned at max_df."""
    from lsearch_ray.functions import winnow_dup_pairs_ds

    return winnow_dup_pairs_ds(
        _docs(sf_dir, ["doc_id", "text"]),
        k=_WINNOW_K,
        w=_WINNOW_W,
        min_shared=_WINNOW_MINSH,
        max_df=_WINNOW_MAXDF,
    )


_SNIPPET_W = 10


def _q_snippets(sf_dir: str):
    """Best highlight window per matching doc: the window-token span
    with the most distinct BM25_QUERY terms, leftmost on ties."""
    from lsearch_ray.functions import snippets_ds

    return snippets_ds(
        _docs(sf_dir, ["doc_id", "text"]), BM25_QUERY, window=_SNIPPET_W
    )


def _q_bm25_snippets(sf_dir: str):
    """The composed search-results page: BM25 top-10 for BM25_QUERY,
    each hit carrying its best highlight window. The top-k side is 10
    rows — broadcast-joined onto the streaming snippet pass (never a
    shuffle join for a k-row side)."""
    import pyarrow as pa

    from lsearch_ray.functions import snippets_ds
    from lsearch_ray.functions.joins import broadcast_join
    from lsearch_ray.pipelines import bm25_topk_dataset

    docs = _docs(sf_dir, ["doc_id", "text"])
    top = pa.Table.from_pandas(
        bm25_topk_dataset(docs, BM25_QUERY, k=10).to_pandas(),
        preserve_index=False,
    )
    sn = snippets_ds(docs, BM25_QUERY, window=_SNIPPET_W)
    return broadcast_join(sn, top, on="doc_id").sort(
        ["score", "doc_id"], descending=[True, False]
    )


_QUOTA_CAPS = {"en": 100, "de": 40, "fr": 40}


def _q_quota_sample(sf_dir: str):
    from lsearch_ray.functions import quota_sample

    return quota_sample(
        _docs(sf_dir, ["doc_id", "lang"]), "lang", "doc_id", _QUOTA_CAPS
    ).sort("doc_id")


def _q_kmeans(sf_dir: str):
    from lsearch_ray.functions import kmeans_assign

    return kmeans_assign(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=_KMEANS_K,
        iters=_KMEANS_ITERS,
    ).sort("vec_id")


def _q_pagerank(sf_dir: str):
    """Fixed-iteration integer PageRank over the deterministic doc link
    graph (doc u -> fnv63(term) % n per distinct term of u)."""
    from lsearch_ray.functions.pagerank import doc_link_edges_ds, pagerank_ds

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()  # parquet metadata count — no scan
    edges = doc_link_edges_ds(docs, n)
    return pagerank_ds(edges, n, iters=3)


def _q_triangles(sf_dir: str):
    """Exact degree-ordered triangle count of the undirected link graph."""
    from lsearch_ray.functions.pagerank import doc_link_edges_ds, triangle_count_ds

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()
    return triangle_count_ds(doc_link_edges_ds(docs, n))


def _q_retention(sf_dir: str):
    """Cohort retention matrix: distinct users active per
    (first-activity day, days-since) cell."""
    from lsearch_ray.functions.funnel import retention_cohorts_ds

    ev = _read(sf_dir, "events", ["ts", "user_id"])
    return retention_cohorts_ds(ev)


def _q_dup_components(sf_dir: str):
    """Duplicate-cluster labels for every document: exact-verified n-gram
    Jaccard pairs (the ngram_jaccard_dedup pair stage) → distributed
    min-label propagation → total labeling (edge-free docs label
    themselves)."""
    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    return component_labels_ds(docs, pairs, "doc_id", num_partitions=8)


def _q_argmax_events(sf_dir: str):
    """Argmax-per-group duplicate resolution: for each (user, event type)
    keep the single highest-value event, event_id ascending as the
    deterministic tiebreak — exact_dedup with a descending order column
    (the keep-best-duplicate pattern of training-data pipelines)."""
    from lsearch_ray.functions.dedup import exact_dedup

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    out = exact_dedup(
        ev,
        ["user_id", "event_type"],
        ["value", "event_id"],
        ascending=[False, True],
        num_partitions=16,
    )
    return out.map_batches(
        lambda b: b.select(["user_id", "event_type", "event_id", "value"]),
        batch_format="pyarrow",
    ).sort(["user_id", "event_type"])


def _q_clustering_coeff(sf_dir: str):
    """Global clustering coefficient of the derived doc link graph:
    3·triangles / Σ d(d−1)/2 in integer micro units."""
    from lsearch_ray.functions.pagerank import (
        clustering_coeff_ds,
        doc_link_edges_ds,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()
    return clustering_coeff_ds(doc_link_edges_ds(docs, n))


def _q_audience_overlap(sf_dir: str):
    """Pairwise segment-audience overlap: exact intersection/union of the
    distinct-user sets of every event-type pair plus floor-micro
    Jaccard."""
    from lsearch_ray.functions.funnel import audience_overlap_ds

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return audience_overlap_ds(ev)


def _q_bm25_prf(sf_dir: str):
    """Pseudo-relevance-feedback BM25: top-5 feedback docs expand the
    query with 3 half-weighted terms, then rescore (Rocchio-style)."""
    from lsearch_ray.pipelines.fulltext import bm25_prf_topk_dataset

    return bm25_prf_topk_dataset(
        _docs(sf_dir, ["doc_id", "text"]),
        BM25_QUERY,
        k=10,
        fb_k=5,
        n_exp=3,
        exp_weight=0.5,
    )


def _q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two top-50 rankings — BM25 relevance and
    a length-quality prior — the standard hybrid-retrieval combiner."""
    from lsearch_ray.pipelines import bm25_topk_dataset
    from lsearch_ray.pipelines.fulltext import rrf_fuse

    a = bm25_topk_dataset(
        _docs(sf_dir, ["doc_id", "text"]), BM25_QUERY, k=50
    )
    bdf = (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(50)
        .to_pandas()
    )
    b = pa.table({"doc_id": pa.array(bdf["doc_id"], pa.int64())})
    return rrf_fuse([a, b], k=10)


def _q_pack_by_lang(sf_dir: str):
    """Per-language sequence packing: each language's id-ordered token
    stream split into its own 512-token context windows."""
    from lsearch_ray.functions.packing import pack_bins_by_group_ds

    out = pack_bins_by_group_ds(
        _docs(sf_dir, ["doc_id", "lang", "text"]),
        "lang",
        capacity=512,
        range_width=256,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["grp"],
                "n_tokens": b["n_tokens"],
                "bin_id": b["bin_id"],
            }
        ),
        batch_format="pyarrow",
    ).sort("doc_id")


def _q_token_budget_sample(sf_dir: str):
    """Deterministic 12k-token budget subsample: docs in stable hash
    order kept while the exclusive prefix token sum stays under budget."""
    from lsearch_ray.functions.packing import token_budget_sample_ds

    return token_budget_sample_ds(
        _docs(sf_dir, ["doc_id", "text"]), budget=12_000
    )


def _q_dataset_split(sf_dir: str):
    """Reproducible 90/5/5 train/val/test assignment by hash bucket."""
    from lsearch_ray.functions.sampling import hash_split_labels

    def split(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "split": hash_split_labels(b["doc_id"]),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(split, batch_format="pyarrow")
        .sort("doc_id")
    )


def _q_corpus_summary(sf_dir: str):
    """One-row corpus profile: doc count, total tokens, longest doc,
    vocabulary size — the ingest-report numbers, all exact integers."""
    from ray.data.aggregate import Max, Sum

    from lsearch_ray.pipelines.fulltext import tf_triples

    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata — no scan
    # ONE tokenize pass serves all three token aggregates: the
    # materialized triples feed the per-doc length rollup (sum/max) and
    # the distinct-term count (token-less docs have dl 0, which cannot
    # be the max of a non-empty corpus, so per-doc sums suffice)
    triples = tf_triples(docs).materialize()
    per_doc = triples.groupby("doc_id").aggregate(Sum("tf", alias_name="dl"))
    agg = per_doc.aggregate(
        Sum("dl", alias_name="tot"), Max("dl", alias_name="mx")
    )
    n_terms = triples.groupby("term").count().count()
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "total_tokens": pa.array([int(agg["tot"] or 0)], pa.int64()),
            "max_dl": pa.array([int(agg["mx"] or 0)], pa.int64()),
            "n_terms": pa.array([n_terms], pa.int64()),
        }
    )


def _q_dup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size distribution: how many duplicate clusters
    exist at each size (the dedup-report histogram), over the same
    component labeling dup_components emits."""
    from ray.data.aggregate import Count

    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    labels = component_labels_ds(docs, pairs, "doc_id", num_partitions=8)
    sizes = labels.groupby("component").aggregate(Count(alias_name="sz"))
    return (
        sizes.groupby("sz")
        .aggregate(Count(alias_name="n_clusters"))
        .map_batches(
            lambda b: pa.table(
                {
                    "cluster_size": pc.cast(b["sz"], pa.int64()),
                    "n_clusters": pc.cast(b["n_clusters"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("cluster_size")
    )


def _q_incremental_dedup(sf_dir: str):
    """Incremental-ingest dedup: incoming docs (id % 7 == 3) whose token
    fingerprint the base corpus does not already hold — bloom-pruned
    exact anti-join (m_bits small enough that false positives exist, so
    the exact verify stage is load-bearing)."""
    from lsearch_ray.functions import fingerprint
    from lsearch_ray.functions.bloom import bloom_anti_join

    fps = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            lambda b: fingerprint(b).select(["doc_id", "fp64"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def part(b: pa.Table, incoming: bool) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sel = (ids % 7) == 3
        return b.filter(pa.array(sel if incoming else ~sel))

    incoming = fps.map_batches(
        lambda b: part(b, True), batch_format="pyarrow"
    )
    base = fps.map_batches(lambda b: part(b, False), batch_format="pyarrow")
    return bloom_anti_join(incoming, base, "fp64", m_bits=1 << 14).sort(
        "doc_id"
    )


def _q_price_percentiles(sf_dir: str):
    """Every order's totalprice percent-rank within its priority class
    (the rank()-1 tie convention, integer micro units)."""
    from lsearch_ray.functions.grouped import grouped_rank_percentile_ds

    return grouped_rank_percentile_ds(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
        ),
        "o_orderpriority",
        "o_totalprice",
        id_cols=["o_orderkey"],
    ).sort("o_orderkey")


_MLT_SRC = 42


def _q_more_like_this(sf_dir: str):
    """Top-10 similar documents to doc 42 by TF-IDF cosine."""
    from lsearch_ray.pipelines.fulltext import more_like_this_dataset

    return more_like_this_dataset(
        _docs(sf_dir, ["doc_id", "text"]), _MLT_SRC, k=10
    )


def _q_transitions(sf_dir: str):
    """Top-20 user-journey event-type transitions (the Markov transition
    matrix over (ts, id)-ordered per-user streams)."""
    from lsearch_ray.functions.funnel import transition_counts_ds

    return transition_counts_ds(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        k=20,
    )


def _q_quality_filter(sf_dir: str):
    """Gopher/C4-style quality gate: docs passing fixed thresholds on the
    parity-checked quality signals (token count, alpha/digit/stopword
    ratios)."""
    from lsearch_ray.functions.textstats import quality_filter_ds

    return quality_filter_ds(_docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def _q_value_histogram(sf_dir: str):
    """Equi-width histogram of event values: bucket counts at 0.25-unit
    (250k-micro) width over the finite values."""
    from lsearch_ray.functions.quantiles import equi_width_hist_ds

    return equi_width_hist_ds(
        _read(sf_dir, "events", ["value"]), "value", width_micro=250_000
    )


def _q_bigram_lm(sf_dir: str):
    """Top-20 MLE bigram conditional probabilities P(w2|w1) in
    floor-micro units (count ordering, min_count 5)."""
    from lsearch_ray.functions.ngrams import bigram_lm_ds

    return bigram_lm_ds(
        _docs(sf_dir, ["doc_id", "text"]), k=20, min_count=5
    )


def _q_length_percentiles(sf_dir: str):
    """Every doc annotated with its global token-length percentile
    ((# shorter docs) · 1e6 // n — the rank()-1 tie convention)."""
    from lsearch_ray.functions.quantiles import value_percentiles_ds

    return value_percentiles_ds(_q_token_count(sf_dir), "n_tokens").sort(
        "doc_id"
    )


def _q_seed_distance(sf_dir: str):
    """K-hop directed BFS from the deterministic seed set (doc_id % 97 ==
    0) over the derived link graph — crawl-frontier depth labeling."""
    from lsearch_ray.functions.pagerank import bfs_distance_ds, doc_link_edges_ds

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()
    return bfs_distance_ds(doc_link_edges_ds(docs, n), n, iters=3)


def _q_hits(sf_dir: str):
    """Fixed-iteration integer HITS hubs/authorities over the derived
    link graph (micro-score units, conserved-total normalization)."""
    from lsearch_ray.functions.pagerank import doc_link_edges_ds, hits_ds

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()
    return hits_ds(doc_link_edges_ds(docs, n), n, iters=2)


def _q_pack_bins(sf_dir: str):
    """Sequence packing: context-window bin of every document when the
    id-ordered token stream is split every 512 tokens."""
    from lsearch_ray.functions.packing import pack_bins_ds

    return pack_bins_ds(
        _docs(sf_dir, ["doc_id", "text"]), capacity=512, range_width=256
    )


def _q_temp_sample(sf_dir: str):
    """Temperature-balanced (alpha = 0.5) language mixture sampling: keep
    rates proportional to sqrt(count)/count, deterministic hash filter."""
    from lsearch_ray.functions.mixture import temperature_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return temperature_sample(
        docs, "doc_id", "lang", target_num=1, target_den=3
    ).sort("doc_id")


def _q_corr_qty_disc(sf_dir: str):
    """Grouped Pearson correlation of quantity vs discount per return
    flag — exact integer fixed-point: per-batch moment-sum combiner, one
    tiny groupby, big-int finisher (corr_micro = millionths, magnitude
    floored before the sign so SQL's truncating ``//`` replays it)."""
    from lsearch_ray.functions.stats import grouped_corr_ds

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.add(b["l_quantity"], 0.5)), pa.int64())
        y = pc.cast(
            pc.floor(pc.add(pc.multiply(b["l_discount"], 100.0), 0.5)), pa.int64()
        )
        return pa.table({"l_returnflag": b["l_returnflag"], "x": x, "y": y})

    return grouped_corr_ds(
        li.map_batches(prep, batch_format="pyarrow"), "l_returnflag", "x", "y"
    ).sort("l_returnflag")


_DECAY_ANCHOR_US = 1_706_745_600_000_000  # 2024-02-01T00:00:00Z
_DECAY_HORIZON = 24


def _q_decayed_users(sf_dir: str):
    """Top-20 users by dyadic time-decayed activity: score =
    Σ cents · 2^(24 − age_days) over rows within the 24-day horizon
    behind the fixed anchor — freshness-weighted ranking in pure int64."""
    from lsearch_ray.functions.stats import decayed_topk_ds

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return decayed_topk_ds(
        ev,
        "user_id",
        "ts",
        "value",
        anchor_us=_DECAY_ANCHOR_US,
        horizon_days=_DECAY_HORIZON,
        scale=100,
        k=20,
    )


def _q_mad_by_type(sf_dir: str):
    """Per-event-type median absolute deviation (robust scale): median =
    lower-convention p50, mad = p50 of |v − median| — one IEEE subtract
    on exact data values, so order statistics agree bit-for-bit."""
    from lsearch_ray.functions.quantiles import grouped_mad_ds

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_mad_ds(ev, "event_type", "value", num_partitions=16)


def _q_negative_pairs(sf_dir: str):
    """Deterministic contrastive negative sampling: each doc pairs with
    the docs k·(n//3) ranks away on the 63-bit-hash ring (j ∈ {1,2}) —
    uniform-looking, reproducible partners with no RNG state."""
    from lsearch_ray.functions.sampling import negative_pairs_ds

    docs = _docs(sf_dir, ["doc_id"])
    return negative_pairs_ds(docs, "doc_id", k=2)


_RECALL_QUERY_IDS = [0, 1, 2, 3]


def _q_ann_recall(sf_dir: str):
    """Evaluation harness: recall@10 of the LSH-probed ANN arm vs the
    exact brute-force answer for 4 query vectors, in ONE corpus pass
    (matmul + bucket mask per batch, per-arm partial top-k)."""
    import pyarrow.parquet as pq

    from lsearch_ray.functions.ann_lsh import ann_recall_table

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, filters=[("vec_id", "in", _RECALL_QUERY_IDS)])
    order = np.argsort(qt["vec_id"].to_numpy())
    from lsearch_ray.functions.ann import _stack_embeddings

    qm = _stack_embeddings(qt["embedding"])[order].astype(np.float64)
    return ann_recall_table(
        _read(sf_dir, "embeddings"),
        qm,
        _RECALL_QUERY_IDS,
        k=10,
        nplanes=10,
        nprobe_hamming=1,
        seed=4242,
    )


def _q_outlier_events(sf_dir: str):
    """Per-type z-score anomaly flags (|z| > 3, population σ) with the
    quadratic test reduced to exact integer bounds — anomaly detection
    with zero float variance arithmetic on either engine."""
    from lsearch_ray.functions.stats import zscore_outliers_ds

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return zscore_outliers_ds(ev, "event_type", "event_id", "value", scale=100, z=3)


def _q_weighted_median_price(sf_dir: str):
    """Per-flag quantity-weighted median price: smallest price v with
    2·Σ{qty : price ≤ v} ≥ Σqty — the 50% point of shipped-unit mass,
    tie-order-free (equal prices pool weights before the test)."""
    from lsearch_ray.functions.quantiles import grouped_weighted_median_ds

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_extendedprice": b["l_extendedprice"],
                "w": pc.cast(pc.floor(pc.add(b["l_quantity"], 0.5)), pa.int64()),
            }
        )

    return grouped_weighted_median_ds(
        li.map_batches(prep, batch_format="pyarrow"),
        "l_returnflag",
        "l_extendedprice",
        "w",
    )


def _q_hourly_gapfill(sf_dir: str):
    """Zero-filled per-type hourly series on the dense [min, max] hour
    grid — densification for time-series modeling (absent cells as 0)."""
    from lsearch_ray.functions.windows import gapfill_hourly_counts_ds

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    return gapfill_hourly_counts_ds(ev, key_col="event_type", ts_col="ts")


def _q_windowed_dedup(sf_dir: str):
    """Streaming-style windowed dedup: keep only the FIRST event per
    (user, type, hour bucket) — the at-most-once-per-window ingestion
    rule, via exact_dedup with an hour-truncated key column."""
    from lsearch_ray.functions.dedup import exact_dedup

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    us_per_hour = 3_600_000_000

    def add_hour(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column(
            "hour_us", pa.array((us // np.int64(us_per_hour)) * us_per_hour)
        )

    kept = exact_dedup(
        ev.map_batches(add_hour, batch_format="pyarrow"),
        ["user_id", "event_type", "hour_us"],
        ["ts", "event_id"],
        ascending=[True, True],
        num_partitions=16,
    )
    return kept.map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "hour": b["hour_us"].cast(pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
    ).sort("event_id")


def _q_session_sizes(sf_dir: str):
    """Session-size histogram: number of sessions with exactly L events
    (30-min gap rule) — the engagement-shape distribution, one
    hash-partition pass + a tiny distinct-length aggregate."""
    from lsearch_ray.functions.joins import session_size_hist_ds

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    return session_size_hist_ds(ev)


_TC_MIN_COUNT, _TC_MIN_PMI = 5, 0


def _q_term_clusters(sf_dir: str):
    """Term-association clustering: PMI-filtered bigram graph (n ≥ 5,
    pmi ≥ 0, no self-loops) → distributed connected components; every
    vocabulary term labeled with the min-lex term of its cluster."""
    from lsearch_ray.functions.ngrams import term_clusters_ds

    return term_clusters_ds(
        _docs(sf_dir, ["doc_id", "text"]),
        min_count=_TC_MIN_COUNT,
        min_pmi_micro=_TC_MIN_PMI,
    )


_PROJ_DIM = 16


def _q_embed_project(sf_dir: str):
    """Johnson-Lindenstrauss random projection: embeddings onto 16
    seeded Gaussian directions, long-form fixed-point coordinates —
    the data-independent dim reduction before clustering at scale."""
    from lsearch_ray.functions.ann_lsh import project_embeddings_ds

    return project_embeddings_ds(
        _read(sf_dir, "embeddings"), out_dim=_PROJ_DIM, seed=4242
    ).sort(["vec_id", "dim"])


def _q_bigram_nll(sf_dir: str):
    """Order-2 perplexity scoring: per-doc NLL under the corpus MLE
    bigram LM in integer micro-nats (per-bigram log costs rounded
    BEFORE the weighted sum — the unigram_nll contract one order up)."""
    from lsearch_ray.functions.ngrams import bigram_nll_ds

    return bigram_nll_ds(_docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


_NOVELTY_N = 3


def _q_ngram_novelty(sf_dir: str):
    """Inter-document diversity: share of each doc's distinct 3-grams
    appearing in no other document (floor fixed-point)."""
    from lsearch_ray.functions.ngrams import ngram_novelty_ds

    return ngram_novelty_ds(
        _docs(sf_dir, ["doc_id", "text"]), n=_NOVELTY_N
    ).sort("doc_id")


_DSIR_BUCKETS = 64


def _q_dsir_weights(sf_dir: str):
    """DSIR hashed importance weights: per-doc log-likelihood ratio of
    hashed unigram features, target = lang='en' docs vs the raw corpus,
    integer micro-nats end to end."""
    from lsearch_ray.functions.dsir import dsir_weights_ds

    return dsir_weights_ds(
        _docs(sf_dir, ["doc_id", "lang", "text"]), buckets=_DSIR_BUCKETS
    ).sort("doc_id")


_KEY_K, _KEY_MIN = 20, 5


def _q_keyness_terms(sf_dir: str):
    """Slice-signature diagnostic: top-20 Dunning log-likelihood keyness
    terms of the lang='en' slice vs the rest of the corpus, integer
    micro-nat G2 (each ln bracket rounded before the count multiply)."""
    from lsearch_ray.functions.keyness import keyness_terms_ds

    return keyness_terms_ds(
        _docs(sf_dir, ["doc_id", "lang", "text"]), k=_KEY_K, min_count=_KEY_MIN
    )


def _q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (fixed level 6) — the model-free
    redundancy quality signal. No SQL twin (DuckDB has no zlib);
    pytest-verified against a direct zlib replay."""
    from lsearch_ray.functions.textstats import CompressionRatio

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(CompressionRatio, batch_format="pyarrow", concurrency=2)
        .sort("doc_id")
    )


def _q_hourly_anomalies(sf_dir: str):
    """Stream-health monitor: per-type hours whose volume deviates >3σ
    from the type's mean over the zero-filled hourly grid (exact
    integer inequality — the outlier_events contract on counts)."""
    from lsearch_ray.functions.windows import hourly_anomalies_ds

    ev = _read(sf_dir, "events", ["ts", "event_type"])
    return hourly_anomalies_ds(ev)


def _q_source_quality(sf_dir: str):
    """Per-source quality triage: doc counts, token mass and fixed-point
    quality ratios from pure integer sums — the keep/downweight/drop
    decision table for whole feeds."""
    from lsearch_ray.functions.textstats import source_quality_ds

    return source_quality_ds(_docs(sf_dir, ["doc_id", "source", "text"]))


def _q_source_dup_rate(sf_dir: str):
    """Per-source near-duplicate rate: share of each source's docs that
    sit in a multi-doc dup cluster (exact-verified n-gram Jaccard →
    components → cluster sizes → source rollup) — which feeds ship
    boilerplate."""
    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.joins import hash_join, safe_partitions
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs

    docs = _docs(sf_dir, ["doc_id", "source", "text"])
    labels = component_labels_ds(
        docs, ngram_jaccard_pairs(docs, threshold=0.8), "doc_id",
        num_partitions=8,
    ).materialize()
    sizes = (
        labels.groupby("component")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "component": b["component"].cast(pa.int64()),
                    "csize": b["count()"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    np_eff = safe_partitions(16, labels.count())
    flagged = hash_join(
        hash_join(labels, sizes, on="component", num_partitions=np_eff),
        docs.select_columns(["doc_id", "source"]),
        on="doc_id",
        num_partitions=np_eff,
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": pc.fill_null(
                    b["source"].combine_chunks().cast(pa.string()), "<none>"
                ),
                "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "n_dup": pc.greater(b["csize"], pa.scalar(1)).cast(pa.int64()),
            }
        )
        return t.group_by("source").aggregate(
            [("n_docs", "sum"), ("n_dup", "sum")]
        )

    agg = (
        flagged.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["n_docs_sum", "n_dup_sum"])
    )

    def final(b: pa.Table) -> pa.Table:
        nd = b["sum(n_docs_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        du = b["sum(n_dup_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(nd),
                "n_dup": pa.array(du),
                "dup_rate_micro": pa.array(du * 10**6 // nd),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow").sort("source")


def _q_lang_mismatch(sf_dir: str):
    """Metadata-vs-content confusion matrix: declared lang × predicted
    lang doc counts — the mislabeled-slice diagnostic (a doc whose text
    disagrees with its lang tag pollutes per-language corpora)."""
    from lsearch_ray.functions import LangId

    docs = _docs(sf_dir, ["doc_id", "lang", "text"])
    pred = docs.map_batches(LangId, batch_format="pyarrow", concurrency=2)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": pc.fill_null(
                    b["lang"].combine_chunks().cast(pa.string()), "<none>"
                ),
                "lang_pred": b["lang_pred"],
            }
        )
        agg = t.group_by(["lang", "lang_pred"]).aggregate([("lang", "count")])
        return pa.table(
            {
                "lang": agg["lang"],
                "lang_pred": agg["lang_pred"],
                "n": agg["lang_count"].cast(pa.int64()),
            }
        )

    return (
        pred.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .sum("n")
        .map_batches(
            lambda b: pa.table(
                {
                    "lang": b["lang"],
                    "lang_pred": b["lang_pred"],
                    "n": b["sum(n)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["lang", "lang_pred"])
    )


def _q_cluster_split(sf_dir: str):
    """Leakage-safe train/val/test split: near-duplicate clusters
    (exact-verified n-gram Jaccard pairs → distributed components) are
    assigned as UNITS — every member of a dup cluster hashes on the
    cluster LABEL, so near-dups can never straddle train and test."""
    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs
    from lsearch_ray.functions.sampling import hash_split_labels

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    labels = component_labels_ds(docs, pairs, "doc_id", num_partitions=8)

    def split(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "component": b["component"].cast(pa.int64()),
                "split": hash_split_labels(b["component"]),
            }
        )

    return labels.map_batches(split, batch_format="pyarrow").sort("doc_id")


def _source_quality_sql() -> str:
    """Exact SQL twin of textstats.source_quality_ds: per-source integer
    primitive sums (docs, tokens, stop hits, alpha bytes, text bytes)
    then floor fixed-point ratios — strlen is BYTES like the engine's
    binary_length; regexp_replace 'g' mirrors Arrow's replace-all."""
    from lsearch_ray.functions.textstats import _EN_STOPWORDS

    stops = ", ".join(repr(w) for w in sorted(_EN_STOPWORDS))
    return (
        f"WITH toks AS ({_TOKS}), "
        "ts AS (SELECT doc_id, count(*) AS tok, "
        f"  sum(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS stop "
        "  FROM toks GROUP BY 1), "
        "per AS (SELECT coalesce(d.source, '<none>') AS source, "
        "  coalesce(ts.tok, 0) AS tok, coalesce(ts.stop, 0) AS stop, "
        "  strlen(regexp_replace(coalesce(d.text, ''), '[^A-Za-z]', '', 'g'))"
        "    AS alpha, "
        "  strlen(coalesce(d.text, '')) AS chars "
        "  FROM documents d LEFT JOIN ts USING (doc_id)), "
        "a AS (SELECT source, count(*) AS n_docs, sum(tok) AS tok, "
        "  sum(stop) AS stop, sum(alpha) AS alpha, sum(chars) AS chars "
        "  FROM per GROUP BY 1) "
        "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
        "CAST(tok AS BIGINT) AS n_tokens, "
        "CAST(tok * 1000000 // n_docs AS BIGINT) AS tokens_per_doc_micro, "
        "CAST(stop * 1000000 // greatest(tok, 1) AS BIGINT) "
        "  AS stopword_ratio_micro, "
        "CAST(alpha * 1000000 // greatest(chars, 1) AS BIGINT) "
        "  AS alpha_ratio_micro "
        "FROM a ORDER BY source"
    )


def _cluster_split_sql() -> str:
    """Exact SQL twin of _q_cluster_split: the dup_components labeling
    (_cc_labels_sql — the recursive-closure twin shared with the
    dup_components oracle) hashed on the component label with the
    engine's finalized FNV-63 over the label's decimal string form."""
    hb = _mixed_hash63_of("CAST(component AS VARCHAR)")
    labels = _cc_labels_sql(_NGRAM_EDGES_CTE, "documents", "doc_id")
    return f"""
SELECT doc_id, component,
  CASE WHEN hb < 90 THEN 'train' WHEN hb < 95 THEN 'val' ELSE 'test' END
    AS split
FROM (SELECT doc_id, component, ({hb}) % 100 AS hb FROM ({labels}))
ORDER BY doc_id
"""


_SJ_SLICES = ["de", "en", "fr"]


def _q_slice_jaccard(sf_dir: str):
    """Slice-overlap diagnostic: exact Jaccard similarity of distinct
    3-gram sets between language slices (floor fixed-point)."""
    from lsearch_ray.functions.keyness import slice_jaccard_ds

    return slice_jaccard_ds(
        _docs(sf_dir, ["doc_id", "lang", "text"]), _SJ_SLICES, n=3
    )


_BPE_ITERS = 4


def _q_bpe_merges(sf_dir: str):
    """Distributed tokenizer training: the first 4 BPE merges learned
    over the corpus token stream (corpus-argmax pair per step, greedy
    left-to-right fuse, deterministic tie-break)."""
    from lsearch_ray.functions.bpe import bpe_merges_ds

    return bpe_merges_ds(_docs(sf_dir, ["doc_id", "text"]), iters=_BPE_ITERS)


def _q_bpe_tokenize(sf_dir: str):
    """Learn-then-apply: per-doc fused-stream lengths after applying all
    learned BPE merges (token-less docs report 0)."""
    from lsearch_ray.functions.bpe import bpe_apply_ds, bpe_merges_ds

    docs = _docs(sf_dir, ["doc_id", "text"])
    learned = bpe_merges_ds(docs, iters=_BPE_ITERS)
    merges = [
        (w1.replace(" ", "\x01"), w2.replace(" ", "\x01"))
        for w1, w2 in zip(
            learned["w1"].to_pylist(), learned["w2"].to_pylist()
        )
    ]
    return bpe_apply_ds(docs, merges).sort("doc_id")


_LEXICON = {
    # fixed taxonomy lexicon over the testdata documents vocabulary
    # (~31 head terms) — balanced so several topics actually win tags;
    # topics alphabetical, terms deduped/sorted inside lexicon_tag_ds
    "exec": ["batch", "filter", "scan", "stream", "window"],
    "relational": ["agg", "group", "join", "merge", "order", "sort"],
    "storage": ["column", "hash", "key", "row", "table", "vector"],
}


_SEMDEDUP_TAU = 400_000


def _q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means-clustered embeddings,
    within-cluster cosine ≥ 0.4 edges on the shared 6-dp grid,
    keep-min-per-component survivors
    (functions.semdedup.semdedup_survivors_ds — broadcast-centroid
    assignment, one cluster-keyed edge shuffle, distributed
    components)."""
    from lsearch_ray.functions.semdedup import semdedup_survivors_ds

    return semdedup_survivors_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=_KMEANS_K,
        iters=_KMEANS_ITERS,
        tau_micro=_SEMDEDUP_TAU,
    )


_CONT_THR, _CONT_MAXDF = 500_000, 64


def _q_containment_pairs(sf_dir: str):
    """Overlap-coefficient (containment) near-dup pairs: |A∩B| over
    min(|A|,|B|) of the distinct 5-shingle sets, ≥ 0.5 — the
    subset-duplication measure Jaccard dilutes
    (functions.containment.containment_pairs_ds — shingle-df-capped
    candidate shuffle, exact distributed set-intersection verify)."""
    from lsearch_ray.functions.containment import containment_pairs_ds

    return containment_pairs_ds(
        _docs(sf_dir, ["doc_id", "text"]),
        threshold_micro=_CONT_THR,
        max_df=_CONT_MAXDF,
    )


_CMS_K, _CMS_D, _CMS_W, _CMS_SEED = 20, 4, 256, 777


def _q_cms_term_counts(sf_dir: str):
    """Count-Min Sketch term frequencies: the mergeable depth×width
    integer summary vs the exact counts for the corpus top-20 terms
    (functions.sketches.cms_term_counts_ds — per-batch bincount
    partials, one ≤depth·width-row merge, bounded sketch broadcast;
    cms_est ≥ exact_n one-sided by construction)."""
    from lsearch_ray.functions.sketches import cms_term_counts_ds

    return cms_term_counts_ds(
        _docs(sf_dir, ["doc_id", "text"]),
        k=_CMS_K,
        depth=_CMS_D,
        width=_CMS_W,
        seed=_CMS_SEED,
    )


def _q_perplexity_buckets(sf_dir: str):
    """CCNet-style per-language perplexity terciles: head/middle/tail
    bucket per doc by exact per-group order-statistic thresholds over
    the integer unigram-LM perplexity proxy
    (pipelines.fulltext.perplexity_buckets_ds — one tokenize pass, one
    id join, one group-keyed threshold shuffle; no global sort)."""
    from lsearch_ray.pipelines.fulltext import perplexity_buckets_ds

    return perplexity_buckets_ds(
        _docs(sf_dir, ["doc_id", "text", "lang"]), n_buckets=3
    ).sort("doc_id")


def _q_lexicon_tags(sf_dir: str):
    """Taxonomy tagging: per-doc occurrence counts against a fixed
    topic→terms lexicon plus the alphabetical-argmax tag
    (functions.lexicon.lexicon_tag_ds — lexicon broadcast in the map
    closure, one vectorized is_in + bincount per topic, pure map-side,
    no shuffle)."""
    from lsearch_ray.functions.lexicon import lexicon_tag_ds

    return lexicon_tag_ds(
        _docs(sf_dir, ["doc_id", "text"]), _LEXICON
    ).sort("doc_id")


def _derive_snapshot_b(batch: pa.Table) -> pa.Table:
    """Deterministic recrawl snapshot B from snapshot A (the documents
    table): doc_id % 11 == 0 dropped (removed), % 7 == 0 survivors get
    ' updated' appended (changed), % 13 == 0 spawn a new doc at
    doc_id + 10^9 with ' new' appended (added). Pure arithmetic on the
    batch so engine and SQL twin derive the identical snapshot."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    keep = ids % 11 != 0
    kept = pa.array(keep)
    kept_ids = ids[keep]
    kept_text = text.filter(kept)
    updated = pc.binary_join_element_wise(
        kept_text, pa.scalar("updated"), pa.scalar(" ")
    )
    kept_text = pc.if_else(pa.array(kept_ids % 7 == 0), updated, kept_text)
    add = ids % 13 == 0
    add_text = pc.binary_join_element_wise(
        text.filter(pa.array(add)), pa.scalar("new"), pa.scalar(" ")
    )
    return pa.table(
        {
            "doc_id": pa.array(
                np.concatenate([kept_ids, ids[add] + 1_000_000_000])
            ),
            "text": pa.concat_arrays(
                [kept_text.cast(pa.string()), add_text.cast(pa.string())]
            ),
        }
    )


def _q_crawl_diff(sf_dir: str):
    """Recrawl snapshot diff: every url of snapshot A ∪ B classified
    added / removed / changed / same by 63-bit content fingerprint
    (functions.snapshot.snapshot_diff_ds — both sides fingerprinted
    map-side so the single key-keyed groupby-max shuffle carries
    (key, fp64) rows, never payloads; no join operator)."""
    from lsearch_ray.functions import fingerprint
    from lsearch_ray.functions.snapshot import snapshot_diff_ds

    def fp(ds):
        return ds.map_batches(
            lambda t: fingerprint(t).select(["doc_id", "fp64"]),
            batch_format="pyarrow",
        )

    a = _docs(sf_dir, ["doc_id", "text"])
    b = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _derive_snapshot_b, batch_format="pyarrow"
    )
    return snapshot_diff_ds(fp(a), fp(b))


def _q_bm25f_topk(sf_dir: str):
    """Field-weighted BM25 (simplified BM25F): the first 5 tokens form
    a pseudo-title whose occurrences carry 2 extra votes — weighted tf
    and dl scored through the standard saturation
    (pipelines.fulltext.bm25f_topk_dataset — one tokenize pass with the
    weighted-dl sidecar, broadcast idf, groupby-sum, round-before-sort
    top-k)."""
    from lsearch_ray.pipelines.fulltext import bm25f_topk_dataset

    return bm25f_topk_dataset(
        _docs(sf_dir, ["doc_id", "text"]), BM25_QUERY, k=10
    )


_MULTI_QUERIES = ["scan merge", "hash join", "window order sort"]


def _q_bm25_multi(sf_dir: str):
    """The REAL serving path under the driver gate: build the sharded
    codec index (delta+varint, block-max), stream a query batch through
    the BatchSearcher actor pool (contribution caches, pushdown reads),
    and emit (query_id, rank, doc_id, score) — the one registry entry
    whose scores come from the index engine rather than the Dataset
    twin. Scores round to 4 dp and rank is recomputed on the rounded
    order (the bm25_topk_dataset convention) so the SQL replay's
    float-sum ordering matches."""
    import shutil

    import ray.data as rd

    from lsearch_ray.index.build import build_index
    from lsearch_ray.index.search import BatchSearcher

    index_dir = os.path.join(
        "/tmp/lsearch_multi_idx",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    build_index(_docs(sf_dir, ["doc_id", "text"]), index_dir, num_shards=4)
    qt = pa.table(
        {
            "query_id": pa.array(range(len(_MULTI_QUERIES)), pa.int64()),
            "query": _MULTI_QUERIES,
        }
    )
    out = (
        rd.from_arrow(qt)
        .map_batches(
            BatchSearcher,
            fn_constructor_kwargs={"index_dir": index_dir, "k": 10, "mode": "or"},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .to_pandas()
    )  # <= 30 rows
    out["score"] = out["score"].round(4)
    out = out.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )


def _q_bm25_engine(sf_dir: str):
    """The scatter-gather serving path (QueryEngine: raw shard-holding
    actors, per-group exact top-k, driver merge) under the same oracle
    as bm25_multi — with this, all three serving paths (one-shot,
    BatchSearcher, QueryEngine) are correctness-gated: the first two by
    the driver's SQL oracle, the one-shot additionally rank-identical
    by pytest."""
    import shutil

    from lsearch_ray.index.build import build_index
    from lsearch_ray.index.search import QueryEngine

    index_dir = os.path.join(
        "/tmp/lsearch_engine_idx",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    build_index(_docs(sf_dir, ["doc_id", "text"]), index_dir, num_shards=4)
    eng = QueryEngine(index_dir, num_actors=2)
    import pandas as pd

    frames = []
    for qid, q in enumerate(_MULTI_QUERIES):
        t = eng.search(q, k=10, mode="or").to_pandas()
        t.insert(0, "query_id", qid)
        frames.append(t)
    out = pd.concat(frames, ignore_index=True)
    out["score"] = out["score"].round(4)
    out = out.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )


def _q_basket_lift(sf_dir: str):
    """Market-basket lift between event types over distinct-user
    audiences — "users who did A also did B"
    (functions.funnel.basket_lift_ds — composes the oracled
    audience-overlap intersections with distributed audience sizes;
    |types|²-bounded scoring rows, Python-int products)."""
    from lsearch_ray.functions.funnel import basket_lift_ds

    return basket_lift_ds(_read(sf_dir, "events", ["event_type", "user_id"]))


def _q_rfm_segments(sf_dir: str):
    """RFM user segmentation: exact corpus-wide tercile buckets of
    recency / frequency / monetary mass per user
    (functions.stats.rfm_segments_ds — one user-keyed combiner
    shuffle, exact integer-rank thresholds, 2-row broadcast per
    metric)."""
    from lsearch_ray.functions.stats import rfm_segments_ds

    return rfm_segments_ds(
        _read(sf_dir, "events", ["user_id", "ts", "value"])
    )


_PERCOLATE_QUERIES = {
    1: "merge sort",
    2: "hash join",
    3: "window order sort",
    4: "spark",
    5: "absent zzz",
}


def _q_percolate(sf_dir: str):
    """Stored-query (percolator) matching: every doc tested against a
    broadcast registry of conjunctive term queries; (doc_id, query_id)
    pairs for docs containing every term
    (pipelines.fulltext.percolate_ds — one tokenize + distinct-pair
    collapse per batch, one is_in+bincount per stored query, no
    shuffle)."""
    from lsearch_ray.pipelines.fulltext import percolate_ds

    return percolate_ds(
        _docs(sf_dir, ["doc_id", "text"]), _PERCOLATE_QUERIES
    ).sort(["doc_id", "query_id"])


def _q_tokenizer_fertility(sf_dir: str):
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word in exact floor-micro — the multilingual tokenizer-budget
    diagnostic (functions.textstats.tokenizer_fertility_ds — two RE2
    count kernels, per-batch lang partials, |langs|-row groupby)."""
    from lsearch_ray.functions.textstats import tokenizer_fertility_ds

    return tokenizer_fertility_ds(_docs(sf_dir, ["doc_id", "text", "lang"]))


def _q_int8_ann(sf_dir: str):
    """Scalar-quantized similarity search: symmetric per-vector int8
    quantize-dequantize (the 4×-smaller index storage form), then exact
    cosine top-10 vs the equally-quantized query vector
    (functions.ann.int8_cosine_topk — round-half-up spelled floor(x+.5)
    so DuckDB replays the quantization bit-identically)."""
    import pyarrow.parquet as pq

    from lsearch_ray.functions.ann import int8_cosine_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = np.array(
        pq.read_table(emb_path, filters=[("vec_id", "=", 0)])["embedding"][
            0
        ].as_py(),
        dtype=np.float64,
    )
    return int8_cosine_topk(_read(sf_dir, "embeddings"), qvec, k=10)


_COMPLETE_PREFIX = "s"


def _q_complete_prefix(sf_dir: str):
    """Type-ahead completion: top-8 dictionary terms with the prefix,
    ranked (df desc, term asc)
    (pipelines.fulltext.complete_prefix_ds — combiner df shuffle,
    map-side starts_with, lossless block prune)."""
    from lsearch_ray.pipelines.fulltext import complete_prefix_ds

    return complete_prefix_ds(
        _docs(sf_dir, ["doc_id", "text"]), _COMPLETE_PREFIX, k=8
    )


_REGEX_RANK_PAT = "s[a-z]*t"


def _q_regex_rank(sf_dir: str):
    """Regex-ranked retrieval: 1 + non-overlapping RE2 match count per
    doc, top-20 — the regex generalization of the reference's More
    scorer (pipelines.fulltext.regex_rank_ds — one
    count_substring_regex kernel per batch, lossless block prune)."""
    from lsearch_ray.pipelines.fulltext import regex_rank_ds

    return regex_rank_ds(
        _docs(sf_dir, ["doc_id", "text"]), _REGEX_RANK_PAT, k=20
    )


def _q_related_terms(sf_dir: str):
    """"Related searches": top-5 corpus continuations of the seed term
    by bigram count (pipelines.fulltext.related_terms_ds — combiner
    bigram shuffle filtered map-side to the seed's fan-out)."""
    from lsearch_ray.pipelines.fulltext import related_terms_ds

    return related_terms_ds(_docs(sf_dir, ["doc_id", "text"]), MORE_TERM, k=5)


def _q_bm25_collapse(sf_dir: str):
    """Near-duplicate-collapsed search results ("omitted similar
    results"): BM25 top-30 pool, best-ranked doc kept per corpus-wide
    near-dup cluster, top-10 survivors
    (pipelines.fulltext.bm25_collapse_topk_dataset — pool is k-bounded,
    cluster labels join back through a map-side is_in filter; composes
    the oracled BM25 and dup_components stages)."""
    from lsearch_ray.pipelines.fulltext import bm25_collapse_topk_dataset

    return bm25_collapse_topk_dataset(
        _docs(sf_dir, ["doc_id", "text"]), BM25_QUERY, k=10, pool=30
    )


def _q_url_filter(sf_dir: str):
    """Crawl-ingest URL blocklist gate: exact-host, host-suffix and RE2
    pattern rules with first-match-wins verdicts over deterministically
    derived page URLs (functions.urlfilter.url_gate_ds — rule set in
    the map closure, one extract_regex pass, np.select verdict fold; no
    shuffle). URLs derive as
    https://<source>.example.com/<lang>/<doc_id> identically in engine
    and SQL (the crawl_diff derivation convention)."""
    from lsearch_ray.functions.urlfilter import url_gate_ds

    def derive(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].cast(pa.large_string())
        url = pc.binary_join_element_wise(
            pa.scalar("https://", type=pa.large_string()),
            b["source"].cast(pa.large_string()),
            pa.scalar(".example.com/", type=pa.large_string()),
            b["lang"].cast(pa.large_string()),
            pa.scalar("/", type=pa.large_string()),
            ids,
            pa.scalar("", type=pa.large_string()),
        )
        return pa.table({"doc_id": b["doc_id"], "url": url})

    ds = _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        derive, batch_format="pyarrow"
    )
    out = url_gate_ds(
        ds,
        exact_hosts=["src3.example.com", "src7.example.com"],
        host_suffixes=["9.example.com"],
        url_patterns=[("blocked_pattern", "/e[sn]/[0-9]*7$")],
    )
    return out.map_batches(
        lambda b: b.select(["doc_id", "url", "host", "verdict"]),
        batch_format="pyarrow",
    )


def _q_kn_bigram_lm(sf_dir: str):
    """Interpolated Kneser-Ney bigram LM (d = 3/4) in exact floor-micro
    units — continuation-count smoothing over the MLE bigram model
    (functions.ngrams.kn_bigram_lm_ds — one combiner bigram shuffle,
    continuation aggregates over the type table, Python-int scoring of
    only the top-k rows)."""
    from lsearch_ray.functions.ngrams import kn_bigram_lm_ds

    return kn_bigram_lm_ds(
        _docs(sf_dir, ["doc_id", "text"]), k=20, min_count=5
    )


def _q_index_profile(sf_dir: str):
    """Posting-list skew report: terms and posting mass per log2-df
    bucket — the shard-sizing / hot-term-threshold diagnostic
    (pipelines.fulltext.index_profile_ds — one combiner term shuffle,
    ≤64-row bucket groupby)."""
    from lsearch_ray.pipelines.fulltext import index_profile_ds

    return index_profile_ds(_docs(sf_dir, ["doc_id", "text"]))


_FUZZY_QUERY = "sow"
_FUZZY_MAX_EXP = 4


def _q_bm25_fuzzy(sf_dir: str):
    """Fuzzy-term retrieval (Lucene ``term~1``): the misspelled query
    expands to the top-4 dictionary terms within Levenshtein ≤ 1 by
    (df desc, term asc), then OR-BM25 over the expansion set
    (pipelines.fulltext.bm25_fuzzy_topk_dataset — edit1 kernel on each
    batch's term dictionary, one tokenize pass with the avgdl
    sidecar)."""
    from lsearch_ray.pipelines.fulltext import bm25_fuzzy_topk_dataset

    return bm25_fuzzy_topk_dataset(
        _docs(sf_dir, ["doc_id", "text"]),
        _FUZZY_QUERY,
        k=10,
        max_expansions=_FUZZY_MAX_EXP,
    )


def _q_dedup_recall(sf_dir: str):
    """Near-dup evaluation harness: recall/precision of the MinHash
    banding candidate stage vs the COMPLETE exact-Jaccard ≥ 0.8 truth
    (functions.minhash.dedup_recall_table — truth from the uncapped
    shared-shingle shuffle, hit counting hash-partitioned on the pair
    key; one metrics row reaches the driver)."""
    from lsearch_ray.functions.minhash import dedup_recall_table

    return dedup_recall_table(_docs(sf_dir, ["doc_id", "text"]))


_SPELL_TERMS = ["ag", "merge", "qury", "sow"]
_SPELL_K = 5


def _q_vocab_growth_by_lang(sf_dir: str):
    """Per-language Heaps'-law curves over the SAME global doc_id
    ladder — which slice's vocabulary is still growing
    (functions.ngrams.grouped_vocab_growth_ds — one composite-keyed
    groupby-min shuffle, |langs|·8-row driver finish, zero-vocab cells
    emitted)."""
    from lsearch_ray.functions.ngrams import grouped_vocab_growth_ds

    return grouped_vocab_growth_ds(
        _docs(sf_dir, ["doc_id", "text", "lang"]),
        n_buckets=_VOCAB_GROWTH_BUCKETS,
    )


def _q_spell_suggest(sf_dir: str):
    """Did-you-mean: top-5 vocabulary terms within Levenshtein ≤ 1 of
    each (misspelled) query term, ranked by (df desc, term asc)
    (functions.editdist.spell_suggestions_ds — the df combiner shuffle
    is the only exchange; candidates verified map-side with the
    vectorized edit1 alignment kernel against the broadcast query
    terms, ranked by the grouped top-k prune)."""
    from lsearch_ray.functions.editdist import spell_suggestions_ds

    return spell_suggestions_ds(
        _docs(sf_dir, ["doc_id", "text"]), _SPELL_TERMS, k=_SPELL_K
    )


_VOCAB_GROWTH_BUCKETS = 8


def _q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth: distinct-term count of each corpus
    prefix over an 8-step doc_id ladder — the crawl-saturation /
    tokenizer-budget diagnostic (functions.ngrams.vocab_growth_ds — one
    term-keyed groupby-min shuffle, bucket bincount partials, driver
    holds only the 8-row bucket table)."""
    from lsearch_ray.functions.ngrams import vocab_growth_ds

    return vocab_growth_ds(
        _docs(sf_dir, ["doc_id", "text"]), n_buckets=_VOCAB_GROWTH_BUCKETS
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "tf_triples": _q_tf_triples,
        "term_df": _q_term_df,
        "doc_stats": _q_doc_stats,
        "bm25_or_topk": _q_bm25_or,
        "bm25_and_topk": _q_bm25_and,
        "more_rank": _q_more_rank,
        "has_filter": _q_has_filter,
        "events_filter": _q_events_filter,
        "q1_agg": _q_q1_agg,
        "top_orders": _q_top_orders,
        "dedup_events": _q_dedup_events,
        "dedup_documents": _q_dedup_documents,
        "ann_cosine": _q_ann_cosine,
        "token_count": _q_token_count,
        "lang_counts": _q_lang_counts,
        "events_hourly": _q_events_hourly,
        "events_sliding": _q_events_sliding,
        "range_join_orders": _q_range_join_orders,
        "asof_clicks_views": _q_asof_clicks_views,
        "sample_events": _q_sample_events,
        "stratified_sample": _q_stratified_sample,
        "heavy_terms": _q_heavy_terms,
        "quantiles_value": _q_quantiles_value,
        "quantiles_by_type": _q_quantiles_by_type,
        "distinct_users_kmv": _q_distinct_users_kmv,
        "hll_users": _q_hll_users,
        "priority_sample_lineitem": _q_priority_sample,
        "sparse_dup_pairs": _q_sparse_dup_pairs,
        "cdc_chunks": _q_cdc_chunks,
        "feature_hash": _q_feature_hash,
        "cdc_dedup": _q_cdc_dedup,
        "distinct_users_hourly": _q_distinct_users_hourly,
        "props_stats": _q_props_stats,
        "quality_stats": _q_quality,
        "bpe_token_count": _q_bpe_count,
        "salted_term_df": _q_salted_term_df,
        "fingerprint": _q_fingerprint,
        "langid": _q_langid,
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "ngram_jaccard_dedup": _q_ngram_jaccard_dedup,
        "dup_shingle_stats": _q_dup_shingle_stats,
        "dup_span_removal": _q_dup_span_removal,
        "boilerplate_lines": _q_boilerplate_lines,
        "line_dedup": _q_line_dedup,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "jsonl_gz_roundtrip": _q_jsonl_gz_roundtrip,
        "csv_roundtrip": _q_csv_roundtrip,
        "slice_drift": _q_slice_drift,
        "bm25_prefix_topk": _q_bm25_prefix,
        "source_drift": _q_source_drift,
        "quality_classifier": _q_quality_classifier,
        "search_facets": _q_search_facets,
    "winnow_fingerprints": _q_winnow_fps,
        "winnow_dup_pairs": _q_winnow_pairs,
        "snippets": _q_snippets,
        "bm25_snippets": _q_bm25_snippets,
        "embedding_dedup": _q_embedding_dedup,
        "lsh_ann": _q_lsh_ann,
        "bm25_phrase_topk": _q_bm25_phrase,
        "web_flagship": _q_web_flagship,
        "join_revenue": _q_join_revenue,
        "distinct_segments": _q_distinct_segments,
        "sessionize": _q_sessionize,
        "ivf_ann": _q_ivf_ann,
        "ivf_ann_oneshot": _q_ivf_ann_oneshot,
        "ngram_counts": _q_ngram_counts,
        "decontaminate": _q_decontaminate,
        "doc_repetition": _q_doc_repetition,
        "redact": _q_redact,
        "tfidf_terms": _q_tfidf_terms,
        "chunk_dedup": _q_chunk_dedup,
        "kmeans_clusters": _q_kmeans,
        "quota_sample": _q_quota_sample,
        "brand_revenue": _q_brand_revenue,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "unigram_nll": _q_unigram_nll,
        "pmi_bigrams": _q_pmi_bigrams,
        "priority_revenue": _q_priority_revenue,
        "running_totals": _q_running_totals,
        "urgent_revenue": _q_urgent_revenue,
        "fuzzy_decontaminate": _q_fuzzy_decontaminate,
        "knn_join": _q_knn_join,
        "rollup_revenue": _q_rollup_revenue,
        "funnel_counts": _q_funnel_counts,
        "trailing_window": _q_trailing_window,
        "extract_matches": _q_extract_matches,
        "winsorized_sums": _q_winsorized_sums,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "skipgram_counts": _q_skipgram_counts,
        "cust_order_dist": _q_cust_order_dist,
        "doc_entropy": _q_doc_entropy,
        "quality_pctl_gate": _q_quality_pctl_gate,
        "lang_pctl_gate": _q_lang_pctl_gate,
        "oov_rate": _q_oov_rate,
        "name_matches": _q_name_matches,
        "overlap_chunks": _q_overlap_chunks,
        "image_embed_knn": _q_image_embed_knn,
        "audio_embed_knn": _q_audio_embed_knn,
        "video_embed_knn": _q_video_embed_knn,
        "curation_pipeline": _q_curation_pipeline,
        "pagerank_docs": _q_pagerank,
        "triangle_count": _q_triangles,
        "retention_cohorts": _q_retention,
        "dup_components": _q_dup_components,
        "argmax_events": _q_argmax_events,
        "clustering_coeff": _q_clustering_coeff,
        "audience_overlap": _q_audience_overlap,
        "bm25_prf_topk": _q_bm25_prf,
        "rrf_fusion": _q_rrf_fusion,
        "length_percentiles": _q_length_percentiles,
        "bigram_lm": _q_bigram_lm,
        "value_histogram": _q_value_histogram,
        "quality_filter": _q_quality_filter,
        "transition_counts": _q_transitions,
        "more_like_this": _q_more_like_this,
        "price_percentiles": _q_price_percentiles,
        "incremental_dedup": _q_incremental_dedup,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "corpus_summary": _q_corpus_summary,
        "token_budget_sample": _q_token_budget_sample,
        "dataset_split": _q_dataset_split,
        "pack_by_lang": _q_pack_by_lang,
        "seed_distance": _q_seed_distance,
        "hits_scores": _q_hits,
        "pack_bins": _q_pack_bins,
        "temp_sample": _q_temp_sample,
        "corr_qty_disc": _q_corr_qty_disc,
        "decayed_users": _q_decayed_users,
        "mad_by_type": _q_mad_by_type,
        "negative_pairs": _q_negative_pairs,
        "ann_recall": _q_ann_recall,
        "outlier_events": _q_outlier_events,
        "weighted_median_price": _q_weighted_median_price,
        "hourly_gapfill": _q_hourly_gapfill,
        "windowed_dedup": _q_windowed_dedup,
        "session_sizes": _q_session_sizes,
        "term_clusters": _q_term_clusters,
        "embed_project": _q_embed_project,
        "bigram_nll": _q_bigram_nll,
        "ngram_novelty": _q_ngram_novelty,
        "dsir_weights": _q_dsir_weights,
        "bpe_merges": _q_bpe_merges,
        "bpe_tokenize": _q_bpe_tokenize,
        "keyness_terms": _q_keyness_terms,
        "slice_jaccard": _q_slice_jaccard,
        "cluster_split": _q_cluster_split,
        "lang_mismatch": _q_lang_mismatch,
        "compression_ratio": _q_compression_ratio,
        "source_quality": _q_source_quality,
        "source_dup_rate": _q_source_dup_rate,
        "hourly_anomalies": _q_hourly_anomalies,
        "lexicon_tags": _q_lexicon_tags,
        "perplexity_buckets": _q_perplexity_buckets,
        "cms_term_counts": _q_cms_term_counts,
        "containment_pairs": _q_containment_pairs,
        "semdedup": _q_semdedup,
        "vocab_growth": _q_vocab_growth,
        "spell_suggest": _q_spell_suggest,
        "crawl_diff": _q_crawl_diff,
        "dedup_recall": _q_dedup_recall,
        "bm25f_topk": _q_bm25f_topk,
        "bm25_fuzzy_topk": _q_bm25_fuzzy,
        "index_profile": _q_index_profile,
        "kn_bigram_lm": _q_kn_bigram_lm,
        "url_filter": _q_url_filter,
        "bm25_collapse_topk": _q_bm25_collapse,
        "regex_rank": _q_regex_rank,
        "related_terms": _q_related_terms,
        "frame_dedup": _q_frame_dedup,
        "complete_prefix": _q_complete_prefix,
        "int8_ann": _q_int8_ann,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "percolate": _q_percolate,
        "rfm_segments": _q_rfm_segments,
        "basket_lift": _q_basket_lift,
        "bm25_multi": _q_bm25_multi,
        "bm25_engine": _q_bm25_engine,
        "vocab_growth_by_lang": _q_vocab_growth_by_lang,
    }


# ----------------------------------------------------------- oracle SQL ----

_TOKS = (
    "SELECT doc_id, lower(u.t) AS term FROM documents, "
    "UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t) "
    "WHERE u.t <> ''"
)

_TF = f"SELECT doc_id, term, count(*) AS tf FROM ({_TOKS}) GROUP BY doc_id, term"

_DL = f"SELECT doc_id, count(*) AS dl FROM ({_TOKS}) GROUP BY doc_id"

def _bm25_body(query: str) -> str:
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
          sum(dl) / (SELECT count(*) FROM documents) AS avgdl FROM dl),
qt AS (SELECT DISTINCT lower(u.t) AS term FROM UNNEST(string_split_regex(lower('{query}'), '[^a-z0-9]+')) AS u(t) WHERE u.t <> ''),
df AS (SELECT tf.term, count(*) AS df FROM tf JOIN qt ON tf.term = qt.term GROUP BY tf.term),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
             * tf.tf*({K1}+1.0)/(tf.tf + {K1}*(1.0-{B}+{B}*dl.dl/s.avgdl))) AS score,
         count(*) AS nt
  FROM tf JOIN df ON tf.term = df.term
       JOIN dl ON tf.doc_id = dl.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id
)
"""


_BM25_BODY = _bm25_body(BM25_QUERY)

def _search_facets_sql() -> str:
    """Oracle for search_facets: per-language count of docs whose token
    list intersects the query's term set (any-term match)."""
    terms = ", ".join(
        f"'{t}'" for t in sorted(set(BM25_QUERY.lower().split()))
    )
    return f"""
SELECT coalesce(lang, '') AS facet, count(*) AS n_docs
FROM documents
WHERE list_has_any(
        list_filter(string_split_regex(lower(coalesce(text, '')),
                                       '[^a-z0-9]+'), x -> x <> ''),
        [{terms}])
GROUP BY 1 ORDER BY 1
"""


def _bm25_prefix_sql() -> str:
    """Oracle for bm25_prefix_topk: the ``s*`` expansion is the top-4
    matching terms by (df desc, term asc) — the same binding rewrite
    cap as the engine — then plain OR-BM25 over the expansion set."""
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
          sum(dl) / (SELECT count(*) FROM documents) AS avgdl FROM dl),
df AS (
  SELECT term, df FROM (
    SELECT tf.term, count(*) AS df FROM tf
    WHERE tf.term LIKE '{PREFIX_QUERY}%' GROUP BY tf.term
    ORDER BY df DESC, term LIMIT {PREFIX_MAX_EXP}
  )
),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
             * tf.tf*({K1}+1.0)/(tf.tf + {K1}*(1.0-{B}+{B}*dl.dl/s.avgdl))) AS score
  FROM tf JOIN df ON tf.term = df.term
       JOIN dl ON tf.doc_id = dl.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10
"""


PHRASE_QUERY = "table hash"


def _phrase_sql() -> str:
    """Oracle for bm25_phrase_topk: docs containing the exact adjacent
    token sequence, ranked by BM25 over the phrase terms (the engine side
    runs the real positional index via index.search.phrase_search)."""
    words = PHRASE_QUERY.split()
    joins = " ".join(
        f"JOIN tok t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i} "
        f"AND t{i}.term = '{w}'"
        for i, w in enumerate(words[1:], start=1)
    )
    return (
        _bm25_body(PHRASE_QUERY)
        + f""",
tok AS ({_ORDERED_TOKS}),
phrase_docs AS (
  SELECT DISTINCT t0.doc_id FROM tok t0 {joins}
  WHERE t0.term = '{words[0]}'
)
SELECT s.doc_id, round(s.score, 4) AS score
FROM scores s JOIN phrase_docs p ON s.doc_id = p.doc_id
ORDER BY s.score DESC, s.doc_id LIMIT 10
"""
    )


def _redact_sql() -> str:
    """Oracle for the redact query: DuckDB and pyarrow.compute both run
    RE2, so the engine's patterns replay verbatim — counts are taken on
    the text each pattern actually sees (after earlier replacements),
    matching redact_text's sequential contract."""
    from lsearch_ray.functions.textstats import DEFAULT_REDACT_PATTERNS

    expr = "text"
    counts = []
    for name, pat, repl in DEFAULT_REDACT_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return (
        "SELECT doc_id, "
        + ", ".join(counts)
        + f", {expr} AS clean_text FROM documents ORDER BY doc_id"
    )


def _kmeans_ctes(k: int, iters: int) -> str:
    """The Lloyd-k-means CTE chain shared by _kmeans_sql and the
    semdedup twin; the final assignment lives in CTE ``a{iters}``."""
    rnd = "floor({} * 1000000 + 0.5) / 1000000"
    parts = [
        "WITH e AS (SELECT vec_id, d, v FROM ("
        "  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v, "
        "         generate_subscripts(embedding, 1) AS d FROM embeddings))",
        "seed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl "
        f"        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))",
        "c0 AS (SELECT s.cl, e.d, e.v FROM seed s JOIN e USING (vec_id))",
    ]
    for i in range(iters + 1):
        dist = rnd.format("sum((e.v - c.v) * (e.v - c.v))")
        parts.append(
            f"d{i} AS (SELECT e.vec_id, c.cl, {dist} AS dist "
            f"        FROM e JOIN c{i} c USING (d) GROUP BY e.vec_id, c.cl)"
        )
        parts.append(
            f"a{i} AS (SELECT vec_id, cl FROM ("
            "          SELECT vec_id, cl, row_number() OVER ("
            "            PARTITION BY vec_id ORDER BY dist, cl) AS rn "
            f"         FROM d{i}) WHERE rn = 1)"
        )
        if i < iters:
            cent = rnd.format("avg(e.v)")
            parts.append(
                f"c{i + 1} AS (SELECT a.cl, e.d, {cent} AS v "
                f"        FROM a{i} a JOIN e USING (vec_id) GROUP BY a.cl, e.d)"
            )
    return ", ".join(parts)


def _kmeans_sql(k: int, iters: int) -> str:
    """Lloyd k-means unrolled as CTEs — the exact twin of
    functions/kmeans.kmeans_assign: init from the k lowest vec_ids in id
    order, squared-euclidean distances rounded half-up to 6 dp before
    the argmin (ties → lowest cluster), per-dim AVG centroids rounded to
    the same grid each iteration, a final assignment against the last
    centroids. The shared fixed-point grid is what makes float
    summation-order differences between DuckDB and numpy invisible."""
    return (
        _kmeans_ctes(k, iters)
        + f" SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM a{iters} "
        "ORDER BY vec_id"
    )


def _grams_sql(n: int) -> str:
    """Word n-grams per document: same `[a-z0-9]+` token runs as _TOKS,
    re-joined with single spaces (the engine renders GRAM_SEP as ' ').
    DuckDB list slicing is 1-based and end-inclusive, hence [i : i+n-1]."""
    return (
        f"SELECT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS gram "
        "FROM (SELECT doc_id, "
        "        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
        "                    t -> t <> '') AS toks "
        "      FROM documents), "
        f"     UNNEST(generate_series(1, len(toks) - {n} + 1)) AS g(i)"
    )


# ordered tokens with positions (UNNEST and generate_subscripts must sit
# together in the SELECT list — one in FROM would cross-multiply them)
_ORDERED_TOKS = (
    "SELECT doc_id, term, pos FROM ("
    "  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos"
    "  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS toks"
    "        FROM documents)"
    ") WHERE term <> ''"
)

# FNV-1a-64 of a string expression, masked to 63 bits — the exact arithmetic
# of corpus.fnv1a64 (h = (h ^ byte) * 0x100000001B3 mod 2^64), expressible in
# DuckDB because a 64-bit × 40-bit product fits HUGEINT (int128)
_FNV_BASIS = "CAST(14695981039346656037 AS HUGEINT)"
_FNV_STEP = (
    "(acc, x) -> (xor(acc, x) * 1099511628211) "
    "% CAST(18446744073709551616 AS HUGEINT)"
)


def _fnv63_of(expr: str) -> str:
    return (
        f"list_reduce(list_prepend({_FNV_BASIS}, "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(ord(substr({expr}, i, 1)) AS HUGEINT))), {_FNV_STEP}) "
        "% CAST(9223372036854775808 AS HUGEINT)"
    )


def _mixed_hash63_of(expr: str) -> str:
    """functions.sampling._key_hash63 twin: FNV-1a63 of the string form,
    finished with an odd-constant multiply mod 2^64, re-masked to 63
    bits (the mix restores uniformity for short keys)."""
    return (
        f"(({_fnv63_of(expr)}) * 11400714819323198485) "
        "% CAST(18446744073709551616 AS HUGEINT) "
        "% CAST(9223372036854775808 AS HUGEINT)"
    )


def _fp_rel(src: str) -> str:
    """fp64-per-doc subquery over relation ``src`` (doc_id, text) — the
    fingerprint twin parametrized over its source so derived snapshots
    (crawl_diff) reuse the exact arithmetic."""
    ordered = (
        "SELECT doc_id, term, pos FROM ("
        "  SELECT doc_id, unnest(toks) AS term,"
        "         generate_subscripts(toks, 1) AS pos"
        "  FROM (SELECT doc_id,"
        "               string_split_regex(lower(text), '[^a-z0-9]+') AS toks"
        f"        FROM {src})"
        ") WHERE term <> ''"
    )
    return f"""(
WITH toks AS ({ordered}),
dt AS (SELECT DISTINCT term FROM toks),
th AS (SELECT term, {_fnv63_of('term')} AS h FROM dt),
ordered AS (
  SELECT t.doc_id, list(th.h ORDER BY t.pos) AS hs
  FROM toks t JOIN th ON t.term = th.term GROUP BY t.doc_id
),
fp AS (
  SELECT doc_id,
    CAST(list_reduce(list_prepend({_FNV_BASIS}, hs), {_FNV_STEP})
         % CAST(9223372036854775808 AS HUGEINT) AS BIGINT) AS fp64
  FROM ordered
)
SELECT d.doc_id,
       coalesce(fp.fp64,
                CAST(14695981039346656037 % 9223372036854775808 AS BIGINT)) AS fp64
FROM {src} d LEFT JOIN fp ON d.doc_id = fp.doc_id)"""


def _bm25_multi_sql() -> str:
    """Oracle for bm25_multi: each query's rounded-score top-10 via the
    shared BM25 body, UNION ALL'd, rank recomputed per query on the
    rounded order — the codec serving path must land on the same rows."""
    parts = []
    for qid, q in enumerate(_MULTI_QUERIES):
        parts.append(
            f"SELECT {qid} AS query_id, doc_id, score FROM ("
            f"{_bm25_body(q)} "
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "ORDER BY score DESC, doc_id LIMIT 10)"
        )
    inner = " UNION ALL ".join(parts)
    return (
        "SELECT query_id, CAST(row_number() OVER ("
        "  PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT)"
        "  AS rank, doc_id, score "
        f"FROM ({inner}) ORDER BY query_id, rank"
    )


def _fingerprint_sql() -> str:
    """Exact SQL twin of functions.textstats.fingerprint: 63-bit FNV of
    each token, rolling-combined in token order with the same mult-mod,
    final 63-bit mask; token-less docs keep the masked offset basis."""
    return f"SELECT * FROM {_fp_rel('documents')}"


def _langid_sql() -> str:
    """Exact SQL twin of functions.textstats.LangId: per-language profile
    hit fraction over the token stream (with multiplicity), argmax with
    alphabetical tie-break, 'und' when every score is zero."""
    from lsearch_ray.functions.textstats import LANG_PROFILES

    prof_rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(LANG_PROFILES)
        for w in sorted(LANG_PROFILES[lang])
    )
    return f"""
WITH toks AS ({_TOKS}),
cnt AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
prof(lang, word) AS (VALUES {prof_rows}),
hits AS (SELECT t.doc_id, p.lang, count(*) AS h
         FROM toks t JOIN prof p ON t.term = p.word GROUP BY 1, 2),
combos AS (
  SELECT d.doc_id, l.lang, coalesce(c.n, 0) AS n
  FROM documents d CROSS JOIN (SELECT DISTINCT lang FROM prof) l
  LEFT JOIN cnt c ON d.doc_id = c.doc_id
),
scored AS (
  SELECT cb.doc_id, cb.lang,
         CASE WHEN cb.n = 0 THEN 0.0
              ELSE coalesce(h.h, 0) * 1.0 / cb.n END AS score
  FROM combos cb LEFT JOIN hits h ON cb.doc_id = h.doc_id AND cb.lang = h.lang
),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM scored
)
SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
FROM best WHERE rn = 1
"""


def _lsh_ann_sql() -> str:
    """Exact SQL twin of functions.ann_lsh.lsh_cosine_topk (nplanes=10,
    seed 4242, hamming-1 probe): the seeded hyperplanes are embedded as
    float literals, buckets are sign-bit integers, probing is a popcount
    condition, survivors get exact cosine top-k."""
    from lsearch_ray.functions.ann_lsh import _planes

    planes = _planes(64, 10, 4242)
    plane_rows = ", ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in planes[:, j])}]::DOUBLE[])"
        for j in range(planes.shape[1])
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
planes(j, p) AS (VALUES {plane_rows}),
dots AS (SELECT e.vec_id, pl.j, list_dot_product(e.v, pl.p) AS dp
         FROM e CROSS JOIN planes pl),
buckets AS (SELECT vec_id, CAST(sum(CASE WHEN dp > 0 THEN 1 << j ELSE 0 END)
                                 AS BIGINT) AS bkt
            FROM dots GROUP BY 1),
qb AS (SELECT CAST(sum(CASE WHEN list_dot_product(q.qv, pl.p) > 0
                            THEN 1 << pl.j ELSE 0 END) AS BIGINT) AS bkt
       FROM q CROSS JOIN planes pl),
cand AS (SELECT b.vec_id FROM buckets b, qb
         WHERE bit_count(xor(b.bkt, qb.bkt)) <= 1)
SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 4) AS sim
FROM e JOIN cand ON e.vec_id = cand.vec_id, q
ORDER BY sim DESC, e.vec_id LIMIT 10
"""


def _ann_recall_sql() -> str:
    """Exact SQL twin of functions.ann_lsh.ann_recall_table (nplanes=10,
    seed 4242, hamming-1 probe, 4 query vectors): both arms ranked by
    (rounded cosine desc, vec_id), recall = overlap·100 // 10."""
    from lsearch_ray.functions.ann_lsh import _planes

    planes = _planes(64, 10, 4242)
    plane_rows = ", ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in planes[:, j])}]::DOUBLE[])"
        for j in range(planes.shape[1])
    )
    qids = ", ".join(str(i) for i in _RECALL_QUERY_IDS)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qids})),
planes(j, p) AS (VALUES {plane_rows}),
buckets AS (SELECT e.vec_id,
    CAST(sum(CASE WHEN list_dot_product(e.v, pl.p) > 0 THEN 1 << pl.j ELSE 0 END)
         AS BIGINT) AS bkt
  FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
qb AS (SELECT qs.qid,
    CAST(sum(CASE WHEN list_dot_product(qs.qv, pl.p) > 0 THEN 1 << pl.j ELSE 0 END)
         AS BIGINT) AS bkt
  FROM qs CROSS JOIN planes pl GROUP BY qs.qid),
sims AS (SELECT qs.qid, e.vec_id,
    round(list_cosine_similarity(e.v, qs.qv), 4) AS sim, b.bkt, qb.bkt AS qbkt
  FROM e CROSS JOIN qs
  JOIN buckets b ON b.vec_id = e.vec_id JOIN qb ON qb.qid = qs.qid),
exact AS (SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
    FROM sims) WHERE rn <= 10),
approx AS (SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
    FROM sims WHERE bit_count(xor(bkt, qbkt)) <= 1) WHERE rn <= 10)
SELECT ex.qid AS query_id, CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.vec_id) * 100 // 10 AS BIGINT) AS recall_pct
FROM exact ex LEFT JOIN approx ap ON ap.qid = ex.qid AND ap.vec_id = ex.vec_id
GROUP BY ex.qid ORDER BY ex.qid
"""


def _term_clusters_sql() -> str:
    """Exact SQL twin of functions.ngrams.term_clusters_ds: the
    pmi_bigrams scoring CTEs (identical ln decomposition), edges =
    pairs with n ≥ min_count and pmi_micro ≥ min_pmi (self-loops out),
    then the recursive min-label closure over VARCHAR terms (least()
    is lexicographic — exactly the engine's sorted-vocab ordinal min)."""
    return f"""
WITH uni AS (SELECT term, count(*) AS n1 FROM ({_TOKS}) GROUP BY term),
big AS (SELECT toks[i] AS w1, toks[i+1] AS w2, count(*) AS n2
  FROM (SELECT list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> t <> '') AS toks FROM documents),
       UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
  GROUP BY 1, 2),
t1 AS (SELECT sum(n1) AS s FROM uni),
b2 AS (SELECT sum(n2) AS s FROM big),
p AS (SELECT w1, w2,
        CAST(floor((ln(n2 * 1.0) - ln(ua.n1 * 1.0) - ln(ub.n1 * 1.0)
          + (2.0 * ln(t1.s * 1.0) - ln(b2.s * 1.0)))
          * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
      FROM big CROSS JOIN t1 CROSS JOIN b2
      JOIN uni ua ON ua.term = big.w1
      JOIN uni ub ON ub.term = big.w2
      WHERE n2 >= {_TC_MIN_COUNT}),
edges AS (SELECT w1 AS a, w2 AS b FROM p
          WHERE pmi_micro >= {_TC_MIN_PMI} AND w1 <> w2),
sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.src, s.b FROM r JOIN sym s ON r.dst = s.a
  ) SELECT src, dst FROM r
),
lbl AS (SELECT src, least(src, min(dst)) AS comp FROM reach GROUP BY src)
SELECT u.term, coalesce(l.comp, u.term) AS comp_term
FROM uni u LEFT JOIN lbl l ON l.src = u.term ORDER BY u.term
"""


def _bpe_step_ctes(k: int, apply: bool) -> list[str]:
    """Per-step CTE blocks shared by _bpe_merges_sql and
    _bpe_tokenize_sql: pair the stream (lead() per doc), take the
    (n DESC, w1, w2) argmax, and — when ``apply`` — rebuild the stream
    with the greedy left-to-right fuse (runs of consecutive candidates
    keep odd 1-based ordinals, exactly the engine's run-parity kernel;
    fused tokens join with chr(1)). bs{k} is LEFT-joined ON TRUE so an
    empty step passes the stream through unchanged (engine early-stop
    parity)."""
    parts = [
        f"pr{k} AS (SELECT doc_id, p, tok, lead(tok) OVER "
        f"(PARTITION BY doc_id ORDER BY p) AS nxt FROM t{k - 1})",
        f"bs{k} AS (SELECT tok AS w1, nxt AS w2, count(*) AS n "
        f"FROM pr{k} WHERE nxt IS NOT NULL GROUP BY 1, 2 "
        "ORDER BY n DESC, w1, w2 LIMIT 1)",
    ]
    if apply:
        parts += [
            f"cd{k} AS (SELECT pr.doc_id, pr.p, pr.tok, pr.nxt, "
            "coalesce(pr.tok = bs.w1 AND pr.nxt = bs.w2, FALSE) AS cand "
            f"FROM pr{k} pr LEFT JOIN bs{k} bs ON TRUE)",
            f"ck{k} AS (SELECT doc_id, p FROM ("
            "SELECT doc_id, p, row_number() OVER "
            "(PARTITION BY doc_id, grp ORDER BY p) AS o FROM ("
            "SELECT doc_id, p, p - row_number() OVER "
            "(PARTITION BY doc_id ORDER BY p) AS grp "
            f"FROM cd{k} WHERE cand)) WHERE o % 2 = 1)",
            f"t{k} AS (SELECT doc_id, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY p) AS p, tok FROM ("
            "SELECT c.doc_id, c.p, CASE WHEN m.p IS NOT NULL "
            "THEN c.tok || chr(1) || c.nxt ELSE c.tok END AS tok "
            f"FROM cd{k} c "
            f"LEFT JOIN ck{k} m ON m.doc_id = c.doc_id AND m.p = c.p "
            f"LEFT JOIN ck{k} cons ON cons.doc_id = c.doc_id "
            "AND cons.p = c.p - 1 WHERE cons.p IS NULL))",
        ]
    return parts


_BPE_T0 = (
    "t0 AS (SELECT doc_id, row_number() OVER "
    "(PARTITION BY doc_id ORDER BY pos) AS p, term AS tok "
    f"FROM ({_ORDERED_TOKS}))"
)


def _bpe_merges_sql(iters: int) -> str:
    """Exact SQL twin of functions.bpe.bpe_merges_ds, unrolled per merge
    step (the kmeans-CTE pattern); see _bpe_step_ctes for the per-step
    blocks. The final step skips the apply (its stream is never read)."""
    parts = [_BPE_T0]
    sel = []
    for k in range(1, iters + 1):
        parts += _bpe_step_ctes(k, apply=k < iters)
        sel.append(
            f"SELECT CAST({k} AS BIGINT) AS step, "
            "replace(w1, chr(1), ' ') AS w1, "
            "replace(w2, chr(1), ' ') AS w2, "
            f"CAST(n AS BIGINT) AS n FROM bs{k}"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + " "
        + " UNION ALL ".join(sel)
        + " ORDER BY step"
    )


def _bpe_tokenize_sql(iters: int) -> str:
    """Exact SQL twin of learn-then-apply: the shared step CTEs extended
    through t{iters} (every learned merge applied), then per-doc
    fused-stream lengths; token-less documents report 0."""
    parts = [_BPE_T0]
    for k in range(1, iters + 1):
        parts += _bpe_step_ctes(k, apply=True)
    parts.append(
        f"lens AS (SELECT doc_id, count(*) AS n FROM t{iters} GROUP BY 1)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT d.doc_id, CAST(coalesce(lens.n, 0) AS BIGINT) "
        "AS n_tokens FROM documents d "
        "LEFT JOIN lens ON d.doc_id = lens.doc_id ORDER BY d.doc_id"
    )


def _embed_project_sql() -> str:
    """Exact SQL twin of functions.ann_lsh.project_embeddings_ds: both
    sides quantize embedding values and plane entries to the 1e-6 grid
    (floor half-up) and take a pure-int64 dot product — integer SUM is
    summation-order-free, so the parity is bit-exact by construction
    (a float dot product's accumulation order differs between numpy
    BLAS and DuckDB's kernel; measured ulp drift breaks rounding)."""
    from lsearch_ray.functions.ann_lsh import _planes, quantize_micro

    qplanes = quantize_micro(_planes(64, _PROJ_DIM, 4242))
    plane_rows = ", ".join(
        f"({j}, {i + 1}, {int(qplanes[i, j])})"
        for j in range(qplanes.shape[1])
        for i in range(qplanes.shape[0])
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id, i,
        CAST(floor(u * 1000000.0 + 0.5) AS BIGINT) AS qv
      FROM (SELECT vec_id, unnest(v) AS u,
                   generate_subscripts(v, 1) AS i FROM e)),
planes(j, i, qp) AS (VALUES {plane_rows})
SELECT q.vec_id, CAST(p.j AS BIGINT) AS dim,
       CAST(sum(q.qv * p.qp) AS BIGINT) AS coord_pico
FROM q JOIN planes p USING (i) GROUP BY q.vec_id, p.j
ORDER BY q.vec_id, dim
"""


def _cc_survivors_sql(edges_cte: str, table: str, id_col: str) -> str:
    """Connected components over an ``edges(a, b)`` CTE via recursive
    transitive closure; survivors = ids that reach no smaller id (exactly
    the engine's keep-min-per-cluster rule)."""
    return f"""
{edges_cte},
sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.src, s.b FROM r JOIN sym s ON r.dst = s.a
  ) SELECT src, dst FROM r
),
dropped AS (SELECT DISTINCT src AS {id_col} FROM reach WHERE dst < src)
SELECT d.{id_col} FROM {table} d
WHERE d.{id_col} NOT IN (SELECT {id_col} FROM dropped)
ORDER BY d.{id_col}
"""


def _cc_labels_sql(edges_cte: str, table: str, id_col: str) -> str:
    """Total component labeling over an ``edges(a, b)`` CTE: every id in
    ``table`` gets the min id reachable in the symmetrized graph
    (least of self and all reachable nodes); edge-free ids label
    themselves — the exact contract of components.component_labels_ds."""
    return f"""
{edges_cte},
sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.src, s.b FROM r JOIN sym s ON r.dst = s.a
  ) SELECT src, dst FROM r
),
lbl AS (SELECT src, least(src, min(dst)) AS comp FROM reach GROUP BY src)
SELECT d.{id_col}, CAST(coalesce(l.comp, d.{id_col}) AS BIGINT) AS component
FROM {table} d LEFT JOIN lbl l ON l.src = d.{id_col}
ORDER BY d.{id_col}
"""


def _ngram_edges_body(table: str) -> str:
    """Brute-force all-pairs exact n-gram Jaccard edges (threshold 0.8,
    3-gram token shingles, per-doc unique sets) over ``table`` — CTE
    body only, composable after other CTEs. Shingle semantics mirror
    minhash._shingle_hashes: docs with 1-2 tokens contribute one shingle
    over the whole run; 0-token docs emit no shingles and can never
    pair."""
    return f"""l AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM {table}
),
sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2] AS s
  FROM l, UNNEST(range(1, greatest(len(toks) - 2, 0) + 1)) AS u(i)
  WHERE len(toks) >= 3
  UNION
  SELECT DISTINCT doc_id, list_aggregate(toks, 'string_agg', chr(1)) AS s
  FROM l WHERE len(toks) BETWEEN 1 AND 2
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
),
edges AS (
  SELECT i.a, i.b FROM inter i
  JOIN sz sa ON i.a = sa.doc_id JOIN sz sb ON i.b = sb.doc_id
  WHERE i.i * 1.0 / (sa.n + sb.n - i.i) >= 0.8
)"""


_NGRAM_EDGES_CTE = "\nWITH " + _ngram_edges_body("documents")


_SH5_SQL = (
    "toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2] || chr(1) "
    "|| toks[i+3] || chr(1) || toks[i+4]"
)
_DUPSPAN_TOKS_SQL = """
WITH l AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
)"""


_WINNOW_C = 1 << 21  # composite window-min position budget (i < 2^21)


def _winnow_sel_cte() -> str:
    """Exact replay of functions.winnow._winnow_batch as a ``sel`` CTE:
    63-bit FNV token hashes (``_fnv63_of``), the minhash rolling
    xor-mul k-gram combine (``_mul_shingle64``) masked to 63 bits, then
    per-window rightmost-minimum selection via a composite HUGEINT
    window min — key = kh·C + (C−1−i) minimizes (kh, −i)
    lexicographically, so decoding the min recovers the rightmost
    minimal k-gram's position and hash; kh < 2^63 and C = 2^21 keep the
    composite under 2^84 (HUGEINT-exact). Partial tail windows
    (count < w) are dropped, matching the engine's full-window rule."""
    e = "hs[i]"
    for t in range(1, _WINNOW_K):
        e = f"xor({_mul_shingle64(e)}, hs[i+{t}])"
    kgram = f"(({e}) % {_U63})"
    c = _WINNOW_C
    w = _WINNOW_W
    return f"""
WITH otoks AS ({_ORDERED_TOKS}),
dt AS (SELECT DISTINCT term FROM otoks),
th AS (SELECT term, {_fnv63_of('term')} AS h FROM dt),
hl AS (SELECT t.doc_id, list(th.h ORDER BY t.pos) AS hs
       FROM otoks t JOIN th USING (term) GROUP BY t.doc_id),
kg AS (
  SELECT doc_id, i, {kgram} AS kh
  FROM hl, UNNEST(range(1, len(hs) - {_WINNOW_K} + 2)) AS u(i)
  WHERE len(hs) >= {_WINNOW_K}
),
wm AS (
  SELECT doc_id,
         min(kh * {c} + ({c} - 1 - i)) OVER
           (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mk,
         count(*) OVER
           (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS cnt
  FROM kg
),
sel AS (
  SELECT DISTINCT doc_id,
         CAST({c} - 1 - (mk % {c}) AS BIGINT) AS pos,
         CAST(mk // {c} AS BIGINT) AS fp
  FROM wm WHERE cnt = {w}
)"""


def _snippet_ctes() -> str:
    """Snippet selection as a reusable CTE chain ending in ``snip``
    (doc_id, start, n_terms, snippet): contiguous token positions via
    row_number (the _ORDERED_TOKS pos has gaps where empty splits were
    filtered), per-start distinct-query-term counts over the window
    join, best = (n_terms DESC, i ASC) row_number 1. CTE names are
    s-prefixed so the chain composes with _BM25_BODY (which owns qt)."""
    qt = ", ".join(
        f"('{t}')" for t in sorted(set(BM25_QUERY.lower().split()))
    )
    w = _SNIPPET_W
    return f"""
tokr AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
  FROM ({_ORDERED_TOKS})
),
sln AS (SELECT doc_id, count(*) AS L FROM tokr GROUP BY 1),
sqt(term) AS (VALUES {qt}),
sstarts AS (
  SELECT doc_id, u.i
  FROM sln, UNNEST(range(1, greatest(L - {w}, 0) + 2)) AS u(i)
),
ssc AS (
  SELECT st.doc_id, st.i, count(DISTINCT t.term) AS n_terms
  FROM sstarts st
  JOIN tokr t ON t.doc_id = st.doc_id
             AND t.p BETWEEN st.i AND st.i + {w} - 1
  JOIN sqt ON t.term = sqt.term
  GROUP BY 1, 2
),
sbest AS (
  SELECT doc_id, i, n_terms,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY n_terms DESC, i ASC) AS rn
  FROM ssc
),
snip AS (
  SELECT b.doc_id, b.i AS start, CAST(b.n_terms AS BIGINT) AS n_terms,
         string_agg(t.term, ' ' ORDER BY t.p) AS snippet
  FROM sbest b
  JOIN tokr t ON t.doc_id = b.doc_id AND t.p BETWEEN b.i AND b.i + {w} - 1
  WHERE b.rn = 1
  GROUP BY b.doc_id, b.i, b.n_terms
)"""


def _snippets_sql() -> str:
    return (
        "WITH "
        + _snippet_ctes().lstrip()
        + "\nSELECT doc_id, start, n_terms, snippet FROM snip"
        "\nORDER BY doc_id"
    )


def _bm25_snippets_sql() -> str:
    """The composed search page: BM25 top-10 (the bm25_or_topk twin's
    scores CTE) inner-joined with each hit's snippet (every BM25 match
    contains >= 1 query term, so the join drops nothing)."""
    return (
        _BM25_BODY
        + ",\ntop AS (SELECT doc_id, round(score, 4) AS score FROM scores"
        "\n        ORDER BY score DESC, doc_id LIMIT 10),"
        + _snippet_ctes()
        + """
SELECT s.doc_id, s.start, s.n_terms, s.snippet, t.score
FROM snip s JOIN top t USING (doc_id)
ORDER BY t.score DESC, s.doc_id
"""
    )


_LINED_SQL = f"""WITH lined AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             range(1, len(string_split(coalesce(text, ''), ' ')) + 1,
                   {_LINE_WORDS}),
             i -> array_to_string(
                    string_split(coalesce(text, ''), ' ')
                      [i:i + {_LINE_WORDS - 1}], ' ')),
           chr(10)) AS text
  FROM documents
),
split AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined),
lines AS (
  SELECT doc_id, unnest(ls) AS line, unnest(range(1, len(ls) + 1)) AS ord
  FROM split
),
df AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line)"""


def _boilerplate_lines_sql() -> str:
    """Brute-force twin of boilerplate_lines_ds over the 5-word-lined
    docs: distinct-doc frequency per line, threshold 2."""
    return f"""{_LINED_SQL}
SELECT line, CAST(df AS BIGINT) AS df
FROM df WHERE df >= 2 ORDER BY df DESC, line
"""


def _line_dedup_sql() -> str:
    """Brute-force twin of line_dedup_ds: a >= 2-doc line is dropped
    from every doc (NULL inside the ordered string_agg skips it); a
    fully-boilerplate doc coalesces to ''."""
    return f"""{_LINED_SQL}
SELECT l.doc_id,
       COALESCE(string_agg(CASE WHEN d.df >= 2 THEN NULL ELSE l.line END,
                           chr(10) ORDER BY l.ord), '') AS text,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(*) FILTER (WHERE d.df >= 2) AS BIGINT) AS removed_lines
FROM lines l JOIN df d USING (line)
GROUP BY l.doc_id ORDER BY l.doc_id
"""


def _slice_drift_sql(slice_col: str = "lang") -> str:
    """Brute-force twin of slice_tv_drift_ds: per-slice TV numerator
    Σ|a·B − b·A| in HUGEINT (observed pairs via the three-way join;
    slice-absent terms contribute (T − covered)·A without being
    enumerated), floor-scaled to micro units."""
    return f"""WITH toks AS (
  SELECT coalesce({slice_col}, '') AS slice,
         unnest(list_filter(
           string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
           x -> x <> '')) AS term
  FROM documents
),
cnt AS (
  SELECT slice, term, CAST(count(*) AS HUGEINT) AS c
  FROM toks GROUP BY 1, 2
),
tot AS (SELECT term, sum(c) AS tc FROM cnt GROUP BY 1),
sl AS (SELECT slice, sum(c) AS A FROM cnt GROUP BY 1),
g AS (SELECT sum(A) AS T FROM sl),
obs AS (
  SELECT c.slice,
         sum(abs(c.c * (g.T - s.A) - (t.tc - c.c) * s.A)) AS n1,
         sum(t.tc) AS covered
  FROM cnt c JOIN tot t USING (term) JOIN sl s USING (slice) CROSS JOIN g
  GROUP BY c.slice
)
SELECT s.slice,
       CAST(s.A AS BIGINT) AS slice_tokens,
       CAST(g.T - s.A AS BIGINT) AS rest_tokens,
       CAST(CASE WHEN s.A > 0 AND g.T - s.A > 0
            THEN (obs.n1 + (g.T - obs.covered) * s.A) * 1000000
                 // (2 * s.A * (g.T - s.A))
            ELSE 0 END AS BIGINT) AS tv_micro
FROM sl s JOIN obs USING (slice) CROSS JOIN g
ORDER BY s.slice
"""


def _winnow_fps_sql() -> str:
    return (
        _winnow_sel_cte()
        + "\nSELECT doc_id, pos, fp FROM sel ORDER BY doc_id, pos"
    )


def _winnow_pairs_sql() -> str:
    return (
        _winnow_sel_cte()
        + f""",
fps AS (SELECT DISTINCT doc_id, fp FROM sel),
dfc AS (SELECT fp, count(*) AS c FROM fps GROUP BY fp),
kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfc USING (fp)
         WHERE c BETWEEN 2 AND {_WINNOW_MAXDF}),
p AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared FROM p
WHERE n_shared >= {_WINNOW_MINSH} ORDER BY a, b"""
    )


def _dup_shingle_stats_sql() -> str:
    """Brute-force twin of dup_shingle_stats_ds: distinct per-doc
    5-shingles, a shingle is shared iff it appears in >= 2 docs;
    dup_micro is floor fixed-point (exact in DOUBLE: dup*1e6 < 2^53)."""
    return f"""{_DUPSPAN_TOKS_SQL},
sh AS (
  SELECT DISTINCT doc_id, {_SH5_SQL} AS s
  FROM l, UNNEST(range(1, greatest(len(toks) - 4, 0) + 1)) AS u(i)
  WHERE len(toks) >= 5
),
cnt AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
per AS (
  SELECT sh.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_shingles
  FROM sh JOIN cnt USING (s) GROUP BY sh.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(per.dup_shingles, 0) AS BIGINT) AS dup_shingles,
       CAST(CASE WHEN coalesce(per.n_shingles, 0) > 0
            THEN floor(per.dup_shingles * 1000000.0 / per.n_shingles)
            ELSE 0 END AS BIGINT) AS dup_micro
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id
"""


def _dup_span_removal_sql() -> str:
    """Brute-force twin of dup_span_removal_ds: token positions covered
    by any occurrence of a shared 5-shingle are dropped; the doc is the
    surviving tokens space-joined in position order."""
    return f"""{_DUPSPAN_TOKS_SQL},
g AS (
  SELECT doc_id, i, {_SH5_SQL} AS s
  FROM l, UNNEST(range(1, greatest(len(toks) - 4, 0) + 1)) AS u(i)
  WHERE len(toks) >= 5
),
dup AS (
  SELECT s FROM (SELECT DISTINCT doc_id, s FROM g)
  GROUP BY s HAVING count(*) >= 2
),
cov AS (
  SELECT DISTINCT g.doc_id, u2.p
  FROM g JOIN dup USING (s), UNNEST(range(g.i, g.i + 5)) AS u2(p)
),
tok AS (
  SELECT doc_id, toks[i] AS t, i
  FROM l, UNNEST(range(1, len(toks) + 1)) AS u(i)
),
kept AS (
  SELECT tok.doc_id, string_agg(tok.t, ' ' ORDER BY tok.i) AS text,
         count(*) AS kept_n
  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.p
  WHERE cov.p IS NULL
  GROUP BY tok.doc_id
),
tot AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(kept.text, '') AS text,
       CAST(coalesce(tot.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(tot.n_tokens, 0) - coalesce(kept.kept_n, 0)
            AS BIGINT) AS removed_tokens
FROM documents d LEFT JOIN kept USING (doc_id) LEFT JOIN tot USING (doc_id)
ORDER BY doc_id
"""


def _ngram_jaccard_sql() -> str:
    """Brute-force exact twin of ngram_jaccard_dedup (threshold 0.8,
    3-gram token shingles, per-doc unique sets, keep-min-per-component).
    The SQL considers ALL pairs; the engine's MinHash banding (b=32, r=4)
    has miss probability < 1e-7 at jaccard 0.8, so the outputs
    coincide."""
    return _cc_survivors_sql(_NGRAM_EDGES_CTE, "documents", "doc_id")


def _embedding_dedup_sql() -> str:
    """Brute-force exact twin of embedding_dedup (cosine ≥ 0.999,
    keep-min-per-component). The SQL scores ALL pairs; the engine's
    hyperplane-LSH candidate generation can in principle miss a pair two
    buckets apart, but at threshold 0.999 the pair angle is ≤ 2.6°, and
    the driver testdata's max off-diagonal cosine is ~0.51 — no edges
    exist at any tested scale, so the contract is exercised as an
    over-drop guard."""
    edges = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
edges AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.999
)"""
    return _cc_survivors_sql(edges, "embeddings", "vec_id")


_U64 = "CAST(18446744073709551616 AS HUGEINT)"  # 2^64
_U63 = "CAST(9223372036854775808 AS HUGEINT)"  # 2^63
_MERS61 = "CAST(2305843009213693951 AS HUGEINT)"  # 2^61 - 1


def _mul_shingle64(x: str) -> str:
    """``(x · 0x9E3779B97F4A7C15) mod 2^64`` for x < 2^64 without INT128
    overflow: the 64-bit multiplier is split into 32-bit halves
    (hi=2654435769, lo=2135587861), each partial ≤ 2^96 fits HUGEINT;
    the hi partial folds through mod 2^32 before its shift."""
    return (
        f"((({x}) * 2135587861 + "
        f"((({x}) * 2654435769) % 4294967296) * 4294967296) % {_U64})"
    )


def _minhash_edges_cte() -> str:
    """Exact replay of functions.minhash.minhash_candidate_pairs +
    signature verify (minhash.py:140-160,234-271) as an ``edges`` CTE:

    - token hash = 63-bit FNV-1a (corpus.fnv1a64 twin, ``_fnv63_of``);
    - 3-gram shingle = rolling ``acc = (acc·M mod 2^64) xor h`` with
      M = 0x9E3779B97F4A7C15 (docs with 1-2 tokens fold their full run);
    - 128 universal permutations h_p(x) = (a_p·x + b_p) mod (2^61-1)
      with the SAME a/b stream (np.random.RandomState(12345), embedded
      as literals); DuckDB HUGEINT holds the 122-bit product exactly, so
      no split-mulmod is needed;
    - 32×4 banding: FNV-1a fold of each band's 4 signature rows, masked
      to 63 bits (the engine's int64 storage mask);
    - bucket pairs with the cap-64 rule (≤64 ⇒ all a<b pairs, >64 ⇒
      star to the bucket minimum — cluster._emit_pairs_sorted);
    - verify: ≥ 103 of 128 equal components ⇔ est ≥ 0.8 (exact integer
      form of ``(sig_a == sig_b).mean() >= 0.8``);
    - token-less docs carry the masked MAXH signature like the engine.
    """
    min_eq = next(k for k in range(129) if k / 128 >= 0.8)
    return f"""
WITH {_minhash_band_body()},
edges AS (
  SELECT c.a, c.b FROM cand c
  JOIN sig sa ON sa.doc_id = c.a
  JOIN sig sb ON sb.doc_id = c.b AND sb.p = sa.p
  GROUP BY c.a, c.b
  HAVING sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) >= {min_eq}
)"""


def _minhash_band_body() -> str:
    """The signature/banding replay of :func:`_minhash_edges_cte` up to
    the UNVERIFIED candidate pairs — CTE body only (``otoks`` …
    ``cand``, plus ``sig`` for verifiers), shared by the dedup twin and
    the dedup_recall harness twin."""
    import numpy as np

    rng = np.random.RandomState(12345)
    a = rng.randint(1, (1 << 61) - 1, size=128, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=128, dtype=np.uint64)
    perm_rows = ", ".join(
        f"({p}, {int(a[p])}, {int(b[p])})" for p in range(128)
    )
    s1 = f"xor({_mul_shingle64('hs[i]')}, hs[i+1])"
    s2 = f"xor({_mul_shingle64(s1)}, hs[i+2])"
    short2 = f"xor({_mul_shingle64('hs[1]')}, hs[2])"
    return f"""otoks AS ({_ORDERED_TOKS}),
dt AS (SELECT DISTINCT term FROM otoks),
th AS (SELECT term, ({_fnv63_of('term')}) AS h FROM dt),
hl AS (SELECT t.doc_id, list(th.h ORDER BY t.pos) AS hs
       FROM otoks t JOIN th USING (term) GROUP BY t.doc_id),
shing AS (
  SELECT DISTINCT doc_id, ({s2}) % {_MERS61} AS x
  FROM hl, UNNEST(range(1, greatest(len(hs) - 2, 0) + 1)) AS u(i)
  WHERE len(hs) >= 3
  UNION
  SELECT doc_id, hs[1] % {_MERS61} AS x FROM hl WHERE len(hs) = 1
  UNION
  SELECT doc_id, ({short2}) % {_MERS61} AS x
  FROM hl WHERE len(hs) = 2
),
perms(p, pa, pb) AS (VALUES {perm_rows}),
sig0 AS (
  SELECT s.doc_id, pm.p,
         min((CAST(pm.pa AS HUGEINT) * s.x + pm.pb) % {_MERS61}) AS v
  FROM shing s CROSS JOIN perms pm GROUP BY 1, 2
),
sig AS (
  SELECT d.doc_id, pm.p,
         coalesce(s0.v, CAST(9223372036854775807 AS HUGEINT)) AS v
  FROM documents d CROSS JOIN perms pm
  LEFT JOIN sig0 s0 ON s0.doc_id = d.doc_id AND s0.p = pm.p
),
sl AS (SELECT doc_id, list(v ORDER BY p) AS sv FROM sig GROUP BY doc_id),
bandrows AS (
  SELECT doc_id, bb.b AS band,
    CAST(list_reduce(
      list_prepend({_FNV_BASIS}, list_slice(sv, 4*bb.b + 1, 4*bb.b + 4)),
      {_FNV_STEP}) % {_U63} AS BIGINT) AS band_hash
  FROM sl, UNNEST(range(0, 32)) AS bb(b)
),
bkt AS (SELECT band, band_hash, doc_id,
               count(*) OVER w AS cnt, min(doc_id) OVER w AS mn
        FROM bandrows WINDOW w AS (PARTITION BY band, band_hash)),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM bkt x JOIN bkt y
    ON x.band = y.band AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
  WHERE x.cnt <= 64
  UNION
  SELECT mn AS a, doc_id AS b FROM bkt WHERE cnt > 64 AND doc_id <> mn
)"""


def _minhash_dedup_sql() -> str:
    """Exact twin of minhash_dedup(threshold=0.8, num_perm=128, bands=32,
    ngram=3, seed=12345): replayed signatures/banding/verify (see
    _minhash_edges_cte), then keep-min-per-component."""
    return _cc_survivors_sql(_minhash_edges_cte(), "documents", "doc_id")


def _simhash_edges_cte(max_hamming: int) -> str:
    """Exact replay of functions.simhash.simhash_dedup (simhash.py:32-140)
    as an ``edges`` CTE: 63-bit FNV-1a token hashes vote ±1 per bit per
    OCCURRENCE (bit 63 is always 0 — fnv1a64 masks to 63 bits, so every
    vote there is −1); fingerprint bit k set iff the vote sum is > 0;
    4×16-bit banding; bucket pairs with the cap-64 rule; verify
    ``bit_count(fp_a xor fp_b) <= max_hamming``. Token-less docs carry
    fingerprint 0 like the engine."""
    return f"""
WITH toks AS ({_TOKS}),
dt AS (SELECT DISTINCT term FROM toks),
th AS (SELECT term, CAST(({_fnv63_of('term')}) AS BIGINT) AS h FROM dt),
tc AS (SELECT t.doc_id, th.h, count(*) AS c
       FROM toks t JOIN th USING (term) GROUP BY 1, 2),
bits AS (
  SELECT doc_id, kk.k AS k,
         CASE WHEN sum(CASE WHEN ((h >> kk.k) & 1) = 1 THEN c ELSE -c END) > 0
              THEN 1 ELSE 0 END AS bit
  FROM tc, UNNEST(range(0, 63)) AS kk(k) GROUP BY 1, 2
),
fp0 AS (SELECT doc_id,
               CAST(sum(CAST(bit AS HUGEINT) * (CAST(1 AS HUGEINT) << k))
                    AS BIGINT) AS fp
        FROM bits GROUP BY 1),
fp AS (SELECT d.doc_id, coalesce(f.fp, 0) AS fp
       FROM documents d LEFT JOIN fp0 f USING (doc_id)),
bandrows AS (
  SELECT doc_id, bb.b AS band,
         CAST((fp >> (16 * bb.b)) & 65535 AS BIGINT) AS band_hash
  FROM fp, UNNEST(range(0, 4)) AS bb(b)
),
bkt AS (SELECT band, band_hash, doc_id,
               count(*) OVER w AS cnt, min(doc_id) OVER w AS mn
        FROM bandrows WINDOW w AS (PARTITION BY band, band_hash)),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM bkt x JOIN bkt y
    ON x.band = y.band AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
  WHERE x.cnt <= 64
  UNION
  SELECT mn AS a, doc_id AS b FROM bkt WHERE cnt > 64 AND doc_id <> mn
),
edges AS (
  SELECT c.a, c.b FROM cand c
  JOIN fp fa ON fa.doc_id = c.a
  JOIN fp fb ON fb.doc_id = c.b
  WHERE bit_count(xor(fa.fp, fb.fp)) <= {max_hamming}
)"""


def _simhash_dedup_sql() -> str:
    """Exact twin of simhash_dedup(max_hamming=2): replayed fingerprints/
    banding/verify (see _simhash_edges_cte), keep-min-per-component."""
    return _cc_survivors_sql(_simhash_edges_cte(2), "documents", "doc_id")


def _quality_sql() -> str:
    from lsearch_ray.functions.textstats import LANG_PROFILES

    stopwords = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES["en"]))
    return f"""
WITH toks AS ({_TOKS}),
tstats AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ({stopwords}) THEN 1 ELSE 0 END) AS stop_hits
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(t.n_tokens, 0) AS n_tokens,
       round(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
             / greatest(length(d.text), 1), 6) AS alpha_ratio,
       round(length(regexp_replace(d.text, '[^0-9]', '', 'g'))
             / greatest(length(d.text), 1), 6) AS digit_ratio,
       CASE WHEN coalesce(t.n_tokens, 0) = 0 THEN 0.0
            ELSE round(t.stop_hits * 1.0 / t.n_tokens, 6) END AS stopword_ratio
FROM documents d LEFT JOIN tstats t ON d.doc_id = t.doc_id
"""


def _link_edges_cte() -> str:
    """The derived doc link graph shared by the graph-family oracles:
    doc u -> fnv63(term) % n per distinct term of u, self-loops dropped
    (exact twin of functions.pagerank.doc_link_edges_ds)."""
    n = "(SELECT count(*) FROM documents)"
    return (
        f"toks AS ({_ORDERED_TOKS}),\n"
        "dt AS (SELECT DISTINCT doc_id AS src, term FROM toks),\n"
        f"th AS (SELECT term, CAST({_fnv63_of('term')} % {n} AS BIGINT) AS dst\n"
        "      FROM (SELECT DISTINCT term FROM dt)),\n"
        "edges AS (SELECT DISTINCT d.src, t.dst FROM dt d\n"
        "          JOIN th t USING (term) WHERE t.dst <> d.src)"
    )


def _triangle_ctes() -> str:
    """Shared CTE chain for the triangle-family oracles: derived link
    edges → undirected pairs → degrees → degree-ordered DAG → wedges →
    closed triangles (``tri``). The (degree, id) total order makes each
    triangle one wedge at its unique source (exact twin of
    functions.pagerank._triangles_and_degrees)."""
    return (
        f"WITH {_link_edges_cte()},\n"
        "und AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges),\n"
        "degt AS (SELECT n, count(*) AS d FROM "
        "  (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und) "
        "  GROUP BY n),\n"
        "o AS (SELECT CASE WHEN fwd THEN a ELSE b END AS u, "
        "             CASE WHEN fwd THEN b ELSE a END AS v FROM ("
        "  SELECT u.a, u.b, "
        "    (da.d < db.d OR (da.d = db.d AND u.a < u.b)) AS fwd"
        "  FROM und u JOIN degt da ON da.n = u.a "
        "             JOIN degt db ON db.n = u.b)),\n"
        "wg AS (SELECT o1.v AS x, o2.v AS y FROM o o1 "
        "JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v),\n"
        "tri AS (SELECT wg.x, wg.y FROM wg "
        "JOIN und ON und.a = wg.x AND und.b = wg.y)"
    )


def _pagerank_sql(iters: int) -> str:
    """Exact twin of functions.pagerank: the edge rule (distinct term →
    fnv63 % n), then ``iters`` unrolled rounds of the integer recurrence
    r' = base + (85·(insum + dang//n))//100 with floor division
    throughout — every intermediate is a non-negative integer, so the
    replay is bit-exact (the kmeans unrolled-CTE pattern)."""
    n = "(SELECT count(*) FROM documents)"
    parts = [
        f"WITH {_link_edges_cte()},",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),",
        "nodes AS (SELECT doc_id AS node FROM documents),",
        f"r0 AS (SELECT node, CAST(1000000000000 // {n} AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(iters):
        parts.append(
            f""",
dang{k} AS (SELECT coalesce(sum(r), 0) AS m FROM r{k}
            WHERE node NOT IN (SELECT src FROM deg)),
ins{k} AS (SELECT e.dst, sum(r.r // d.deg) AS insum
           FROM edges e JOIN deg d USING (src) JOIN r{k} r ON r.node = e.src
           GROUP BY e.dst),
r{k + 1} AS (SELECT n.node,
    CAST((15 * 1000000000000) // (100 * {n})
         + (85 * (coalesce(i.insum, 0) + (SELECT m FROM dang{k}) // {n})) // 100
         AS BIGINT) AS r
    FROM nodes n LEFT JOIN ins{k} i ON i.dst = n.node)"""
        )
    parts.append(
        f"\nSELECT node AS doc_id, r AS pr_micro FROM r{iters} ORDER BY doc_id"
    )
    return "\n".join(parts)


def _prf_sql(fb_k: int = 5, n_exp: int = 3, k: int = 10,
             exp_w: float = 0.5) -> str:
    """Exact twin of pipelines.fulltext.bm25_prf_topk_dataset: round-1
    BM25 → rounded-score top-``fb_k`` feedback docs → top-``n_exp``
    expansion terms by integer Σtf (term ASC tiebreak) → round-2 BM25
    over the union with expansion idf scaled by ``exp_w``. The weight is
    applied as (w · ln(idf)) · tf_sat — the engine's association order —
    and 1.0·x is IEEE-exact, so parity holds to the shared 4-dp round."""
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
          sum(dl) / (SELECT count(*) FROM documents) AS avgdl FROM dl),
qt1 AS (SELECT DISTINCT lower(u.t) AS term FROM UNNEST(string_split_regex(lower('{BM25_QUERY}'), '[^a-z0-9]+')) AS u(t) WHERE u.t <> ''),
df1 AS (SELECT tf.term, count(*) AS df FROM tf JOIN qt1 ON tf.term = qt1.term GROUP BY tf.term),
s1 AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - df1.df + 0.5)/(df1.df + 0.5))
             * tf.tf*({K1}+1.0)/(tf.tf + {K1}*(1.0-{B}+{B}*dl.dl/s.avgdl))) AS score
  FROM tf JOIN df1 ON tf.term = df1.term
       JOIN dl ON tf.doc_id = dl.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id),
fb AS (SELECT doc_id FROM (SELECT doc_id, round(score, 4) AS rs FROM s1)
       ORDER BY rs DESC, doc_id LIMIT {fb_k}),
exp AS (SELECT tf.term FROM tf JOIN fb USING (doc_id)
        WHERE tf.term NOT IN (SELECT term FROM qt1)
        GROUP BY tf.term ORDER BY sum(tf.tf) DESC, tf.term LIMIT {n_exp}),
qt2 AS (SELECT term, 1.0 AS w FROM qt1 UNION ALL SELECT term, {exp_w} AS w FROM exp),
df2 AS (SELECT tf.term, count(*) AS df FROM tf JOIN qt2 ON tf.term = qt2.term GROUP BY tf.term),
s2 AS (
  SELECT tf.doc_id,
         sum((q.w * ln(1.0 + (s.n_docs - df2.df + 0.5)/(df2.df + 0.5)))
             * tf.tf*({K1}+1.0)/(tf.tf + {K1}*(1.0-{B}+{B}*dl.dl/s.avgdl))) AS score
  FROM tf JOIN qt2 q ON tf.term = q.term
       JOIN df2 ON tf.term = df2.term
       JOIN dl ON tf.doc_id = dl.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS score FROM s2 ORDER BY score DESC, doc_id LIMIT {k}
"""


def _bfs_sql(iters: int) -> str:
    """Exact twin of functions.pagerank.bfs_distance_ds: seeds are
    doc_id % 97 == 0, then ``iters`` unrolled rounds of
    d' = min(d, 1 + min over in-edges of d(src)) with the same INF
    sentinel — pure integer min-propagation, bit-exact on any engine."""
    inf = 1 << 30
    parts = [
        f"WITH {_link_edges_cte()},",
        "nodes AS (SELECT doc_id AS node FROM documents),",
        f"d0 AS (SELECT node, CASE WHEN node % 97 = 0 THEN 0 ELSE {inf} END AS d FROM nodes)",
    ]
    for k in range(iters):
        parts.append(
            f""",
c{k} AS (SELECT e.dst, min(x.d + 1) AS nd FROM edges e
         JOIN d{k} x ON x.node = e.src WHERE x.d < {inf} GROUP BY e.dst),
d{k + 1} AS (SELECT x.node, least(x.d, coalesce(c.nd, {inf})) AS d
         FROM d{k} x LEFT JOIN c{k} c ON c.dst = x.node)"""
        )
    parts.append(
        f"\nSELECT node AS doc_id, CAST(d AS BIGINT) AS dist FROM d{iters} "
        f"WHERE d <= {iters} ORDER BY doc_id"
    )
    return "\n".join(parts)


def _hits_sql(iters: int, total: int = 10**9) -> str:
    """Exact twin of functions.pagerank.hits_ds: ``iters`` unrolled
    auth/hub half-steps, each a groupby-sum across edges normalized to a
    conserved integer ``total`` by floor division (raw sums ≤ total, so
    the widest product is total² — HUGEINT replays int64 exactly)."""
    n = "(SELECT count(*) FROM documents)"
    parts = [
        f"WITH {_link_edges_cte()},",
        "nodes AS (SELECT doc_id AS node FROM documents),",
        f"h0 AS (SELECT node, CAST({total} // {n} AS BIGINT) AS h FROM nodes)",
    ]
    for k in range(iters):
        parts.append(
            f""",
ar{k} AS (SELECT e.dst, sum(x.h) AS s FROM edges e
          JOIN h{k} x ON x.node = e.src GROUP BY e.dst),
at{k} AS (SELECT coalesce(sum(s), 0) AS t FROM ar{k}),
a{k + 1} AS (SELECT n.node, CAST(CASE WHEN (SELECT t FROM at{k}) = 0 THEN 0
    ELSE (coalesce(r.s, 0) * {total}) // (SELECT t FROM at{k}) END AS BIGINT) AS a
    FROM nodes n LEFT JOIN ar{k} r ON r.dst = n.node),
hr{k} AS (SELECT e.src, sum(x.a) AS s FROM edges e
          JOIN a{k + 1} x ON x.node = e.dst GROUP BY e.src),
ht{k} AS (SELECT coalesce(sum(s), 0) AS t FROM hr{k}),
h{k + 1} AS (SELECT n.node, CAST(CASE WHEN (SELECT t FROM ht{k}) = 0 THEN 0
    ELSE (coalesce(r.s, 0) * {total}) // (SELECT t FROM ht{k}) END AS BIGINT) AS h
    FROM nodes n LEFT JOIN hr{k} r ON r.src = n.node)"""
        )
    parts.append(
        f"\nSELECT a.node AS doc_id, a.a AS auth_micro, h.h AS hub_micro "
        f"FROM a{iters} a JOIN h{iters} h ON a.node = h.node ORDER BY doc_id"
    )
    return "\n".join(parts)


def _semdedup_sql() -> str:
    """Twin of _q_semdedup: the unrolled Lloyd CTEs (shared with
    _kmeans_sql), within-cluster pairs scored with DuckDB's
    list_cosine_similarity rounded to the SAME 6-dp grid as the
    engine's normalized matmul, then the recursive keep-min-survivor
    closure (_cc_survivors_sql)."""
    edges = (
        _kmeans_ctes(_KMEANS_K, _KMEANS_ITERS)
        + ", m AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "          FROM embeddings), "
        f"asg AS (SELECT vec_id, cl FROM a{_KMEANS_ITERS}), "
        "edges AS (SELECT x.vec_id AS a, y.vec_id AS b "
        "  FROM asg x JOIN asg y ON x.cl = y.cl AND x.vec_id < y.vec_id "
        "  JOIN m mx ON mx.vec_id = x.vec_id "
        "  JOIN m my ON my.vec_id = y.vec_id "
        "  WHERE CAST(floor(list_cosine_similarity(mx.v, my.v) "
        f"    * 1000000 + 0.5) AS BIGINT) >= {_SEMDEDUP_TAU})"
    )
    return _cc_survivors_sql(edges, "embeddings", "vec_id")


def _containment_sql() -> str:
    """Twin of _q_containment_pairs: string 5-gram shingles (the
    dupspans convention — engine hash injectivity assumed), candidates
    restricted to pairs sharing a df-[2,max_df] shingle, intersection
    counted on the FULL distinct sets, integer floor-division
    cont_micro."""
    return (
        _DUPSPAN_TOKS_SQL
        + f""",
sh AS (SELECT DISTINCT doc_id, {_SH5_SQL} AS s
       FROM l, UNNEST(range(1, greatest(len(toks) - 4, 0) + 1)) AS u(i)
       WHERE len(toks) >= 5),
dfc AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfc USING (s)
         WHERE c BETWEEN 2 AND {_CONT_MAXDF}),
cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
i AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS n_inter
      FROM sh sa JOIN sh sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id
      JOIN cand ON cand.a = sa.doc_id AND cand.b = sb.doc_id
      GROUP BY 1, 2),
p AS (SELECT i.a, i.b, CAST(i.n_inter AS BIGINT) AS n_inter,
      CAST((i.n_inter * 1000000) // least(za.n, zb.n) AS BIGINT)
        AS cont_micro
      FROM i JOIN sz za ON za.doc_id = i.a
             JOIN sz zb ON zb.doc_id = i.b)
SELECT a, b, n_inter, cont_micro FROM p
WHERE cont_micro >= {_CONT_THR} ORDER BY a, b"""
    )


def _cms_sql() -> str:
    """Twin of _q_cms_term_counts: replays the sketch EXACTLY — 63-bit
    FNV token hash (_fnv63_of), row hash ((a_j·(x mod p) + b_j) mod p)
    mod width with the SAME RandomState(seed) a/b stream embedded as
    HUGEINT literals (products < 2^122 fit HUGEINT), bucket counts over
    token occurrences, estimate = min over rows."""
    from lsearch_ray.functions.sketches import cms_hash_params

    a, b = cms_hash_params(_CMS_D, _CMS_SEED)
    a_lst = "[" + ", ".join(f"CAST({int(v)} AS HUGEINT)" for v in a) + "]"
    b_lst = "[" + ", ".join(f"CAST({int(v)} AS HUGEINT)" for v in b) + "]"
    return (
        f"WITH toks AS ({_TOKS}), "
        "tc AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term), "
        f"x AS (SELECT term, cnt, ({_fnv63_of('term')}) % {_MERS61} AS xm "
        "      FROM tc), "
        "hb AS (SELECT term, cnt, u.j, "
        f"       CAST((({a_lst}[u.j + 1] * xm + {b_lst}[u.j + 1]) "
        f"         % {_MERS61}) % {_CMS_W} AS BIGINT) AS bkt "
        f"      FROM x, UNNEST(range({_CMS_D})) AS u(j)), "
        "bc AS (SELECT j, bkt, sum(cnt) AS c FROM hb GROUP BY j, bkt), "
        "est AS (SELECT hb.term, min(bc.c) AS est FROM hb "
        "        JOIN bc ON bc.j = hb.j AND bc.bkt = hb.bkt "
        "        GROUP BY hb.term), "
        "top AS (SELECT term, cnt FROM tc "
        f"       ORDER BY cnt DESC, term LIMIT {_CMS_K}) "
        "SELECT top.term, CAST(top.cnt AS BIGINT) AS exact_n, "
        "       CAST(est.est AS BIGINT) AS cms_est "
        "FROM top JOIN est USING (term) ORDER BY exact_n DESC, term"
    )


def _lexicon_tags_sql() -> str:
    """Twin of _q_lexicon_tags, generated from the SAME _LEXICON:
    occurrence counts via the tf CTE (multiset counts, like the
    engine's is_in over token occurrences), docs with no matching or
    no tokens zero-filled through the documents LEFT JOIN; the tag
    CASE checks topics in alphabetical order, replaying numpy argmax's
    first-maximum tiebreak."""
    topics = sorted(_LEXICON)
    cnt_exprs = []
    for t in topics:
        terms = ", ".join(f"'{w}'" for w in sorted(set(_LEXICON[t])))
        cnt_exprs.append(
            f"sum(CASE WHEN term IN ({terms}) THEN tf ELSE 0 END) AS {t}_n"
        )
    sel = ", ".join(
        f"CAST(coalesce(c.{t}_n, 0) AS BIGINT) AS {t}_n" for t in topics
    )
    g = "greatest(" + ", ".join(f"coalesce(c.{t}_n, 0)" for t in topics) + ")"
    case = (
        f"CASE WHEN {g} = 0 THEN 'none' "
        + " ".join(
            f"WHEN coalesce(c.{t}_n, 0) = {g} THEN '{t}'" for t in topics
        )
        + " END AS tag"
    )
    return (
        f"WITH tf AS ({_TF}), c AS (SELECT doc_id, "
        + ", ".join(cnt_exprs)
        + " FROM tf GROUP BY doc_id) "
        + f"SELECT d.doc_id, {sel}, {case} "
        + "FROM documents d LEFT JOIN c USING (doc_id) ORDER BY d.doc_id"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "tf_triples": (
            f"SELECT term, doc_id, tf FROM ({_TF}) WHERE doc_id < 200"
        ),
        "term_df": (
            f"SELECT term, count(*) AS df FROM ({_TF}) GROUP BY term"
        ),
        "doc_stats": (
            # n_docs counts ALL documents (token-less docs have dl = 0);
            # avgdl_e6 is pure-integer fixed point — no float anywhere
            f"WITH dl AS ({_DL}), s AS (SELECT coalesce(sum(dl), 0) AS tot FROM dl), "
            "c AS (SELECT count(*) AS n FROM documents) "
            "SELECT c.n AS n_docs, "
            "CAST((s.tot * 1000000) // c.n AS BIGINT) AS avgdl_e6, "
            "CAST(s.tot AS BIGINT) AS total_tokens FROM s, c"
        ),
        "bm25_or_topk": (
            _BM25_BODY
            + "SELECT doc_id, round(score, 4) AS score FROM scores "
            "ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "bm25_and_topk": (
            _BM25_BODY
            + "SELECT doc_id, round(score, 4) AS score FROM scores "
            "WHERE nt = (SELECT count(*) FROM qt) "
            "ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "more_rank": (
            f"SELECT doc_id, 1.0 + (length(text) - length(replace(text, '{MORE_TERM}', '')))"
            f"/length('{MORE_TERM}') AS score FROM documents "
            "ORDER BY score DESC, doc_id LIMIT 20"
        ),
        "has_filter": (
            f"SELECT doc_id, n_chars FROM documents WHERE text LIKE '%{HAS_TERM}%'"
        ),
        "events_filter": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE event_type = 'click' AND props NOT LIKE '%x%'"
        ),
        "q1_agg": (
            # floor(x + 0.5): explicit half-away shared with the engine
            "SELECT l_returnflag, l_linestatus, "
            "CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS sum_qty, "
            "CAST(floor(sum(l_extendedprice) * 100.0 + 0.5) AS BIGINT) AS sum_price_cents, "
            "CAST(floor(avg(l_discount) * 1000000.0 + 0.5) AS BIGINT) AS avg_disc_e6, "
            "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "dedup_events": (
            "SELECT user_id, event_type, event_id FROM ("
            "  SELECT user_id, event_type, event_id, "
            "         row_number() OVER (PARTITION BY user_id, event_type "
            "                            ORDER BY ts, event_id) AS rn FROM events"
            ") WHERE rn = 1"
        ),
        "dedup_documents": (
            "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "ivf_ann": (
            "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS sim "
            "FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10"
        ),
        "ivf_ann_oneshot": (
            "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS sim "
            "FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10"
        ),
        "ann_cosine": (
            # CAST to DOUBLE[]: duckdb's float32 cosine differs from the
            # engine's float64 math at the 4th decimal otherwise
            "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS sim "
            "FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10"
        ),
        "token_count": (
            f"SELECT d.doc_id, coalesce(t.n, 0) AS n_tokens FROM documents d "
            f"LEFT JOIN (SELECT doc_id, count(*) AS n FROM ({_TOKS}) GROUP BY doc_id) t "
            f"ON d.doc_id = t.doc_id"
        ),
        "lang_counts": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "quality_stats": _quality_sql(),
        "bpe_token_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        "salted_term_df": (
            f"SELECT term, count(*) AS df FROM ({_TF}) GROUP BY term"
        ),
        "bm25_phrase_topk": _phrase_sql(),
        "range_join_orders": (
            "WITH bands(band, lo, hi) AS (VALUES "
            + ", ".join(
                f"('{b}', {lo!r}, {hi!r})" for b, lo, hi in _PRICE_BANDS
            )
            + ") SELECT b.band, count(*) AS n, "
            "CAST(floor(sum(o.o_totalprice) * 100.0 + 0.5) AS BIGINT) AS total_cents "
            "FROM orders o JOIN bands b "
            "ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi "
            "GROUP BY b.band"
        ),
        "asof_clicks_views": (
            "SELECT c.event_id, c.user_id, "
            "coalesce(v.event_id, -1) AS last_view_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "ASOF LEFT JOIN ("
            "  SELECT user_id, ts, min(event_id) AS event_id FROM events "
            "  WHERE event_type = 'view' GROUP BY user_id, ts) v "
            "ON c.user_id = v.user_id AND v.ts <= c.ts"
        ),
        "sample_events": (
            # deterministic hash-mod sample: identical FNV+mix arithmetic
            # to functions.sampling.hash_sample
            "SELECT event_id, user_id, value FROM ("
            f"  SELECT event_id, user_id, value, "
            f"  {_mixed_hash63_of('CAST(event_id AS VARCHAR)')} AS h FROM events"
            ") WHERE h % 10 < 1"
        ),
        "stratified_sample": (
            # per-stratum twin of sample_events: a CASE over the same hash
            "SELECT event_id, event_type, value FROM ("
            f"  SELECT event_id, event_type, value, "
            f"  {_mixed_hash63_of('CAST(event_id AS VARCHAR)')} AS h FROM events"
            ") WHERE CASE event_type "
            "  WHEN 'click' THEN h % 2 < 1 "
            "  WHEN 'view' THEN h % 10 < 1 "
            "  WHEN 'purchase' THEN TRUE "
            "  ELSE FALSE END"
        ),
        "heavy_terms": (
            # exact top-20 terms (the engine's sketch+verify certifies
            # exactness or raises, so the brute-force twin applies);
            # deterministic (n desc, term) tiebreak both sides
            f"SELECT term AS value, count(*) AS n FROM ({_TOKS}) "
            "GROUP BY term ORDER BY n DESC, value LIMIT 20"
        ),
        "quantiles_value": (
            # order statistic at 0-indexed rank floor(q*(n-1)) — the
            # engine's histogram-refinement contract; tie-order-free
            # because only the VALUE at the rank is returned. isfinite:
            # the engine's contract is quantiles over FINITE values
            # (NaN/inf rows excluded from both n and the ranks)
            "WITH f AS (SELECT value FROM events WHERE isfinite(value)), "
            "s AS (SELECT value, row_number() OVER (ORDER BY value) - 1 AS rn "
            "      FROM f), "
            "n AS (SELECT count(*) AS c FROM f) "
            "SELECT qs.q, s.value FROM (VALUES (0.5), (0.9), (0.99)) qs(q) "
            "JOIN s ON s.rn = CAST(floor(qs.q * ((SELECT c FROM n) - 1)) AS BIGINT)"
        ),
        "quantiles_by_type": (
            # grouped form of quantiles_value: value at 0-indexed rank
            # floor(q*(n_g-1)) within each group's sorted finite values;
            # row_number tie order is irrelevant (only the value returns)
            "WITH f AS (SELECT event_type, value FROM events "
            "           WHERE isfinite(value)), "
            "r AS (SELECT event_type, value, "
            "        row_number() OVER (PARTITION BY event_type "
            "          ORDER BY value) - 1 AS rk, "
            "        count(*) OVER (PARTITION BY event_type) AS n FROM f) "
            "SELECT event_type, q, value "
            "FROM r CROSS JOIN (VALUES (0.5), (0.9), (0.99)) AS qs(q) "
            "WHERE rk = CAST(floor(q * (n - 1)) AS BIGINT) "
            "ORDER BY event_type, q"
        ),
        "distinct_users_kmv": (
            # KMV sketch twin: same hashes → same kth minimum → same
            # fixed-point estimate; left-to-right float order matches
            # (k-1)*2^63/kth then *1000 half-away
            f"WITH hs AS (SELECT DISTINCT {_mixed_hash63_of('CAST(user_id AS VARCHAR)')} AS hv FROM events) "
            "SELECT CASE WHEN (SELECT count(*) FROM hs) < 64 "
            "  THEN (SELECT count(*) FROM hs) * 1000 "
            "  ELSE CAST(floor(63 * 9223372036854775808.0 / "
            "       (SELECT hv FROM hs ORDER BY hv LIMIT 1 OFFSET 63) "
            "       * 1000.0 + 0.5) AS BIGINT) END AS estimate_e3, "
            "CAST(CASE WHEN (SELECT count(*) FROM hs) < 64 "
            "  THEN coalesce((SELECT max(hv) FROM hs), 0) "
            "  ELSE (SELECT hv FROM hs ORDER BY hv LIMIT 1 OFFSET 63) "
            "  END AS BIGINT) AS kth_hash, "
            "CAST(64 AS BIGINT) AS k"
        ),
        "hll_users": (
            # HLL register twin: same 63-bit hash → bucket = h >> 54
            # (// 2^54), register = max(leading zeros of the low 54 bits
            # + 1) — the rank via MIN over explicit bit probes (never
            # float log2, which is not correctly rounded at power-of-two
            # boundaries); 2^(54-j) is exact in double so the CAST is
            # exact for every probe
            f"WITH hv AS (SELECT DISTINCT {_mixed_hash63_of('CAST(user_id AS VARCHAR)')} AS h "
            "            FROM events WHERE user_id IS NOT NULL), "
            "hb AS (SELECT CAST(h // 18014398509481984 AS BIGINT) AS bucket, "
            "              CAST(h % 18014398509481984 AS BIGINT) AS rest FROM hv), "
            "rk AS (SELECT bucket, "
            "  COALESCE((SELECT MIN(j) FROM range(1, 55) t(j) "
            "            WHERE (rest // CAST(power(2, 54 - j) AS BIGINT)) % 2 = 1), "
            "           55) AS rnk FROM hb) "
            "SELECT bucket, MAX(rnk) AS r FROM rk GROUP BY bucket ORDER BY bucket"
        ),
        "priority_sample_lineitem": (
            # priority-sampling twin: q = floor((w << 40) / ((h >> 23)+1))
            # in exact integer arithmetic; ties break by (h, lk) — the
            # hidden h column orders identically in both engines because
            # it IS the same hash
            "WITH li AS (SELECT CAST(l_orderkey AS VARCHAR) || '-' || "
            "                   CAST(l_linenumber AS VARCHAR) AS lk, "
            "                   CAST(l_quantity AS BIGINT) AS qty FROM lineitem), "
            f"h AS (SELECT lk, qty, {_mixed_hash63_of('lk')} AS h FROM li) "
            "SELECT lk, qty, "
            "CAST((qty * 1099511627776) // ((h // 8388608) + 1) AS BIGINT) AS priority "
            "FROM h ORDER BY priority DESC, h, lk LIMIT 50"
        ),
        "sparse_dup_pairs": (
            # sparse-cosine twin: df-pruned term space (2 <= df <= cap),
            # integer dots and norms, ONE float expression spelled
            # identically to the engine (mul, sqrt, div, floor+0.5)
            f"WITH tf AS ({_TF}), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
            "kept AS (SELECT tf.doc_id, tf.term, tf.tf FROM tf "
            f"         JOIN df USING(term) WHERE df.df BETWEEN 2 AND {_SPARSE_MAX_DF}), "
            "n2 AS (SELECT doc_id, SUM(tf*tf) AS n2 FROM kept GROUP BY doc_id), "
            "dots AS (SELECT x.doc_id AS a, y.doc_id AS b, "
            "                CAST(SUM(x.tf*y.tf) AS BIGINT) AS dot "
            "         FROM kept x JOIN kept y ON x.term = y.term "
            "          AND x.doc_id < y.doc_id GROUP BY 1, 2) "
            "SELECT a, b, dot, sim_micro FROM ("
            "  SELECT dots.a, dots.b, dots.dot, "
            "  CAST(floor(dots.dot * 1000000.0 / "
            "       sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) + 0.5) "
            "       AS BIGINT) AS sim_micro "
            "  FROM dots JOIN n2 na ON na.doc_id = dots.a "
            "            JOIN n2 nb ON nb.doc_id = dots.b) "
            f"WHERE sim_micro >= {_SPARSE_MIN_SIM} ORDER BY a, b"
        ),
        "cdc_chunks": _cdc_sql() + " ORDER BY doc_id, chunk_id",
        "cdc_dedup": (
            # content-defined sub-document dedup: first occurrence of
            # every distinct CDC chunk in global (doc_id, chunk_id) order
            "SELECT doc_id, chunk_id, n_tokens, chunk FROM ("
            "  SELECT doc_id, chunk_id, n_tokens, chunk, "
            "  row_number() OVER (PARTITION BY chunk "
            "    ORDER BY doc_id, chunk_id) AS rn "
            f"  FROM ({_cdc_sql()})"
            ") WHERE rn = 1 ORDER BY doc_id, chunk_id"
        ),
        "feature_hash": (
            # hashing-trick twin: bucket = h % 32, sign = bit 40 of the
            # same hash (far above the bucket bits), signed tf sums —
            # pure integers end to end
            f"WITH tf AS ({_TF}), "
            "dt AS (SELECT DISTINCT term FROM tf), "
            f"th AS (SELECT term, {_mixed_hash63_of('term')} AS h FROM dt), "
            f"e AS (SELECT tf.doc_id, CAST(th.h % {_FH_DIM} AS BIGINT) AS dim, "
            "  CASE WHEN (th.h // 1099511627776) % 2 = 1 THEN -tf.tf ELSE tf.tf END AS sv "
            "  FROM tf JOIN th USING(term)) "
            "SELECT doc_id, dim, CAST(SUM(sv) AS BIGINT) AS v FROM e "
            "GROUP BY doc_id, dim ORDER BY doc_id, dim"
        ),
        "fingerprint": _fingerprint_sql(),
        "langid": _langid_sql(),
        "lang_mismatch": (
            # the langid twin as a CTE, cross-tabbed against the
            # declared lang (nulls rendered '<none>' on both sides)
            f"WITH pred AS ({_langid_sql()}) "
            "SELECT coalesce(d.lang, '<none>') AS lang, p.lang_pred, "
            "count(*) AS n FROM documents d JOIN pred p USING (doc_id) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "lsh_ann": _lsh_ann_sql(),
        "ngram_jaccard_dedup": _ngram_jaccard_sql(),
        "dup_shingle_stats": _dup_shingle_stats_sql(),
        "dup_span_removal": _dup_span_removal_sql(),
        "boilerplate_lines": _boilerplate_lines_sql(),
        "line_dedup": _line_dedup_sql(),
        "jsonl_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars "
            "FROM documents ORDER BY doc_id"
        ),
        "csv_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars "
            "FROM documents ORDER BY doc_id"
        ),
        "jsonl_gz_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars "
            "FROM documents ORDER BY doc_id"
        ),
        "slice_drift": _slice_drift_sql(),
        "bm25_prefix_topk": _bm25_prefix_sql(),
        "source_drift": _slice_drift_sql("source"),
        "search_facets": _search_facets_sql(),
        "winnow_fingerprints": _winnow_fps_sql(),
        "winnow_dup_pairs": _winnow_pairs_sql(),
        "snippets": _snippets_sql(),
        "bm25_snippets": _bm25_snippets_sql(),
        "minhash_dedup": _minhash_dedup_sql(),
        "simhash_dedup": _simhash_dedup_sql(),
        "curation_pipeline": _curation_pipeline_sql(),
        "embedding_dedup": _embedding_dedup_sql(),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n, "
            "round(sum(value), 3) AS sum_value FROM events GROUP BY 1, 2"
        ),
        "events_sliding": (
            # 2h windows sliding by 1h: every event belongs to exactly two
            # hour-aligned windows; starts computed in integer epoch-us,
            # matching the engine's arithmetic bit-for-bit
            "SELECT event_type, window_start, count(*) AS n, "
            "round(sum(value), 3) AS sum_value FROM ("
            "  SELECT event_type, value, unnest(["
            "    make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),"
            "    make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 "
            "                   - 3600000000)"
            "  ]) AS window_start FROM events"
            ") GROUP BY 1, 2"
        ),
        "join_revenue": (
            "SELECT o.o_orderpriority, "
            "CAST(floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)"
            " AS revenue_cents, count(*) AS n "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "WHERE c.c_mktsegment = 'BUILDING' GROUP BY o.o_orderpriority"
        ),
        "distinct_segments": (
            "SELECT DISTINCT c_mktsegment FROM customer"
        ),
        "brand_revenue": (
            # floor(x*100 + 0.5): explicit half-away shared with the engine
            "SELECT p.p_brand, "
            "CAST(floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)"
            " AS revenue_cents, count(*) AS n "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY p.p_brand ORDER BY p.p_brand"
        ),
        "sessionize": (
            "SELECT user_id, count(*) AS n_events, "
            # CAST: DuckDB's sum(CASE...) yields decimal128(38,0); the engine
            # emits int64 and the driver value-hash covers the physical
            # encoding, so without the cast identical values hash-mismatch.
            "CAST(sum(CASE WHEN prev_ts IS NULL OR "
            "date_diff('microsecond', prev_ts, ts) > 1800000000 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions FROM ("
            "  SELECT user_id, ts, event_id, "
            "         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts"
            "  FROM events"
            ") GROUP BY user_id"
        ),
        "ngram_counts": (
            "WITH g AS (" + _grams_sql(_NGRAM_N) + "), "
            "c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n "
            "      FROM g GROUP BY gram) "
            f"SELECT gram, n FROM c ORDER BY n DESC, gram LIMIT {_NGRAM_K}"
        ),
        "decontaminate": (
            "WITH g AS (" + _grams_sql(_DECON_N) + "), "
            "bench AS (SELECT DISTINCT gram FROM g "
            f"          WHERE doc_id % {_DECON_MOD} = 0) "
            "SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_shared "
            "FROM g JOIN bench USING (gram) "
            f"WHERE g.doc_id % {_DECON_MOD} <> 0 "
            "GROUP BY g.doc_id ORDER BY g.doc_id"
        ),
        "doc_repetition": (
            # integer repetition signals — fractions (dup/top gram rates)
            # are derivable exactly, so no float encoding can diverge
            "WITH g AS (" + _grams_sql(_REP_N) + "), "
            "per AS (SELECT doc_id, gram, count(*) AS c FROM g "
            "        GROUP BY doc_id, gram), "
            "a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_grams, "
            "             CAST(count(*) AS BIGINT) AS distinct_grams, "
            "             CAST(max(c) AS BIGINT) AS top_gram_n "
            "      FROM per GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(a.total_grams, 0) AS total_grams, "
            "       coalesce(a.distinct_grams, 0) AS distinct_grams, "
            "       coalesce(a.top_gram_n, 0) AS top_gram_n "
            "FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id"
        ),
        "redact": _redact_sql(),
        "chunk_dedup": (
            # fixed-width word chunks, first occurrence per distinct chunk
            # in global (doc_id, chunk_idx) order — dense per-doc token
            # ordinals via row_number over the position-ordered tokens
            f"WITH tok AS ({_ORDERED_TOKS}), "
            "o AS (SELECT doc_id, term, "
            "        row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS o "
            "      FROM tok), "
            f"ch AS (SELECT doc_id, o // {_CHUNK_W} AS chunk_idx, "
            "         string_agg(term, ' ' ORDER BY o) AS chunk "
            f"       FROM o GROUP BY doc_id, o // {_CHUNK_W}), "
            "r AS (SELECT doc_id, chunk_idx, chunk, "
            "        row_number() OVER (PARTITION BY chunk "
            "          ORDER BY doc_id, chunk_idx) AS rn FROM ch) "
            "SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk "
            "FROM r WHERE rn = 1 ORDER BY doc_id, chunk_idx"
        ),
        "kmeans_clusters": _kmeans_sql(_KMEANS_K, _KMEANS_ITERS),
        "quota_sample": (
            # per-stratum quota: the cap rows with the smallest
            # (hash, key) — rank twin of functions.mixture.quota_sample
            "SELECT doc_id, lang FROM ("
            "  SELECT doc_id, lang, row_number() OVER ("
            "    PARTITION BY lang ORDER BY h, doc_id) AS rn FROM ("
            f"   SELECT doc_id, lang, "
            f"   {_mixed_hash63_of('CAST(doc_id AS VARCHAR)')} AS h "
            "    FROM documents)"
            ") WHERE rn <= CASE lang "
            + " ".join(
                f"WHEN '{s}' THEN {c}" for s, c in _QUOTA_CAPS.items()
            )
            + " ELSE 0 END ORDER BY doc_id"
        ),
        "tfidf_terms": (
            # tfidf rounded half-away to 4 dp BEFORE ranking on both
            # sides; ties break on term asc — deterministic total order
            f"WITH tf AS ({_TF}), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
            "s AS (SELECT tf.doc_id, tf.term, "
            "        floor(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 "
            "              / df.df) * 10000 + 0.5) / 10000 AS tfidf "
            "      FROM tf JOIN df USING (term)), "
            "r AS (SELECT doc_id, term, tfidf, "
            "        row_number() OVER (PARTITION BY doc_id "
            "          ORDER BY tfidf DESC, term) AS rnk FROM s) "
            "SELECT doc_id, term, CAST(rnk AS BIGINT) AS rnk, tfidf "
            "FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk"
        ),
        "top_docs_per_lang": (
            "SELECT lang, doc_id, n_chars, rn FROM ("
            "  SELECT lang, doc_id, n_chars, row_number() OVER ("
            "    PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn"
            "  FROM documents"
            f") WHERE rn <= {_GTOPK_K} ORDER BY lang, rn"
        ),
        "unigram_nll": (
            # per-term cost rounded to INTEGER micro-nats before the
            # weighted sum: both engines sum exact integers, so no float
            # summation-order divergence can reach the value hash
            f"WITH tf AS ({_TF}), "
            "tot AS (SELECT term, sum(tf) AS tfg FROM tf GROUP BY term), "
            "t AS (SELECT sum(tfg) AS s FROM tot), "
            "cost AS (SELECT term, CAST(floor(-ln(tfg * 1.0 / t.s) "
            "         * 1000000.0 + 0.5) AS BIGINT) AS c FROM tot, t) "
            "SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
            "       CAST(sum(tf.tf * cost.c) AS BIGINT) AS nll_micro "
            "FROM tf JOIN cost USING (term) "
            "GROUP BY tf.doc_id ORDER BY tf.doc_id"
        ),
        "pmi_bigrams": (
            # pmi decomposed as ln n2 − ln n1a − ln n1b + (2 ln T − ln B):
            # every ln is over an integer count, the op sequence is spelled
            # identically in the engine (functions/ngrams.py:pmi_bigrams_ds)
            f"WITH uni AS (SELECT term, count(*) AS n1 FROM ({_TOKS}) "
            "             GROUP BY term), "
            "big AS (SELECT toks[i] AS w1, toks[i+1] AS w2, "
            "               count(*) AS n2 "
            "  FROM (SELECT list_filter("
            "          string_split_regex(lower(text), '[^a-z0-9]+'), "
            "          t -> t <> '') AS toks FROM documents), "
            "       UNNEST(generate_series(1, len(toks) - 1)) AS g(i) "
            "  GROUP BY 1, 2), "
            "t1 AS (SELECT sum(n1) AS s FROM uni), "
            "b2 AS (SELECT sum(n2) AS s FROM big), "
            "p AS (SELECT w1, w2, CAST(n2 AS BIGINT) AS n, "
            "        CAST(floor((ln(n2 * 1.0) - ln(ua.n1 * 1.0) "
            "          - ln(ub.n1 * 1.0) "
            "          + (2.0 * ln(t1.s * 1.0) - ln(b2.s * 1.0))) "
            "          * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro "
            "      FROM big CROSS JOIN t1 CROSS JOIN b2 "
            "      JOIN uni ua ON ua.term = big.w1 "
            "      JOIN uni ub ON ub.term = big.w2 "
            f"     WHERE n2 >= {_PMI_MIN}) "
            "SELECT w1, w2, n, pmi_micro FROM p "
            f"ORDER BY pmi_micro DESC, w1, w2 LIMIT {_PMI_K}"
        ),
        "priority_revenue": (
            # the skew_join (hot-broadcast ∪ cold-hash) must equal the
            # plain inner join; floor(x+0.5) half-away shared both sides
            "SELECT o_orderpriority, "
            "CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 "
            "  + 0.5) AS BIGINT) AS revenue_cents, "
            "count(*) AS n "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "running_totals": (
            # fixed-point v_micro shared with the engine; ROWS frame (not
            # the default RANGE) so tie handling is positional, and the
            # (ts, event_id) order is per-user unique so ranks are
            # deterministic; delta coalesces to v on first rows (both
            # sides) to keep the column null-free int64
            "WITH e AS (SELECT user_id, ts, event_id, "
            "CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro "
            "FROM events) "
            "SELECT user_id, ts, event_id, v_micro, "
            "CAST(sum(v_micro) OVER w AS BIGINT) AS cum_micro, "
            "coalesce(v_micro - lag(v_micro) OVER w, v_micro) "
            "  AS delta_micro "
            "FROM e WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "ORDER BY user_id, ts, event_id"
        ),
        "urgent_revenue": (
            # the bloom-pruned + exact-verified semi-join must equal the
            # plain IN-subquery semi-join
            "SELECT l_returnflag, "
            "CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) "
            "  AS BIGINT) AS qty_cents, "
            "count(*) AS n "
            "FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders "
            " WHERE o_orderpriority = '1-URGENT') "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "fuzzy_decontaminate": (
            # brute-force cross-table exact-Jaccard twin (shingle CTE
            # shared with _ngram_jaccard_sql; the engine's banding at
            # b=32/r=4 has miss prob < 1e-7 at jaccard 0.8)
            f"""
WITH l AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2] AS s
  FROM l, UNNEST(range(1, greatest(len(toks) - 2, 0) + 1)) AS u(i)
  WHERE len(toks) >= 3
  UNION
  SELECT DISTINCT doc_id, list_aggregate(toks, 'string_agg', chr(1)) AS s
  FROM l WHERE len(toks) BETWEEN 1 AND 2
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_id AS c, b.doc_id AS b, count(*) AS i
  FROM sh c JOIN sh b ON c.s = b.s
  AND c.doc_id % {_FUZZY_MOD} <> 0 AND b.doc_id % {_FUZZY_MOD} = 0
  GROUP BY 1, 2
)
SELECT DISTINCT i.c AS doc_id FROM inter i
JOIN sz sc ON i.c = sc.doc_id JOIN sz sb ON i.b = sb.doc_id
WHERE i.i * 1.0 / (sc.n + sb.n - i.i) >= {_FUZZY_TAU}
ORDER BY doc_id
"""
        ),
        "knn_join": (
            # fixed-point sims (the kmeans rounding contract); rank by
            # (sim_micro DESC, neighbor_id) is integer-deterministic
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
            "CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000.0 "
            "  + 0.5) AS BIGINT) AS sim_micro "
            "FROM e a JOIN e b ON a.vec_id <> b.vec_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY sim_micro DESC, neighbor_id) AS rn FROM p) "
            f"SELECT vec_id, neighbor_id, rn, sim_micro FROM r "
            f"WHERE rn <= {_KNN_K} ORDER BY vec_id, rn"
        ),
        "rollup_revenue": (
            # aggregated-out dims coalesce to the engine's total label
            "SELECT coalesce(l_returnflag, '<all>') AS l_returnflag, "
            "coalesce(l_linestatus, '<all>') AS l_linestatus, "
            "CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) "
            "  AS BIGINT) AS qty_cents, "
            "count(*) AS n "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) "
            "ORDER BY 1, 2"
        ),
        "funnel_counts": (
            # strictly-after semantics: each stage's first time must
            # exceed the key's previous-stage first time (same > both
            # engines)
            "WITH t1 AS (SELECT user_id, min(ts) AS t FROM events "
            f"  WHERE event_type = '{_FUNNEL[0]}' GROUP BY 1), "
            "t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t "
            f"  WHERE e.event_type = '{_FUNNEL[1]}' GROUP BY 1), "
            "t3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t "
            f"  WHERE e.event_type = '{_FUNNEL[2]}' GROUP BY 1) "
            "SELECT * FROM ("
            f"  SELECT 1 AS stage_idx, '{_FUNNEL[0]}' AS stage, "
            "     (SELECT count(*) FROM t1) AS n_users "
            f"  UNION ALL SELECT 2, '{_FUNNEL[1]}', "
            "     (SELECT count(*) FROM t2) "
            f"  UNION ALL SELECT 3, '{_FUNNEL[2]}', "
            "     (SELECT count(*) FROM t3)"
            ") ORDER BY stage_idx"
        ),
        "distinct_users_by_type": (
            "SELECT event_type, count(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "distinct_users_hourly": (
            "SELECT date_trunc('hour', ts) AS hour, "
            "count(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY 1 ORDER BY hour"
        ),
        "props_stats": (
            # flat-JSON field extraction twin: DuckDB regexp_extract is
            # RE2 like Arrow's extract_regex, so the pattern replays
            # byte-for-byte; absent/non-integer fields extract '' -> NULL
            "SELECT event_type, count(k) AS n, "
            "CAST(sum(k) AS BIGINT) AS sum_k, "
            "min(k) AS min_k, max(k) AS max_k FROM ("
            "  SELECT event_type, CAST(nullif(regexp_extract(props, "
            "  '\"k\":\\s*(-?\\d+)[,}\\s]', 1), '') AS BIGINT) AS k FROM events"
            ") GROUP BY event_type ORDER BY event_type"
        ),
        "trailing_window": (
            # value-based RANGE frame over integer epoch-µs — ties at
            # the same ts are all included, matching the engine's
            # searchsorted(side='right') bound; integer sums bit-stable
            "WITH e AS (SELECT user_id, ts, event_id, "
            "CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro "
            "FROM events) "
            "SELECT user_id, ts, event_id, v_micro, "
            "CAST(sum(v_micro) OVER w AS BIGINT) AS w_sum, "
            "CAST(count(*) OVER w AS BIGINT) AS w_n "
            "FROM e WINDOW w AS (PARTITION BY user_id "
            "ORDER BY epoch_us(ts) "
            f"RANGE BETWEEN {_RANGE_WIN_US} PRECEDING AND CURRENT ROW) "
            "ORDER BY user_id, ts, event_id"
        ),
        "extract_matches": (
            # both engines are RE2: leftmost non-overlapping greedy
            # matches coincide; generate_subscripts is 1-based like the
            # engine's idx
            "SELECT doc_id, generate_subscripts(ms, 1) AS idx, "
            "unnest(ms) AS match FROM (SELECT doc_id, "
            f"regexp_extract_all(text, '{_EXTRACT_PAT}') AS ms "
            "FROM documents) ORDER BY doc_id, idx"
        ),
        "winsorized_sums": (
            # thresholds at the engine's floor(q*(n-1)) order-statistic
            # ranks; clipping selects exact data values so the micro
            # quantization sees identical floats
            "WITH f AS (SELECT event_type, value FROM events "
            "  WHERE isfinite(value)), "
            "s AS (SELECT value, row_number() OVER (ORDER BY value) - 1 "
            "  AS rn FROM f), "
            "n AS (SELECT count(*) AS c FROM f), "
            "lo AS (SELECT value AS v FROM s WHERE rn = CAST(floor("
            f"  {_WINSOR_LO} * ((SELECT c FROM n) - 1)) AS BIGINT)), "
            "hi AS (SELECT value AS v FROM s WHERE rn = CAST(floor("
            f"  {_WINSOR_HI} * ((SELECT c FROM n) - 1)) AS BIGINT)) "
            "SELECT event_type, "
            "CAST(sum(CAST(floor(least(greatest(value, (SELECT v FROM lo)), "
            "  (SELECT v FROM hi)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "  AS wsum_micro, "
            "count(*) AS n "
            "FROM f GROUP BY event_type ORDER BY event_type"
        ),
        "skipgram_counts": (
            # ordered pairs within the window; the engine's joined-gram
            # tie-break equals (w1, w2) because the separator byte sorts
            # below every token character
            "WITH l AS (SELECT doc_id, "
            "  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "              x -> x <> '') AS toks FROM documents), "
            "t AS (SELECT doc_id, toks[i] AS w, i FROM l, "
            "  UNNEST(range(1, len(toks) + 1)) AS u(i)), "
            "p AS (SELECT a.w AS w1, b.w AS w2, count(*) AS n "
            "  FROM t a JOIN t b ON a.doc_id = b.doc_id "
            f"  AND b.i - a.i BETWEEN 1 AND {_SKIP_W} GROUP BY 1, 2) "
            f"SELECT w1, w2, n FROM p ORDER BY n DESC, w1, w2 LIMIT {_SKIP_K}"
        ),
        "cust_order_dist": (
            # TPC-H Q13: count(o_orderkey) is valid-only, so zero-order
            # customers land in the c_count = 0 bucket on both engines
            "WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY 1) "
            "SELECT CAST(c_count AS BIGINT) AS c_count, "
            "count(*) AS n_customers FROM pc GROUP BY 1 "
            "ORDER BY n_customers DESC, c_count DESC"
        ),
        "doc_entropy": (
            # lnm(x) = floor(ln(x)*1e6 + 0.5) per integer count — both
            # engines take libm ln of integers, so the rounded values
            # coincide; everything after is integer arithmetic
            f"WITH toks AS ({_TOKS}), "
            "tf AS (SELECT doc_id, term, count(*) AS c FROM toks "
            "  GROUP BY 1, 2), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), "
            "contrib AS (SELECT doc_id, "
            "  sum(c * CAST(floor(ln(c) * 1000000.0 + 0.5) AS BIGINT)) "
            "  AS s FROM tf GROUP BY 1) "
            "SELECT d.doc_id, coalesce(dl.dl, 0) AS dl, "
            "CAST(coalesce(dl.dl * CAST(floor(ln(dl.dl) * 1000000.0 "
            "  + 0.5) AS BIGINT) - contrib.s, 0) AS BIGINT) AS ent_microdl "
            "FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id "
            "LEFT JOIN contrib ON d.doc_id = contrib.doc_id "
            "ORDER BY d.doc_id"
        ),
        "quality_pctl_gate": (
            # threshold = the exact order statistic at 0-based rank
            # floor((1-frac)*(n-1)) of ent_microdl ascending (the
            # engine's exact_quantiles rank formula, frac=0.5); keep
            # every doc AT or above it — ties all survive, so no
            # tie-break rule is needed on either engine
            f"WITH toks AS ({_TOKS}), "
            "tf AS (SELECT doc_id, term, count(*) AS c FROM toks "
            "  GROUP BY 1, 2), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), "
            "contrib AS (SELECT doc_id, "
            "  sum(c * CAST(floor(ln(c) * 1000000.0 + 0.5) AS BIGINT)) "
            "  AS s FROM tf GROUP BY 1), "
            "ent AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl, "
            "CAST(coalesce(dl.dl * CAST(floor(ln(dl.dl) * 1000000.0 "
            "  + 0.5) AS BIGINT) - contrib.s, 0) AS BIGINT) AS ent_microdl "
            "FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id "
            "LEFT JOIN contrib ON d.doc_id = contrib.doc_id), "
            "r AS (SELECT ent_microdl AS v, "
            "  row_number() OVER (ORDER BY ent_microdl) AS rn, "
            "  count(*) OVER () AS n FROM ent), "
            "thr AS (SELECT v FROM r "
            "  WHERE rn - 1 = CAST(floor(0.5 * (n - 1)) AS BIGINT)) "
            "SELECT e.doc_id, e.dl, e.ent_microdl FROM ent e, thr "
            "WHERE e.ent_microdl >= thr.v ORDER BY e.doc_id"
        ),
        "lang_pctl_gate": (
            # per-group replay of quality_pctl_gate: the window rank and
            # count run PARTITION BY lang, so each language learns its
            # own cutoff at rank floor(0.5*(n_g-1)); threshold ties all
            # survive on both engines
            f"WITH toks AS ({_TOKS}), "
            "tf AS (SELECT doc_id, term, count(*) AS c FROM toks "
            "  GROUP BY 1, 2), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), "
            "contrib AS (SELECT doc_id, "
            "  sum(c * CAST(floor(ln(c) * 1000000.0 + 0.5) AS BIGINT)) "
            "  AS s FROM tf GROUP BY 1), "
            "ent AS (SELECT d.doc_id, d.lang, coalesce(dl.dl, 0) AS dl, "
            "CAST(coalesce(dl.dl * CAST(floor(ln(dl.dl) * 1000000.0 "
            "  + 0.5) AS BIGINT) - contrib.s, 0) AS BIGINT) AS ent_microdl "
            "FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id "
            "LEFT JOIN contrib ON d.doc_id = contrib.doc_id), "
            "r AS (SELECT lang, ent_microdl AS v, "
            "  row_number() OVER (PARTITION BY lang ORDER BY ent_microdl) "
            "    AS rn, "
            "  count(*) OVER (PARTITION BY lang) AS n FROM ent), "
            "thr AS (SELECT lang, v FROM r "
            "  WHERE rn - 1 = CAST(floor(0.5 * (n - 1)) AS BIGINT)) "
            "SELECT e.doc_id, e.lang, e.dl, e.ent_microdl "
            "FROM ent e JOIN thr USING (lang) "
            "WHERE e.ent_microdl >= thr.v ORDER BY e.doc_id"
        ),
        "oov_rate": (
            # vocabulary = top-K terms by (count desc, term asc); OOV
            # share per lang in floor fixed-point over BIGINTs — exact.
            # Langs whose docs tokenize to nothing still appear (LEFT
            # JOIN from the lang universe, zero-filled), mirroring the
            # engine's zero-row emission for token-less slices
            "WITH toks AS (SELECT d.lang, lower(u.t) AS term "
            "  FROM documents d, "
            "  UNNEST(string_split_regex(lower(d.text), '[^a-z0-9]+')) "
            "    AS u(t) WHERE u.t <> ''), "
            "counts AS (SELECT term, count(*) AS n FROM toks GROUP BY 1), "
            "top AS (SELECT term FROM (SELECT term, "
            "  row_number() OVER (ORDER BY n DESC, term) AS rn FROM counts) "
            f"  WHERE rn <= {_OOV_K}), "
            "per AS (SELECT t.lang, count(*) AS total_tokens, "
            "  sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS oov "
            "  FROM toks t LEFT JOIN top v ON t.term = v.term GROUP BY 1) "
            "SELECT l.lang, CAST(coalesce(p.total_tokens, 0) AS BIGINT) "
            "  AS total_tokens, "
            "CAST(coalesce(p.oov, 0) AS BIGINT) AS oov_tokens, "
            "CAST(CASE WHEN coalesce(p.total_tokens, 0) > 0 "
            "  THEN p.oov * 1000000 // p.total_tokens ELSE 0 END AS BIGINT) "
            "  AS oov_micro "
            "FROM (SELECT DISTINCT lang FROM documents) l "
            "LEFT JOIN per p ON l.lang = p.lang ORDER BY l.lang"
        ),
        "name_matches": (
            # the deletion-banded + alignment-verified pairs must equal
            # the brute-force levenshtein join (names are ASCII, so
            # byte- and codepoint-distance coincide)
            "WITH n AS (SELECT DISTINCT p_name FROM part) "
            "SELECT a.p_name AS name_a, b.p_name AS name_b "
            "FROM n a JOIN n b ON a.p_name < b.p_name "
            "AND levenshtein(a.p_name, b.p_name) <= 1 "
            "ORDER BY 1, 2"
        ),
        "overlap_chunks": (
            # window starts at token ordinals 0, stride, 2·stride, …;
            # each window aggregates up to `width` tokens in position
            # order; token-less docs contribute none (empty range)
            "WITH l AS (SELECT doc_id, "
            "  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "              x -> x <> '') AS toks FROM documents), "
            "st AS (SELECT doc_id, u.s AS s FROM l, "
            f"  UNNEST(range(0, greatest(len(toks), 0), {_OVL_S})) u(s)), "
            "t AS (SELECT doc_id, toks[i] AS w, i - 1 AS pos FROM l, "
            "  UNNEST(range(1, len(toks) + 1)) AS u(i)) "
            f"SELECT st.doc_id, CAST(st.s / {_OVL_S} AS BIGINT) AS chunk_idx, "
            "string_agg(t.w, ' ' ORDER BY t.pos) AS chunk "
            "FROM st JOIN t ON st.doc_id = t.doc_id "
            f"AND t.pos >= st.s AND t.pos < st.s + {_OVL_W} "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "pagerank_docs": _pagerank_sql(3),
        "bm25_prf_topk": _prf_sql(),
        "rrf_fusion": (
            # exact twin of pipelines.fulltext.rrf_fuse over the same two
            # top-50 rankings: rank = 1-based row_number with the engine's
            # (rounded score / n_chars) DESC, doc_id tiebreak; fused
            # contribution is integer 10^6 // (60 + rank)
            _BM25_BODY
            + """,
a AS (SELECT doc_id, row_number() OVER
        (ORDER BY round(score, 4) DESC, doc_id) AS r
      FROM scores QUALIFY r <= 50),
b AS (SELECT doc_id, row_number() OVER
        (ORDER BY n_chars DESC, doc_id) AS r
      FROM documents QUALIFY r <= 50),
u AS (SELECT doc_id, 1000000 // (60 + r) AS c FROM a
      UNION ALL SELECT doc_id, 1000000 // (60 + r) AS c FROM b)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro FROM u
GROUP BY doc_id ORDER BY rrf_micro DESC, doc_id LIMIT 10
"""
        ),
        "length_percentiles": (
            # exact twin of functions.quantiles.value_percentiles_ds over
            # token counts: pct = (rank()-1) * 1e6 // n, ties share the
            # lowest rank (the count-strictly-below convention)
            "WITH t AS (SELECT d.doc_id, coalesce(x.n, 0) AS n_tokens "
            "FROM documents d LEFT JOIN ("
            f"  SELECT doc_id, count(*) AS n FROM ({_TOKS}) GROUP BY doc_id"
            ") x ON d.doc_id = x.doc_id) "
            "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST((rank() OVER (ORDER BY n_tokens) - 1) * 1000000 "
            "// (SELECT count(*) FROM t) AS BIGINT) AS pct_micro "
            "FROM t ORDER BY doc_id"
        ),
        "pack_by_lang": (
            # grouped twin of pack_bins: the window cumsum restarts per
            # language partition
            "WITH t AS (SELECT d.doc_id, d.lang, coalesce(x.n, 0) AS n "
            "FROM documents d LEFT JOIN ("
            f"  SELECT doc_id, count(*) AS n FROM ({_TOKS}) GROUP BY doc_id"
            ") x ON d.doc_id = x.doc_id) "
            "SELECT doc_id, lang, CAST(n AS BIGINT) AS n_tokens, "
            "CAST(coalesce(sum(n) OVER (PARTITION BY lang ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 "
            "AS BIGINT) AS bin_id FROM t ORDER BY doc_id"
        ),
        "token_budget_sample": (
            # exact twin of functions.packing.token_budget_sample_ds:
            # hash-ordered window cumsum, keep while the EXCLUSIVE
            # prefix stays under budget (same FNV+mix hash, doc_id
            # tiebreak on hash collisions)
            "WITH dl AS (SELECT d.doc_id, coalesce(x.n, 0) AS n "
            "FROM documents d LEFT JOIN ("
            f"  SELECT doc_id, count(*) AS n FROM ({_TOKS}) GROUP BY doc_id"
            ") x ON d.doc_id = x.doc_id), "
            "hh AS (SELECT doc_id, n, "
            f"{_mixed_hash63_of('CAST(doc_id AS VARCHAR)')} AS h FROM dl) "
            "SELECT doc_id, CAST(n AS BIGINT) AS n_tokens FROM ("
            "  SELECT doc_id, n, coalesce(sum(n) OVER (ORDER BY h, doc_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl "
            "  FROM hh) WHERE excl < 12000 ORDER BY doc_id"
        ),
        "dataset_split": (
            # reproducible split by hash bucket: same FNV+mix hash mod
            # 100, 90/5/5 thresholds
            "SELECT doc_id, CASE WHEN hb < 90 THEN 'train' "
            "WHEN hb < 95 THEN 'val' ELSE 'test' END AS split FROM ("
            f"  SELECT doc_id, {_mixed_hash63_of('CAST(doc_id AS VARCHAR)')}"
            "  % 100 AS hb FROM documents) ORDER BY doc_id"
        ),
        "corpus_summary": (
            "WITH dl AS (SELECT d.doc_id, coalesce(x.n, 0) AS n "
            "FROM documents d LEFT JOIN ("
            f"  SELECT doc_id, count(*) AS n FROM ({_TOKS}) GROUP BY doc_id"
            ") x ON d.doc_id = x.doc_id) "
            "SELECT (SELECT count(*) FROM documents) AS n_docs, "
            "CAST(coalesce(sum(n), 0) AS BIGINT) AS total_tokens, "
            "CAST(max(n) AS BIGINT) AS max_dl, "
            f"(SELECT count(DISTINCT term) FROM ({_TOKS})) AS n_terms "
            "FROM dl"
        ),
        "dup_cluster_sizes": (
            # size histogram over the same component labeling as
            # dup_components (recursive-closure twin)
            "WITH L AS ("
            + _cc_labels_sql(_NGRAM_EDGES_CTE, "documents", "doc_id")
            + ") SELECT sz AS cluster_size, count(*) AS n_clusters FROM ("
            "SELECT component, count(*) AS sz FROM L GROUP BY component"
            ") GROUP BY sz ORDER BY cluster_size"
        ),
        "incremental_dedup": (
            # incoming slice anti-joined on the shared fingerprint twin;
            # the engine's bloom stage is exact after verification, so
            # plain NOT IN is the oracle
            f"WITH f AS ({_fingerprint_sql()}) "
            "SELECT doc_id, fp64 FROM f WHERE doc_id % 7 = 3 "
            "AND fp64 NOT IN (SELECT fp64 FROM f WHERE doc_id % 7 <> 3) "
            "ORDER BY doc_id"
        ),
        "price_percentiles": (
            # exact twin of functions.grouped.grouped_rank_percentile_ds:
            # (rank()-1)·1e6 // group size, ties share the lowest rank
            "SELECT o_orderkey, o_orderpriority, o_totalprice, "
            "CAST((rank() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice) - 1) * 1000000 "
            "// count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) "
            "AS pct_micro FROM orders ORDER BY o_orderkey"
        ),
        "more_like_this": (
            # exact twin of pipelines.fulltext.more_like_this_dataset:
            # w = tf · (ln N − ln df) (integer-ln decomposition, subtract
            # BEFORE the tf multiply), cosine = dot/(sqrt·sqrt), rounded
            # half-away to 6 dp before the top-k order
            f"WITH tf AS ({_TF}), "
            "nn AS (SELECT count(*) AS n FROM documents), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
            "w AS (SELECT tf.doc_id, tf.term, "
            "tf.tf * (ln((SELECT n FROM nn) * 1.0) - ln(df.df * 1.0)) AS w "
            "FROM tf JOIN df USING (term)), "
            f"src AS (SELECT term, w FROM w WHERE doc_id = {_MLT_SRC}), "
            "norms AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id), "
            "dots AS (SELECT w.doc_id, sum(w.w * s.w) AS dot "
            "FROM w JOIN src s USING (term) GROUP BY w.doc_id) "
            "SELECT d.doc_id, round(d.dot / (sqrt(nm.n2) * "
            f"sqrt((SELECT n2 FROM norms WHERE doc_id = {_MLT_SRC}))), 6) "
            "AS cos_sim FROM dots d JOIN norms nm USING (doc_id) "
            f"WHERE d.doc_id <> {_MLT_SRC} AND nm.n2 > 0 "
            "ORDER BY cos_sim DESC, d.doc_id LIMIT 10"
        ),
        "transition_counts": (
            # exact twin of functions.funnel.transition_counts_ds:
            # adjacency by lead() over the same (ts, event_id) order;
            # null users excluded on both engines
            "WITH o AS (SELECT event_type AS src, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS dst "
            "FROM events WHERE user_id IS NOT NULL "
            "AND event_type IS NOT NULL) "
            "SELECT src AS src_type, dst AS dst_type, count(*) AS n "
            "FROM o WHERE dst IS NOT NULL GROUP BY 1, 2 "
            "ORDER BY n DESC, src_type, dst_type LIMIT 20"
        ),
        "quality_filter": (
            # threshold gate over the SAME rounded signals _quality_sql
            # emits — values are bit-identical across engines, so the
            # boundary comparisons agree exactly
            f"SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM ({_quality_sql()}) "
            "WHERE n_tokens BETWEEN 10 AND 100000 AND alpha_ratio >= 0.5 "
            "AND digit_ratio <= 0.3 AND stopword_ratio >= 0.01 "
            "ORDER BY doc_id"
        ),
        "value_histogram": (
            # exact twin of functions.quantiles.equi_width_hist_ds. The
            # engine floor-divides (numpy //); DuckDB's integer //
            # TRUNCATES toward zero, so the twin spells floor division
            # explicitly (subtract 1 when a negative micro has remainder)
            "WITH m AS (SELECT CAST(floor(value * 1000000.0 + 0.5) "
            "AS BIGINT) AS micro FROM events WHERE isfinite(value)) "
            "SELECT (micro // 250000) - CASE WHEN micro < 0 "
            "AND micro % 250000 <> 0 THEN 1 ELSE 0 END AS bucket, "
            "count(*) AS n FROM m GROUP BY 1 ORDER BY bucket"
        ),
        "bigram_lm": (
            # exact twin of functions.ngrams.bigram_lm_ds: integer
            # p_micro = (n2 * 1e6) // n1 with the (n DESC, w1, w2) order
            f"WITH uni AS (SELECT term, count(*) AS n1 FROM ({_TOKS}) "
            "             GROUP BY term), "
            "big AS (SELECT toks[i] AS w1, toks[i+1] AS w2, "
            "               count(*) AS n2 "
            "  FROM (SELECT list_filter("
            "          string_split_regex(lower(text), '[^a-z0-9]+'), "
            "          t -> t <> '') AS toks FROM documents), "
            "       UNNEST(generate_series(1, len(toks) - 1)) AS g(i) "
            "  GROUP BY 1, 2) "
            "SELECT w1, w2, CAST(n2 AS BIGINT) AS n, "
            "CAST((n2 * 1000000) // ua.n1 AS BIGINT) AS p_micro "
            "FROM big JOIN uni ua ON ua.term = big.w1 "
            "WHERE n2 >= 5 ORDER BY n DESC, w1, w2 LIMIT 20"
        ),
        "seed_distance": _bfs_sql(3),
        "hits_scores": _hits_sql(2),
        "pack_bins": (
            # exact twin of functions.packing.pack_bins_ds: bin of the
            # id-ordered token stream split every 512 tokens = exclusive
            # prefix token sum // 512 (token-less docs count 0)
            "WITH t AS (SELECT d.doc_id, coalesce(x.n, 0) AS n_tokens "
            "FROM documents d LEFT JOIN ("
            f"  SELECT doc_id, count(*) AS n FROM ({_TOKS}) GROUP BY doc_id"
            ") x ON d.doc_id = x.doc_id) "
            "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 "
            "AS BIGINT) AS bin_id FROM t ORDER BY doc_id"
        ),
        "temp_sample": (
            # exact twin of functions.mixture.temperature_sample: keep
            # rate per lang = min(1e6, (T·isqrt(c)·1e6) // (c·Σisqrt))
            # micro-units with T = total // 3; the isqrt CASE corrects
            # float sqrt's ±1; filter is the shared FNV+mix hash
            "WITH c AS (SELECT lang, count(*) AS c FROM documents "
            "WHERE lang IS NOT NULL GROUP BY lang), "
            "tot AS (SELECT sum(c) AS t FROM c), "
            "iq AS (SELECT lang, c, CASE WHEN (s + 1) * (s + 1) <= c THEN s + 1 "
            "WHEN s * s > c THEN s - 1 ELSE s END AS w FROM ("
            "  SELECT lang, c, CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS s FROM c)), "
            "ws AS (SELECT sum(w) AS w FROM iq), "
            "r AS (SELECT lang, least(1000000, CAST("
            "(CAST((SELECT t FROM tot) // 3 AS HUGEINT) * w * 1000000) "
            "// (CAST(c AS HUGEINT) * (SELECT w FROM ws)) AS BIGINT)) AS rate "
            "FROM iq) "
            "SELECT doc_id, lang FROM ("
            "  SELECT d.doc_id, d.lang, r.rate, "
            f"  {_mixed_hash63_of('CAST(d.doc_id AS VARCHAR)')} AS h "
            "  FROM documents d JOIN r USING (lang)) "
            "WHERE h % 1000000 < rate ORDER BY doc_id"
        ),
        "corr_qty_disc": (
            # exact twin of functions.stats.grouped_corr_ds: integer
            # moment sums in HUGEINT, isqrt via the float-sqrt ±1 CASE
            # fix, magnitude floored before the sign (so truncating //
            # on the non-negative magnitude == the engine's floor)
            "WITH b AS (SELECT l_returnflag, "
            "  CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x, "
            "  CAST(floor(l_discount * 100 + 0.5) AS HUGEINT) AS y FROM lineitem), "
            "s AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n, "
            "  sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy, "
            "  sum(x*y) AS sxy FROM b GROUP BY l_returnflag), "
            "v AS (SELECT l_returnflag, n, n*sxy - sx*sy AS num, "
            "  (n*sxx - sx*sx) * (n*syy - sy*sy) AS p FROM s), "
            "i AS (SELECT l_returnflag, n, num, "
            "  CASE WHEN (s0 + 1) * (s0 + 1) <= p THEN s0 + 1 "
            "       WHEN s0 * s0 > p THEN s0 - 1 ELSE s0 END AS den "
            "  FROM (SELECT l_returnflag, n, num, p, "
            "        CAST(floor(sqrt(CAST(p AS DOUBLE))) AS HUGEINT) AS s0 FROM v)) "
            "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
            "CAST(CASE WHEN den = 0 THEN 0 "
            "     WHEN num < 0 THEN -(((-num) * 1000000) // den) "
            "     ELSE (num * 1000000) // den END AS BIGINT) AS corr_micro "
            "FROM i ORDER BY l_returnflag"
        ),
        "decayed_users": (
            # exact twin of functions.stats.decayed_topk_ds: dyadic decay
            # weight 2^(24 - age_days) inside the horizon, 0 outside;
            # delta >= 0 guard keeps // on non-negatives (truncate ==
            # floor there — the signed-division engine-parity pitfall)
            f"WITH w AS (SELECT user_id, "
            "  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, "
            f"  {_DECAY_ANCHOR_US} - epoch_us(ts) AS delta FROM events "
            "  WHERE isfinite(value) AND user_id IS NOT NULL AND ts IS NOT NULL), "
            "s AS (SELECT user_id, sum(CASE WHEN delta >= 0 "
            f"  AND delta // 86400000000 <= {_DECAY_HORIZON} "
            f"  THEN cents * (CAST(1 AS BIGINT) << ({_DECAY_HORIZON} "
            "  - CAST(delta // 86400000000 AS INT))) ELSE 0 END) AS score "
            "  FROM w GROUP BY user_id) "
            "SELECT user_id, CAST(score AS BIGINT) AS score FROM s "
            "ORDER BY score DESC, user_id LIMIT 20"
        ),
        "mad_by_type": (
            # exact twin of functions.quantiles.grouped_mad_ds: median =
            # value at rank floor(0.5*(n-1)) of the group's sorted finite
            # values; dev = abs(v - median) is one IEEE double subtract
            # of exact data values, so the second order statistic agrees
            "WITH f AS (SELECT event_type, value FROM events "
            "  WHERE isfinite(value)), "
            "m AS (SELECT event_type, value AS median FROM ("
            "  SELECT event_type, value, "
            "    row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rk, "
            "    count(*) OVER (PARTITION BY event_type) AS n FROM f) "
            "  WHERE rk = CAST(floor(0.5 * (n - 1)) AS BIGINT)), "
            "d AS (SELECT f.event_type, abs(f.value - m.median) AS dev "
            "  FROM f JOIN m USING (event_type)), "
            "r AS (SELECT event_type, dev, "
            "  row_number() OVER (PARTITION BY event_type ORDER BY dev) - 1 AS rk, "
            "  count(*) OVER (PARTITION BY event_type) AS n FROM d) "
            "SELECT r.event_type, m.median, r.dev AS mad "
            "FROM r JOIN m USING (event_type) "
            "WHERE rk = CAST(floor(0.5 * (n - 1)) AS BIGINT) ORDER BY r.event_type"
        ),
        "negative_pairs": (
            # exact twin of functions.sampling.negative_pairs_ds: rank =
            # row_number over (63-bit mixed hash, id); partners at
            # rank + j*(n//3) mod n on the ring, self-pairs dropped
            f"WITH h AS (SELECT doc_id, "
            f"  {_mixed_hash63_of('CAST(doc_id AS VARCHAR)')} AS hv FROM documents), "
            "r AS (SELECT doc_id, "
            "  row_number() OVER (ORDER BY hv, doc_id) - 1 AS rk FROM h), "
            "n AS (SELECT count(*) AS c FROM r), "
            "p AS (SELECT doc_id, rk, j, "
            "  (rk + j * ((SELECT c FROM n) // 3)) % (SELECT c FROM n) AS prk "
            "  FROM r CROSS JOIN (VALUES (1), (2)) AS js(j)) "
            "SELECT p.doc_id, CAST(p.j AS BIGINT) AS j, r2.doc_id AS neg_id "
            "FROM p JOIN r r2 ON r2.rk = p.prk WHERE r2.doc_id <> p.doc_id "
            "ORDER BY p.doc_id, j"
        ),
        "ann_recall": _ann_recall_sql(),
        "term_clusters": _term_clusters_sql(),
        "embed_project": _embed_project_sql(),
        "bpe_merges": _bpe_merges_sql(_BPE_ITERS),
        "bpe_tokenize": _bpe_tokenize_sql(_BPE_ITERS),
        "slice_jaccard": (
            # distinct (lang, gram) rows; inter via gram self-join with
            # lang_a < lang_b; union by inclusion-exclusion; pinned slice
            # pair list so empty slices still emit rows (jaccard 0)
            f"WITH gg AS ({_grams_sql(3)}), "
            "g AS (SELECT DISTINCT d.lang, gg.gram FROM gg "
            "  JOIN documents d USING (doc_id) "
            f"  WHERE d.lang IN ({', '.join(repr(s) for s in _SJ_SLICES)})), "
            "c AS (SELECT lang, count(*) AS c FROM g GROUP BY 1), "
            "x AS (SELECT a.lang AS sa, b.lang AS sb, count(*) AS inter "
            "  FROM g a JOIN g b ON a.gram = b.gram AND a.lang < b.lang "
            "  GROUP BY 1, 2), "
            "sl(lang) AS (VALUES "
            f"{', '.join('(' + repr(s) + ')' for s in _SJ_SLICES)}), "
            "p AS (SELECT a.lang AS sa, b.lang AS sb FROM sl a "
            "  JOIN sl b ON a.lang < b.lang) "
            "SELECT p.sa AS slice_a, p.sb AS slice_b, "
            "CAST(coalesce(x.inter, 0) AS BIGINT) AS inter, "
            "CAST(coalesce(ca.c, 0) + coalesce(cb.c, 0) "
            "  - coalesce(x.inter, 0) AS BIGINT) AS uni, "
            "CAST(CASE WHEN coalesce(ca.c, 0) + coalesce(cb.c, 0) "
            "  - coalesce(x.inter, 0) > 0 THEN coalesce(x.inter, 0) "
            "  * 1000000 // (coalesce(ca.c, 0) + coalesce(cb.c, 0) "
            "  - coalesce(x.inter, 0)) ELSE 0 END AS BIGINT) "
            "  AS jaccard_micro "
            "FROM p LEFT JOIN x ON x.sa = p.sa AND x.sb = p.sb "
            "LEFT JOIN c ca ON ca.lang = p.sa "
            "LEFT JOIN c cb ON cb.lang = p.sb "
            "ORDER BY slice_a, slice_b"
        ),
        "keyness_terms": (
            # G2 brackets spelled ln(a) − ln(a+b) − ln(A) + ln(A+B)
            # left-to-right, rounded to micro-nats BEFORE the count
            # multiply — identical IEEE sequence to the engine; assoc
            # compares HUGEINT cross-products (the engine uses exact
            # Python ints on the k result rows)
            f"WITH toks AS ({_TOKS}), "
            "e AS (SELECT t.term, "
            "  CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS tgt "
            "  FROM toks t JOIN documents d USING (doc_id)), "
            "tt AS (SELECT term, sum(tgt) AS a, sum(1 - tgt) AS b "
            "  FROM e GROUP BY 1), "
            "tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM tt), "
            "sc AS (SELECT term, CAST(a AS BIGINT) AS a, "
            "  CAST(b AS BIGINT) AS b, "
            "  CAST(CASE WHEN a * tb > b * ta THEN 1 "
            "       WHEN a * tb < b * ta THEN -1 ELSE 0 END AS BIGINT) "
            "  AS assoc, "
            "  CAST(2 * (CASE WHEN a > 0 THEN a * CAST(floor((ln(a) "
            "    - ln(a + b) - ln(ta) + ln(ta + tb)) * 1000000.0 + 0.5) "
            "    AS BIGINT) ELSE 0 END "
            "  + CASE WHEN b > 0 THEN b * CAST(floor((ln(b) - ln(a + b) "
            "    - ln(tb) + ln(ta + tb)) * 1000000.0 + 0.5) AS BIGINT) "
            "    ELSE 0 END) AS BIGINT) AS g2_micro "
            f"  FROM tt, tot WHERE a + b >= {_KEY_MIN}) "
            "SELECT term, a, b, assoc, g2_micro FROM sc "
            f"ORDER BY g2_micro DESC, term LIMIT {_KEY_K}"
        ),
        "bigram_nll": (
            # cost = floor(-ln(n2/n1)·1e6 + 0.5) per corpus bigram with
            # n1 = Σ_w n(w1 w) (left-context total); both engines spell
            # the SAME double division then libm ln, and every per-doc
            # total is a pure integer sum
            "WITH g AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 "
            "  FROM (SELECT doc_id, "
            "          list_filter(string_split_regex(lower(text), "
            "                      '[^a-z0-9]+'), t -> t <> '') AS toks "
            "        FROM documents), "
            "       UNNEST(generate_series(1, len(toks) - 1)) AS s(i)), "
            "per AS (SELECT doc_id, w1, w2, count(*) AS c FROM g "
            "  GROUP BY 1, 2, 3), "
            "n2 AS (SELECT w1, w2, sum(c) AS n2 FROM per GROUP BY 1, 2), "
            "n1 AS (SELECT w1, sum(n2) AS n1 FROM n2 GROUP BY 1), "
            "cost AS (SELECT w1, w2, "
            "  CAST(floor(-ln(n2 * 1.0 / n1) * 1000000.0 + 0.5) AS BIGINT) "
            "  AS c FROM n2 JOIN n1 USING (w1)) "
            "SELECT per.doc_id, CAST(sum(per.c) AS BIGINT) AS n_bigrams, "
            "CAST(sum(per.c * cost.c) AS BIGINT) AS nll_micro "
            "FROM per JOIN cost USING (w1, w2) GROUP BY 1 ORDER BY 1"
        ),
        "ngram_novelty": (
            # novelty = novel·1e6 // distinct over non-negative integers
            # (floor division agrees across engines on this domain)
            f"WITH g AS (SELECT DISTINCT doc_id, gram FROM "
            f"({_grams_sql(_NOVELTY_N)})), "
            "df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1), "
            "a AS (SELECT g.doc_id, count(*) AS d, "
            "  sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS nov "
            "  FROM g JOIN df USING (gram) GROUP BY 1) "
            "SELECT doc_id, CAST(d AS BIGINT) AS distinct_grams, "
            "CAST(nov AS BIGINT) AS novel_grams, "
            "CAST(nov * 1000000 // d AS BIGINT) AS novelty_micro "
            "FROM a ORDER BY doc_id"
        ),
        "dsir_weights": (
            # delta(b) = floor((ln((ct+1)/(Tt+B)) − ln((cr+1)/(Tr+B)))·1e6
            # + 0.5) per hashed bucket, weight = Σ tf·delta — the engine's
            # finalized FNV-63 replayed via HUGEINT, micro-nat contract
            f"WITH tf AS ({_TF}), "
            "dt AS (SELECT DISTINCT term FROM tf), "
            f"th AS (SELECT term, CAST(({_mixed_hash63_of('term')}) "
            f"  % {_DSIR_BUCKETS} AS BIGINT) AS b FROM dt), "
            "e AS (SELECT tf.doc_id, tf.tf, th.b, "
            "  CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS tgt "
            "  FROM tf JOIN th USING (term) "
            "  JOIN documents d USING (doc_id)), "
            "bc AS (SELECT b, sum(tf * tgt) AS ct, sum(tf) AS cr "
            "  FROM e GROUP BY 1), "
            "tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM bc), "
            "delta AS (SELECT b, CAST(floor(("
            f"  ln((ct + 1) * 1.0 / (tt + {_DSIR_BUCKETS})) "
            f"  - ln((cr + 1) * 1.0 / (tr + {_DSIR_BUCKETS}))) "
            "  * 1000000.0 + 0.5) AS BIGINT) AS dlt FROM bc, tot) "
            "SELECT e.doc_id, CAST(sum(e.tf) AS BIGINT) AS n_tokens, "
            "CAST(sum(e.tf * delta.dlt) AS BIGINT) AS weight_micro "
            "FROM e JOIN delta USING (b) GROUP BY 1 ORDER BY 1"
        ),
        "outlier_events": (
            # exact twin of functions.stats.zscore_outliers_ds: outlier ⇔
            # (n·x − S)² > 9(n·Sxx − S²), spelled n·x > S ± isqrt(·) so
            # every comparison is integer (HUGEINT; isqrt = float sqrt
            # with the ±1 CASE fix). The engine proves the same test via
            # per-group int64 bounds — algebraically identical.
            "WITH b AS (SELECT event_id, event_type, "
            "  CAST(floor(value * 100 + 0.5) AS HUGEINT) AS x FROM events "
            "  WHERE isfinite(value) AND event_type IS NOT NULL), "
            "m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, "
            "  sum(x) AS s, sum(x*x) AS sxx FROM b GROUP BY event_type), "
            "r AS (SELECT event_type, n, s, 9 * (n * sxx - s * s) AS rr FROM m), "
            "i AS (SELECT event_type, n, s, "
            "  CASE WHEN (s0 + 1) * (s0 + 1) <= rr THEN s0 + 1 "
            "       WHEN s0 * s0 > rr THEN s0 - 1 ELSE s0 END AS q "
            "  FROM (SELECT event_type, n, s, rr, "
            "        CAST(floor(sqrt(CAST(rr AS DOUBLE))) AS HUGEINT) AS s0 FROM r)) "
            "SELECT b.event_id, b.event_type, CAST(b.x AS BIGINT) AS cents "
            "FROM b JOIN i USING (event_type) "
            "WHERE b.x * i.n > i.s + i.q OR b.x * i.n < i.s - i.q "
            "ORDER BY b.event_id"
        ),
        "weighted_median_price": (
            # exact twin of quantiles.grouped_weighted_median_ds: pool
            # weights per (flag, price), cumulative weight in price
            # order, wmedian = min price with 2·cum ≥ total
            "WITH b AS (SELECT l_returnflag, l_extendedprice AS v, "
            "  CAST(floor(l_quantity + 0.5) AS BIGINT) AS w FROM lineitem), "
            "c AS (SELECT l_returnflag, v, sum(w) AS wv FROM b "
            "  GROUP BY l_returnflag, v), "
            "s AS (SELECT l_returnflag, v, "
            "  sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
            "  sum(wv) OVER (PARTITION BY l_returnflag) AS tot FROM c) "
            "SELECT l_returnflag, min(v) AS wmedian FROM s "
            "WHERE 2 * cw >= tot GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "hourly_gapfill": (
            # exact twin of windows.gapfill_hourly_counts_ds: dense
            # keys × [min,max] hour grid, absent cells 0; hour = integer
            # epoch-µs floor to the hour (matches the engine's int math)
            "WITH c AS (SELECT event_type, "
            "  (epoch_us(ts) // 3600000000) * 3600000000 AS hu, count(*) AS n "
            "  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL "
            "  GROUP BY 1, 2), "
            "r AS (SELECT min(hu) AS h0, max(hu) AS h1 FROM c), "
            "hours AS (SELECT unnest(range((SELECT h0 FROM r), "
            "  (SELECT h1 FROM r) + 1, 3600000000)) AS hu), "
            # types from ts-valid rows only — the engine derives its key
            # set from the same filtered pass (a key whose every ts is
            # null has no defined cells on either side)
            "types AS (SELECT DISTINCT event_type FROM events "
            "  WHERE event_type IS NOT NULL AND ts IS NOT NULL) "
            "SELECT t.event_type, make_timestamp(h.hu) AS hour, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n "
            "FROM types t CROSS JOIN hours h "
            "LEFT JOIN c ON c.event_type = t.event_type AND c.hu = h.hu "
            "ORDER BY t.event_type, hour"
        ),
        "windowed_dedup": (
            # exact twin of the windowed-dedup composition: first event
            # per (user, type, hour bucket) by (ts, event_id)
            "SELECT event_id, user_id, event_type, "
            "make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour "
            "FROM (SELECT event_id, user_id, event_type, ts, "
            "  row_number() OVER (PARTITION BY user_id, event_type, "
            "    epoch_us(ts) // 3600000000 ORDER BY ts, event_id) AS rn "
            "  FROM events) WHERE rn = 1 ORDER BY event_id"
        ),
        "session_sizes": (
            # exact twin of joins.session_size_hist_ds: 30-min-gap
            # session numbering (strict >, same as the engine's ns test
            # on µs-resolution data), then the length histogram; null
            # users/timestamps excluded (engine contract)
            "WITH f AS (SELECT user_id, ts, event_id FROM events "
            "  WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "s AS (SELECT user_id, ts, event_id, "
            "  CASE WHEN lag(ts) OVER w IS NULL OR "
            "    date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000 "
            "  THEN 1 ELSE 0 END AS new_s FROM f "
            "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "t AS (SELECT user_id, sum(new_s) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s), "
            "sz AS (SELECT count(*) AS session_len FROM t GROUP BY user_id, sid) "
            "SELECT CAST(session_len AS BIGINT) AS session_len, "
            "count(*) AS n_sessions FROM sz GROUP BY 1 ORDER BY 1"
        ),
        "dup_components": _cc_labels_sql(
            _NGRAM_EDGES_CTE, "documents", "doc_id"
        ),
        "cluster_split": _cluster_split_sql(),
        "source_quality": _source_quality_sql(),
        "hourly_anomalies": (
            # dense grid (the hourly_gapfill CTEs) → per-type n/S/Sxx over
            # INTEGER counts → the outlier_events sqrt-bracket inequality
            "WITH c AS (SELECT event_type, "
            "  (epoch_us(ts) // 3600000000) * 3600000000 AS hu, "
            "  count(*) AS n FROM events WHERE event_type IS NOT NULL "
            "  AND ts IS NOT NULL GROUP BY 1, 2), "
            "r AS (SELECT min(hu) AS h0, max(hu) AS h1 FROM c), "
            "hours AS (SELECT unnest(range((SELECT h0 FROM r), "
            "  (SELECT h1 FROM r) + 1, 3600000000)) AS hu), "
            "types AS (SELECT DISTINCT event_type FROM events "
            "  WHERE event_type IS NOT NULL AND ts IS NOT NULL), "
            "dense AS (SELECT t.event_type, h.hu, "
            "  CAST(coalesce(c.n, 0) AS HUGEINT) AS x "
            "  FROM types t CROSS JOIN hours h "
            "  LEFT JOIN c ON c.event_type = t.event_type AND c.hu = h.hu), "
            "m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, "
            "  sum(x) AS s, sum(x*x) AS sxx FROM dense GROUP BY 1), "
            "rr AS (SELECT event_type, n, s, 9 * (n * sxx - s * s) AS rr "
            "  FROM m), "
            "i AS (SELECT event_type, n, s, "
            "  CASE WHEN (s0 + 1) * (s0 + 1) <= rr THEN s0 + 1 "
            "       WHEN s0 * s0 > rr THEN s0 - 1 ELSE s0 END AS q "
            "  FROM (SELECT event_type, n, s, rr, "
            "    CASE WHEN rr > 0 THEN CAST(floor(sqrt(CAST(rr AS DOUBLE)))"
            "      AS HUGEINT) ELSE 0 END AS s0 FROM rr)) "
            "SELECT d.event_type, make_timestamp(d.hu) AS hour, "
            "CAST(d.x AS BIGINT) AS n_events "
            "FROM dense d JOIN i USING (event_type) "
            "WHERE d.x * i.n > i.s + i.q OR d.x * i.n < i.s - i.q "
            "ORDER BY d.event_type, hour"
        ),
        "source_dup_rate": (
            # shared closure labeling → cluster sizes → source rollup;
            # dup = component size > 1
            "WITH lbl AS ("
            + _cc_labels_sql(_NGRAM_EDGES_CTE, "documents", "doc_id")
            + "), "
            "sz AS (SELECT component, count(*) AS csize FROM lbl "
            "  GROUP BY 1), "
            "per AS (SELECT coalesce(d.source, '<none>') AS source, "
            "  CASE WHEN sz.csize > 1 THEN 1 ELSE 0 END AS dup "
            "  FROM documents d JOIN lbl ON lbl.doc_id = d.doc_id "
            "  JOIN sz ON sz.component = lbl.component) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(dup) AS BIGINT) AS n_dup, "
            "CAST(sum(dup) * 1000000 // count(*) AS BIGINT) "
            "  AS dup_rate_micro "
            "FROM per GROUP BY 1 ORDER BY 1"
        ),
        "argmax_events": (
            "SELECT user_id, event_type, event_id, value FROM ("
            "  SELECT user_id, event_type, event_id, value, "
            "    row_number() OVER (PARTITION BY user_id, event_type "
            "      ORDER BY value DESC, event_id) AS rn FROM events"
            ") WHERE rn = 1 ORDER BY user_id, event_type"
        ),
        "triangle_count": (
            f"{_triangle_ctes()}\n"
            "SELECT count(*) AS n_triangles FROM tri"
        ),
        "clustering_coeff": (
            # global coefficient = 3·triangles / Σ d(d−1)/2, floor micro
            # units; every input to the division is an exact integer
            f"{_triangle_ctes()},\n"
            "t AS (SELECT count(*) AS n_triangles FROM tri),\n"
            "w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) "
            "AS n_wedges FROM degt)\n"
            "SELECT t.n_triangles, w.n_wedges, "
            "CAST(CASE WHEN w.n_wedges > 0 THEN "
            "(3 * t.n_triangles * 1000000) // w.n_wedges "
            "ELSE 0 END AS BIGINT) AS coeff_micro FROM t, w"
        ),
        "audience_overlap": (
            # exact |A∩B| / |A∪B| over distinct-user sets per event-type
            # pair; only pairs with ≥1 common user appear (inner join
            # semantics, mirrored by the engine's intersection partials)
            "WITH ud AS (SELECT DISTINCT event_type, user_id FROM events "
            "  WHERE event_type IS NOT NULL AND user_id IS NOT NULL), "
            "sz AS (SELECT event_type, count(*) AS n FROM ud GROUP BY 1), "
            "inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,"
            " count(*) AS c FROM ud a JOIN ud b ON a.user_id = b.user_id "
            " AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT type_a, type_b, CAST(c AS BIGINT) AS n_common, "
            "CAST(sa.n + sb.n - c AS BIGINT) AS n_union, "
            "CAST((c * 1000000) // (sa.n + sb.n - c) AS BIGINT) "
            "AS jaccard_micro "
            "FROM inter JOIN sz sa ON sa.event_type = type_a "
            "JOIN sz sb ON sb.event_type = type_b ORDER BY type_a, type_b"
        ),
        "retention_cohorts": (
            # cohort = first active day per user; cells count distinct
            # active users; all day math is integer epoch-µs floor-div
            "WITH ud AS (SELECT DISTINCT user_id, "
            "  (epoch_us(ts) // 86400000000) * 86400000000 AS day_us "
            "  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), "
            "co AS (SELECT user_id, min(day_us) AS cohort_us "
            "       FROM ud GROUP BY user_id) "
            "SELECT make_timestamp(co.cohort_us) AS cohort, "
            "(ud.day_us - co.cohort_us) // 86400000000 AS age_days, "
            "count(DISTINCT ud.user_id) AS n_users "
            "FROM ud JOIN co USING (user_id) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "lexicon_tags": _lexicon_tags_sql(),
        "perplexity_buckets": (
            # unigram_nll's integer micro-nat contract extended to the
            # CCNet bucket kernel: ppl_milli by BIGINT floor division,
            # per-lang thresholds = values at 0-indexed ranks
            # (b·(n−1))//3 (integer rank arithmetic — value at a rank
            # is tie-order-independent), ties at a threshold fall to
            # the LOWER bucket on both engines
            f"WITH tf AS ({_TF}), "
            "tot AS (SELECT term, sum(tf) AS tfg FROM tf GROUP BY term), "
            "t AS (SELECT sum(tfg) AS s FROM tot), "
            "cost AS (SELECT term, CAST(floor(-ln(tfg * 1.0 / t.s) "
            "         * 1000000.0 + 0.5) AS BIGINT) AS c FROM tot, t), "
            "nll AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
            "        CAST(sum(tf.tf * cost.c) AS BIGINT) AS nll_micro "
            "        FROM tf JOIN cost USING (term) GROUP BY tf.doc_id), "
            "p AS (SELECT nll.doc_id, d.lang, n_tokens, "
            "      CAST((nll_micro * 1000) // n_tokens AS BIGINT) AS ppl_milli "
            "      FROM nll JOIN documents d USING (doc_id)), "
            "r AS (SELECT lang, ppl_milli, "
            "      row_number() OVER (PARTITION BY lang "
            "        ORDER BY ppl_milli, doc_id) AS rn, "
            "      count(*) OVER (PARTITION BY lang) AS n FROM p), "
            "th AS (SELECT lang, "
            "       max(CASE WHEN rn - 1 = (1 * (n - 1)) // 3 "
            "           THEN ppl_milli END) AS t1, "
            "       max(CASE WHEN rn - 1 = (2 * (n - 1)) // 3 "
            "           THEN ppl_milli END) AS t2 "
            "       FROM r GROUP BY lang) "
            "SELECT p.doc_id, p.lang, p.n_tokens, p.ppl_milli, "
            "       CAST(CASE WHEN p.ppl_milli <= th.t1 THEN 0 "
            "                 WHEN p.ppl_milli <= th.t2 THEN 1 "
            "                 ELSE 2 END AS BIGINT) AS bucket "
            "FROM p JOIN th USING (lang) ORDER BY p.doc_id"
        ),
        "cms_term_counts": _cms_sql(),
        "containment_pairs": _containment_sql(),
        "semdedup": _semdedup_sql(),
        "vocab_growth": f"""
WITH toks AS ({_TOKS}),
bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
firsts AS (SELECT term, min(doc_id) AS md FROM toks GROUP BY term),
buckets AS (
  SELECT CAST(g.i AS BIGINT) AS bucket,
         lo + ((hi - lo + 1) * g.i + {_VOCAB_GROWTH_BUCKETS} - 1)
              // {_VOCAB_GROWTH_BUCKETS} AS doc_id_lt
  FROM generate_series(1, {_VOCAB_GROWTH_BUCKETS}) AS g(i), bounds
)
SELECT b.bucket, b.doc_id_lt, count(f.term) AS vocab_size
FROM buckets b LEFT JOIN firsts f ON f.md < b.doc_id_lt
GROUP BY 1, 2 ORDER BY 1
""",
        "spell_suggest": f"""
WITH toks AS ({_TOKS}),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
q AS (SELECT unnest([{", ".join(f"'{t}'" for t in sorted(_SPELL_TERMS))}]) AS qterm),
cand AS (SELECT q.qterm, df.term, df.df
         FROM q JOIN df ON levenshtein(q.qterm, df.term) <= 1),
ranked AS (SELECT qterm, term, df,
                  row_number() OVER (PARTITION BY qterm
                                     ORDER BY df DESC, term) AS rn
           FROM cand)
SELECT qterm, term, df, rn FROM ranked WHERE rn <= {_SPELL_K}
ORDER BY qterm, rn
""",
        "crawl_diff": f"""
WITH b_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text || ' new' AS text
  FROM documents WHERE doc_id % 13 = 0
),
fa AS (SELECT * FROM {_fp_rel('documents')}),
fb AS (SELECT * FROM {_fp_rel('b_docs')})
SELECT coalesce(fa.doc_id, fb.doc_id) AS doc_id,
       CASE WHEN fb.doc_id IS NULL THEN 'removed'
            WHEN fa.doc_id IS NULL THEN 'added'
            WHEN fa.fp64 = fb.fp64 THEN 'same'
            ELSE 'changed' END AS status
FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id
ORDER BY 1
""",
        "dedup_recall": f"""
WITH {_minhash_band_body()},
{_ngram_edges_body('documents')},
hit AS (SELECT a, b FROM cand INTERSECT SELECT a, b FROM edges),
m AS (SELECT (SELECT count(*) FROM edges) AS n_true,
             (SELECT count(*) FROM cand) AS n_cand,
             (SELECT count(*) FROM hit) AS n_hit)
SELECT n_true, n_cand, n_hit,
       CAST(CASE WHEN n_true = 0 THEN 1000000
                 ELSE n_hit * 1000000 // n_true END AS BIGINT)
         AS recall_micro,
       CAST(CASE WHEN n_cand = 0 THEN 1000000
                 ELSE n_hit * 1000000 // n_cand END AS BIGINT)
         AS precision_micro
FROM m
""",
        "bm25f_topk": f"""
WITH otoks AS ({_ORDERED_TOKS}),
base AS (
  SELECT doc_id, term, count(*) AS tf,
         sum(CASE WHEN pos <= 5 THEN 1 ELSE 0 END) AS tft
  FROM otoks GROUP BY 1, 2
),
wdl AS (
  SELECT doc_id,
         count(*) + 2 * sum(CASE WHEN pos <= 5 THEN 1 ELSE 0 END) AS dlw
  FROM otoks GROUP BY 1
),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
          sum(dlw) / (SELECT count(*) FROM documents) AS avgdl FROM wdl),
qt AS (SELECT DISTINCT lower(u.t) AS term
       FROM UNNEST(string_split_regex(lower('{BM25_QUERY}'),
                                      '[^a-z0-9]+')) AS u(t)
       WHERE u.t <> ''),
df AS (SELECT b.term, count(*) AS df FROM base b JOIN qt USING (term)
       GROUP BY 1),
scores AS (
  SELECT b.doc_id,
         sum(ln(1.0 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
             * (b.tf + 2*b.tft)*({K1}+1.0)
             / ((b.tf + 2*b.tft)
                + {K1}*(1.0-{B}+{B}*w.dlw/s.avgdl))) AS score
  FROM base b JOIN df ON b.term = df.term
       JOIN wdl w ON b.doc_id = w.doc_id
       CROSS JOIN stats s
  GROUP BY b.doc_id
)
SELECT doc_id, round(score, 4) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10
""",
        "bm25_fuzzy_topk": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
          sum(dl) / (SELECT count(*) FROM documents) AS avgdl FROM dl),
df AS (
  SELECT term, df FROM (
    SELECT tf.term, count(*) AS df FROM tf
    WHERE levenshtein(tf.term, '{_FUZZY_QUERY}') <= 1 GROUP BY tf.term
    ORDER BY df DESC, term LIMIT {_FUZZY_MAX_EXP}
  )
),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
             * tf.tf*({K1}+1.0)/(tf.tf + {K1}*(1.0-{B}+{B}*dl.dl/s.avgdl))) AS score
  FROM tf JOIN df ON tf.term = df.term
       JOIN dl ON tf.doc_id = dl.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10
""",
        "index_profile": f"""
WITH toks AS ({_TOKS}),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT CAST(floor(log2(df)) AS BIGINT) AS df_bucket,
       count(*) AS n_terms,
       CAST(sum(df) AS BIGINT) AS n_postings
FROM df GROUP BY 1 ORDER BY 1
""",
        "kn_bigram_lm": """
WITH big AS (
  SELECT toks[i] AS w1, toks[i+1] AS w2, count(*) AS n2
  FROM (SELECT list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> t <> '') AS toks FROM documents),
       UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
  GROUP BY 1, 2
),
c1 AS (SELECT w1, sum(n2) AS c1, count(*) AS n1p FROM big GROUP BY w1),
cm AS (SELECT w2, count(*) AS n1m FROM big GROUP BY w2),
nt AS (SELECT count(*) AS nt FROM big),
sel AS (SELECT w1, w2, n2 FROM big WHERE n2 >= 5
        ORDER BY n2 DESC, w1, w2 LIMIT 20)
SELECT s.w1, s.w2, CAST(s.n2 AS BIGINT) AS n,
       CAST((1000000 * (greatest(4*s.n2 - 3, 0) * nt.nt
                        + 3 * c.n1p * m.n1m))
            // (4 * c.c1 * nt.nt) AS BIGINT) AS pkn_micro
FROM sel s JOIN c1 c ON c.w1 = s.w1 JOIN cm m ON m.w2 = s.w2 CROSS JOIN nt
ORDER BY n DESC, s.w1, s.w2
""",
        "url_filter": """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/'
           || CAST(doc_id AS VARCHAR) AS url,
         source || '.example.com' AS host
  FROM documents
)
SELECT doc_id, url, host,
       CASE WHEN host IN ('src3.example.com', 'src7.example.com')
              THEN 'blocked_host'
            WHEN host LIKE '%9.example.com' THEN 'blocked_suffix'
            WHEN regexp_matches(url, '/e[sn]/[0-9]*7$')
              THEN 'blocked_pattern'
            ELSE 'keep' END AS verdict
FROM u ORDER BY doc_id
""",
        "bm25_collapse_topk": f"""{_bm25_body(BM25_QUERY)},
{_ngram_edges_body('documents')},
sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.src, s.b FROM r JOIN sym s ON r.dst = s.a
  ) SELECT src, dst FROM r
),
lbl AS (SELECT src, least(src, min(dst)) AS comp FROM reach GROUP BY src),
pool AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY score DESC, doc_id LIMIT 30),
lab AS (SELECT p.doc_id, p.score,
               CAST(coalesce(l.comp, p.doc_id) AS BIGINT) AS component
        FROM pool p LEFT JOIN lbl l ON l.src = p.doc_id),
best AS (SELECT doc_id, score,
                row_number() OVER (PARTITION BY component
                                   ORDER BY score DESC, doc_id) AS rn
         FROM lab)
SELECT doc_id, score FROM best WHERE rn = 1
ORDER BY score DESC, doc_id LIMIT 10
""",
        "regex_rank": f"""
SELECT doc_id,
       CAST(1 + len(regexp_extract_all(text, '{_REGEX_RANK_PAT}'))
            AS BIGINT) AS score
FROM documents ORDER BY score DESC, doc_id LIMIT 20
""",
        "related_terms": f"""
WITH big AS (
  SELECT toks[i] AS w1, toks[i+1] AS w2, count(*) AS n
  FROM (SELECT list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> t <> '') AS toks FROM documents),
       UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
  GROUP BY 1, 2
)
SELECT w2, CAST(n AS BIGINT) AS n FROM big WHERE w1 = '{MORE_TERM}'
ORDER BY n DESC, w2 LIMIT 5
""",
        "complete_prefix": f"""
WITH toks AS ({_TOKS}),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT term, df FROM df WHERE term LIKE '{_COMPLETE_PREFIX}%'
ORDER BY df DESC, term LIMIT 8
""",
        "int8_ann": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v,
             (SELECT max(abs(t.u)) FROM unnest(v) AS t(u)) AS scale
      FROM e),
dq AS (SELECT vec_id,
              CASE WHEN scale IS NULL OR scale = 0 THEN v
                   ELSE list_transform(
                     v, x -> floor(x * 127 / scale + 0.5) * scale / 127)
              END AS dv
       FROM s)
SELECT d.vec_id,
       round(list_cosine_similarity(
         d.dv, (SELECT dv FROM dq WHERE vec_id = 0)), 4) AS sim
FROM dq d ORDER BY sim DESC, vec_id LIMIT 10
""",
        "tokenizer_fertility": (
            "WITH c AS (SELECT lang, "
            "  len(regexp_extract_all(text, "
            r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe, "
            r"  len(regexp_extract_all(text, '\S+')) AS ws "
            "FROM documents) "
            "SELECT lang, CAST(sum(bpe) AS BIGINT) AS bpe_tokens, "
            "  CAST(sum(ws) AS BIGINT) AS ws_words, "
            "  CAST(CASE WHEN sum(ws) = 0 THEN 0 "
            "       ELSE (sum(bpe) * 1000000) // sum(ws) END AS BIGINT) "
            "    AS fertility_micro "
            "FROM c GROUP BY lang ORDER BY lang"
        ),
        "percolate": f"""
WITH toks AS (SELECT DISTINCT doc_id, lower(u.t) AS term FROM documents,
  UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE u.t <> ''),
q(query_id, term) AS (VALUES (1, 'merge'), (1, 'sort'), (2, 'hash'), (2, 'join'), (3, 'order'), (3, 'sort'), (3, 'window'), (4, 'spark'), (5, 'absent'), (5, 'zzz')),
need AS (SELECT query_id, count(*) AS n FROM q GROUP BY 1),
hit AS (SELECT t.doc_id, q.query_id, count(*) AS m
        FROM toks t JOIN q ON t.term = q.term GROUP BY 1, 2)
SELECT h.doc_id, CAST(h.query_id AS BIGINT) AS query_id
FROM hit h JOIN need USING (query_id) WHERE h.m = need.n
ORDER BY h.doc_id, h.query_id
""",
        "rfm_segments": """
WITH prof AS (
  SELECT user_id, max(epoch_us(ts)) AS last_ts, count(*) AS freq,
         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
           AS monetary_micro
  FROM events GROUP BY user_id
),
n AS (SELECT count(*) AS n FROM prof),
th AS (
  SELECT
    max(CASE WHEN rr - 1 = (1 * (n.n - 1)) // 3 THEN lv END) AS r1,
    max(CASE WHEN rr - 1 = (2 * (n.n - 1)) // 3 THEN lv END) AS r2,
    max(CASE WHEN rf - 1 = (1 * (n.n - 1)) // 3 THEN fv END) AS f1,
    max(CASE WHEN rf - 1 = (2 * (n.n - 1)) // 3 THEN fv END) AS f2,
    max(CASE WHEN rm - 1 = (1 * (n.n - 1)) // 3 THEN mv END) AS m1,
    max(CASE WHEN rm - 1 = (2 * (n.n - 1)) // 3 THEN mv END) AS m2
  FROM (SELECT last_ts AS lv, freq AS fv, monetary_micro AS mv,
               row_number() OVER (ORDER BY last_ts) AS rr,
               row_number() OVER (ORDER BY freq) AS rf,
               row_number() OVER (ORDER BY monetary_micro) AS rm
        FROM prof), n
  GROUP BY n.n
)
SELECT p.user_id, p.last_ts, p.freq, p.monetary_micro,
       CAST((p.last_ts > th.r1) :: INT + (p.last_ts > th.r2) :: INT
            AS BIGINT) AS r,
       CAST((p.freq > th.f1) :: INT + (p.freq > th.f2) :: INT
            AS BIGINT) AS f,
       CAST((p.monetary_micro > th.m1) :: INT
            + (p.monetary_micro > th.m2) :: INT AS BIGINT) AS m,
       CAST(100 * ((p.last_ts > th.r1) :: INT + (p.last_ts > th.r2) :: INT)
            + 10 * ((p.freq > th.f1) :: INT + (p.freq > th.f2) :: INT)
            + ((p.monetary_micro > th.m1) :: INT
               + (p.monetary_micro > th.m2) :: INT) AS BIGINT) AS rfm
FROM prof p, th ORDER BY p.user_id
""",
        "basket_lift": """
WITH ud AS (SELECT DISTINCT event_type, user_id FROM events
            WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
sz AS (SELECT event_type, count(*) AS n FROM ud GROUP BY 1),
nu AS (SELECT count(DISTINCT user_id) AS nu FROM ud),
inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 count(*) AS c
          FROM ud a JOIN ud b ON a.user_id = b.user_id
           AND a.event_type < b.event_type GROUP BY 1, 2)
SELECT type_a, type_b, CAST(c AS BIGINT) AS n_common,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(nu.nu AS BIGINT) AS n_users,
       CAST((c * nu.nu * 1000000) // (sa.n * sb.n) AS BIGINT)
         AS lift_micro
FROM inter JOIN sz sa ON sa.event_type = type_a
     JOIN sz sb ON sb.event_type = type_b CROSS JOIN nu
ORDER BY type_a, type_b
""",
        "bm25_multi": _bm25_multi_sql(),
        "bm25_engine": _bm25_multi_sql(),
        "vocab_growth_by_lang": f"""
WITH toks AS (
  SELECT lang, doc_id, lower(u.t) AS term FROM documents,
    UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE u.t <> ''
),
bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
firsts AS (SELECT lang, term, min(doc_id) AS md FROM toks GROUP BY 1, 2),
buckets AS (
  SELECT CAST(g.i AS BIGINT) AS bucket,
         lo + ((hi - lo + 1) * g.i + {_VOCAB_GROWTH_BUCKETS} - 1)
              // {_VOCAB_GROWTH_BUCKETS} AS doc_id_lt
  FROM generate_series(1, {_VOCAB_GROWTH_BUCKETS}) AS g(i), bounds
),
langs AS (SELECT DISTINCT lang FROM documents),
cells AS (SELECT l.lang, b.bucket, b.doc_id_lt FROM langs l, buckets b)
SELECT c.lang, c.bucket, c.doc_id_lt, count(f.term) AS vocab_size
FROM cells c LEFT JOIN firsts f
  ON f.lang = c.lang AND f.md < c.doc_id_lt
GROUP BY 1, 2, 3 ORDER BY 1, 2
""",
    }
