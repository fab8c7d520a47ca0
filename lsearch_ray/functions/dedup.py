"""Deduplication operators.

Exact dedup generalizes the reference's path-canonicalization dedup key
(cli.rs:454: ``canonicalize()`` collapses ``./x`` vs ``x``) to
hash-partition + first-per-key over arbitrary keys (SURVEY.md §2.9).

Scale design: the shuffle key for content dedup is a 64-bit hash of the
content, not the content itself — only (hash, id) pairs move in the
all-to-all; survivors are selected per group and the surviving rows are
recovered with a broadcast semi-join when the survivor set is small, or a
distributed inner hash join when it would not fit the driver
(cluster.semi_join_ids_ds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.corpus import fnv1a64


def arrow_out(df: pd.DataFrame) -> pa.Table:
    """pandas stage output → metadata-free Arrow block.

    Returning a raw DataFrame stores a pandas block that Ray converts
    with ``pa.Table.from_pandas`` at the next shuffle boundary — whose
    ``b'pandas'`` SCHEMA-level metadata makes ``hash(pa.Schema)`` raise
    ``unhashable type: 'dict'``, so every downstream sort/concat reduce
    logs ``Failed to hash the schemas (for deduplication)`` and loses
    the fast schema-dedup path. Converting here with the metadata
    stripped is the same conversion Ray would do, minus the poison.
    Every ``map_groups(..., batch_format="pandas")`` stage returns
    through this."""
    return pa.Table.from_pandas(
        df, preserve_index=False
    ).replace_schema_metadata(None)


def _col_hash64(col) -> np.ndarray:
    """uint64 hash of an arbitrary Arrow column (strings hashed directly,
    numerics mixed by multiplication)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            return v * np.uint64(0x9E3779B97F4A7C15)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return fnv1a64(col).astype(np.uint64)
    return fnv1a64(pc.cast(col, pa.string())).astype(np.uint64)


def value_counts_table(col, key_name: str, count_name: str = "c") -> pa.Table:
    """(key, int64 count) table of a column's value counts — THE shared
    map-side combine-before-shuffle partial (term_df, skew_join hot-key
    detection, grouped distinct counts), one definition so null/offset
    handling lands everywhere at once. Nulls form their own group (SQL
    GROUP BY semantics)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vc = col.value_counts()
    return pa.table(
        {
            key_name: vc.field("values"),
            count_name: vc.field("counts").cast(pa.int64()),
        }
    )


def partition_ids(batch: pa.Table, key_cols: list[str], num_partitions: int) -> np.ndarray:
    """FNV-fold hash-partition id per row over ``key_cols`` — THE shared
    partitioning arithmetic for every hash-partition-then-vectorize
    operator (exact_dedup, sessionize, bucket_pairs_ds). One definition
    so a change to the mixing lands everywhere at once."""
    mult = np.uint64(0x100000001B3)
    h = np.full(batch.num_rows, 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            h = (h ^ _col_hash64(batch[c])) * mult
    return (h % np.uint64(num_partitions)).astype(np.int64)


def exact_dedup(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    *,
    num_partitions: int = 64,
    ascending: list[bool] | None = None,
):
    """Keep the first row per key group, ordered by ``order_cols``
    (per-column direction via ``ascending`` — all-ascending by default;
    descending on a value column turns this into argmax-per-group).

    Vectorized form of groupby(key)+first: rows are hash-partitioned on
    the key columns, the groupby runs over the partition id (so each
    reduce task receives one whole hash partition — the same reducer
    memory shape as any Ray groupby), and within a partition one pandas
    ``sort_values`` + ``drop_duplicates`` selects every key's first row —
    no per-group Python. Size ``num_partitions`` ≈ cluster cores × 4 at
    scale so a partition fits a worker's heap.
    """
    asc = [True] * len(order_cols) if ascending is None else list(ascending)
    if len(asc) != len(order_cols):
        raise ValueError("ascending must match order_cols length")

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__part", pa.array(partition_ids(b, key_cols, num_partitions))
        )

    def dedup_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_cols, ascending=asc, kind="mergesort")
        return arrow_out(
            g.drop_duplicates(subset=key_cols, keep="first").drop(
                columns="__part"
            )
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedup_partition, batch_format="pandas")
    )


def exact_dedup_by_content(
    ds,
    content_col: str,
    id_col: str,
    *,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 8,
):
    """Exact content dedup at scale: hash the content per batch, shuffle
    only (hash, id), keep the min-id row per hash, then recover surviving
    rows — broadcast id-set semi-join while the survivor set fits the
    driver (``broadcast_limit``), distributed inner hash join beyond that.

    Returns a Dataset with the same schema as ``ds``, containing one row
    per distinct content, the one with the smallest ``id_col``.
    """
    from ray.data.aggregate import Min

    from lsearch_ray.functions.cluster import semi_join_ids_ds

    def add_hash(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "content_hash": pa.array(fnv1a64(b[content_col]), type=pa.int64()),
                id_col: b[id_col],
            }
        )

    survivors = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keep_id"))
    )
    return semi_join_ids_ds(
        ds,
        survivors,
        id_col,
        keep_col="keep_id",
        broadcast_limit=broadcast_limit,
        num_partitions=num_partitions,
    )
