"""Deduplication operators.

Exact dedup generalizes the reference's path-canonicalization dedup key
(cli.rs:454: ``canonicalize()`` collapses ``./x`` vs ``x``) to
hash-partition + per-group-first over arbitrary keys (SURVEY.md §2.9).

Scale design: the shuffle key for content dedup is a 64-bit hash of the
content, not the content itself — only (hash, id) pairs move in the
all-to-all; survivors are selected per group and the surviving rows are
recovered with a broadcast-semi-join filter (no second shuffle of the
payload).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from lsearch_ray.corpus import fnv1a64


def exact_dedup(ds, key_cols: list[str], order_cols: list[str]):
    """Keep the first row per key group, ordered by ``order_cols``.

    groupby(key) is a hash shuffle; each group is tiny (the duplicates of
    one key), so ``map_groups`` per-group pandas cost is bounded.
    """

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_cols, kind="mergesort").head(1)

    return ds.groupby(key_cols).map_groups(first, batch_format="pandas")


def exact_dedup_by_content(ds, content_col: str, id_col: str):
    """Exact content dedup at scale: hash the content per batch, shuffle
    only (hash, id), keep the min-id row per hash, then recover surviving
    rows with a broadcast id-set semi-join.

    Returns a Dataset with the same schema as ``ds`` (plus no extra
    columns), containing one row per distinct content, the one with the
    smallest ``id_col``.

    Note: the survivor id set is collected to the driver and broadcast —
    appropriate while ``n_distinct × 8B`` fits driver memory (hundreds of
    millions of rows); beyond that, swap the semi-join for a shuffle join
    on the hash column.
    """
    from ray.data.aggregate import Min

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
    keep = {r["keep_id"] for r in survivors.take_all()}
    keep_arr = pa.array(sorted(keep), type=pa.int64())

    def filter_survivors(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.is_in(b[id_col], value_set=keep_arr))

    return ds.map_batches(filter_survivors, batch_format="pyarrow")
