"""Shared machinery for candidate-pair dedup pipelines (MinHash / SimHash /
n-gram Jaccard / embedding LSH): bucket → pairs, pair dedupe, distributed
pair-payload joins, survivor filtering.

Scale contract: nothing pair- or candidate-shaped is materialized on the
driver. Pair payloads (signatures, shingle sets, vectors) travel through
hash joins as fixed/variable-width binary blobs (Acero rejects list
payload columns); verification kernels run vectorized inside map tasks;
survivor selection goes through distributed connected components
(functions/components.py) and the drop set is applied either as a
broadcast filter (small) or a distributed anti-join (large).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _concat_aranges(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated, vectorized."""
    total = int(lens.sum())
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64), lens
    )
    return out


def _emit_pairs_sorted(
    ids: np.ndarray, run_starts: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs (a<b) for every bucket run of a sorted id array.

    ``run_starts`` are bucket boundaries (length R+1, first 0, last n);
    ids are ascending within each run. Runs ≤ ``cap`` emit all
    ``triu`` pairs; over-``cap`` runs (boilerplate explosions) chain
    members to the run minimum instead of O(n²) pairs — connected
    components still connect the whole cluster. Fully vectorized: the
    only Python loop is over DISTINCT run lengths (≤ cap of them)."""
    L = np.diff(run_starts)
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    big = np.flatnonzero(L > cap)
    if len(big):
        lens = (L[big] - 1).astype(np.int64)
        b_idx = np.repeat(run_starts[big] + 1, lens) + _concat_aranges(lens)
        a_parts.append(np.repeat(ids[run_starts[big]], lens))
        b_parts.append(ids[b_idx])
    full = np.flatnonzero((L >= 2) & (L <= cap))
    if len(full):
        fl = L[full]
        for Lv in np.unique(fl):
            runs = run_starts[full[fl == Lv]]
            ia, ib = np.triu_indices(int(Lv), k=1)
            a_parts.append(ids[(runs[:, None] + ia[None, :]).ravel()])
            b_parts.append(ids[(runs[:, None] + ib[None, :]).ravel()])
    if a_parts:
        return np.concatenate(a_parts), np.concatenate(b_parts)
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)


def bucket_pairs_ds(
    bucket_rows_ds,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    *,
    cap: int = 64,
    num_partitions: int = 32,
):
    """(bucket..., id) rows → candidate (a, b) pairs, partition-level
    vectorized.

    Replaces per-bucket ``groupby(bucket).map_groups``: LSH buckets are
    millions of mostly-singleton groups, so per-group Python is one
    interpreter round-trip per bucket. Instead rows are hash-partitioned
    on the bucket key (ONE groupby shuffle on ``__part`` — complete
    buckets land in one partition), then each partition does a single
    mergesort by (bucket..., id) and one vectorized
    :func:`_emit_pairs_sorted` pass over the bucket runs. Size
    ``num_partitions`` ≈ cluster cores × 4 at scale."""
    from lsearch_ray.functions.dedup import arrow_out, partition_ids

    def add_part(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in (*bucket_cols, id_col)}
        cols["__part"] = pa.array(
            partition_ids(b, list(bucket_cols), num_partitions)
        )
        return pa.table(cols)

    def pairs_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([*bucket_cols, id_col], kind="mergesort")
        n = len(g)
        if n < 2:
            return arrow_out(
                pd.DataFrame(
                    {
                        "a": pd.Series([], dtype=np.int64),
                        "b": pd.Series([], dtype=np.int64),
                    }
                )
            )
        ids = g[id_col].to_numpy().astype(np.int64)
        change = np.zeros(n - 1, dtype=bool)
        for c in bucket_cols:
            v = g[c].to_numpy()
            change |= v[1:] != v[:-1]
        run_starts = np.concatenate(
            ([0], np.flatnonzero(change) + 1, [n])
        ).astype(np.int64)
        a, b = _emit_pairs_sorted(ids, run_starts, cap)
        return arrow_out(pd.DataFrame({"a": a, "b": b}))

    return (
        bucket_rows_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pandas")
    )


def unique_pairs(pairs_ds):
    """Dedupe (a, b) pairs produced by multiple buckets/bands.

    Expressed as a vectorized groupby-count (sort-based shuffle + Arrow
    aggregation) rather than per-group ``map_groups`` — same result, no
    per-group Python."""
    from ray.data.aggregate import Count

    agg = pairs_ds.groupby(["a", "b"]).aggregate(Count(alias_name="__c"))
    return agg.map_batches(
        lambda b: b.select(["a", "b"]), batch_format="pyarrow"
    )


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def drop_ids_from_pairs(pairs_a: np.ndarray, pairs_b: np.ndarray) -> list[int]:
    """Union-find the verified pairs; everything except each cluster's
    minimum id is dropped. (Driver-side reference used by tests; the
    pipelines use the distributed components path.)"""
    uf = UnionFind()
    for a, b in zip(pairs_a, pairs_b):
        uf.union(int(a), int(b))
    return sorted(x for x in uf.parent if uf.find(x) != x)


def filter_out_ids(ds, drop: list[int], id_col: str = "doc_id"):
    """Broadcast anti-semi-join: remove rows whose id is in ``drop``."""
    if not drop:
        return ds
    drop_arr = pa.array(sorted(drop), type=pa.int64())
    return ds.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t[id_col], value_set=drop_arr))
        ),
        batch_format="pyarrow",
    )


def gather_rows_for_ids(ds, ids: np.ndarray, id_col: str = "doc_id"):
    """Broadcast semi-join: the subset of ``ds`` whose id is in ``ids``."""
    id_arr = pa.array(np.unique(ids), type=pa.int64())
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=id_arr)),
        batch_format="pyarrow",
    )


# ------------------------------------------------ blob payload transport ----
# Acero hash joins reject list-typed payload columns, so list payloads are
# carried through joins as large_binary blobs of raw little-endian values.


def list_to_blob(col, dtype=np.int64) -> pa.Array:
    """list<numeric> column → large_binary of the raw values per row."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(col.flatten(), dtype=dtype)
    itemsize = np.dtype(dtype).itemsize
    offs = np.concatenate(([0], np.cumsum(lengths))) * itemsize
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offs), pa.py_buffer(np.ascontiguousarray(flat).tobytes())],
    )


def blob_lists(col, dtype=np.int64) -> tuple[np.ndarray, np.ndarray]:
    """large_binary column → (element offsets, flat value array).

    Row i's values are ``flat[offsets[i]:offsets[i+1]]``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    itemsize = np.dtype(dtype).itemsize
    if n == 0:
        return np.zeros(1, dtype=np.int64), np.empty(0, dtype=dtype)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + n + 1
    ]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    flat = np.frombuffer(
        data[int(offs[0]) : int(offs[-1])].tobytes(), dtype=dtype
    )
    return (offs - offs[0]) // itemsize, flat


def fixed_blob_matrix(col, dtype=np.int64) -> np.ndarray:
    """large_binary column of equal-width rows → (n, width) matrix."""
    offs, flat = blob_lists(col, dtype)
    n = len(offs) - 1
    if n == 0 or len(flat) == 0:
        return np.empty((n, 0), dtype=dtype)
    width = int(offs[1] - offs[0])
    return flat.reshape(n, width)


def attach_pair_payloads(
    pairs_ds, payload_ds, id_col: str, *, num_partitions: int = 8
):
    """Hash-join each side of an (a, b) pair Dataset to its payload row.

    ``payload_ds`` holds (id_col, <payload cols>); the result carries every
    payload column twice, suffixed ``_a`` and ``_b``. Both joins are
    distributed hash joins — nothing touches the driver."""
    from lsearch_ray.functions.joins import hash_join

    payload_cols = [c for c in payload_ds.schema().names if c != id_col]

    def renamer(side: str):
        def rename(b: pa.Table) -> pa.Table:
            cols = {f"__j{side}": b[id_col]}
            for c in payload_cols:
                cols[f"{c}_{side}"] = b[c]
            return pa.table(cols)

        return rename

    side_a = payload_ds.map_batches(renamer("a"), batch_format="pyarrow")
    side_b = payload_ds.map_batches(renamer("b"), batch_format="pyarrow")
    joined = hash_join(
        pairs_ds, side_a, on="a", right_on="__ja", num_partitions=num_partitions
    )
    return hash_join(
        joined, side_b, on="b", right_on="__jb", num_partitions=num_partitions
    )


# ------------------------------------------------- survivor application ----


def filter_out_ids_ds(
    ds,
    drop_ds,
    id_col: str = "doc_id",
    *,
    drop_col: str = "node",
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 8,
):
    """Remove rows of ``ds`` whose id appears in ``drop_ds``.

    Small drop sets broadcast (one filter pass, no shuffle of the
    payload); above ``broadcast_limit`` the drop set would OOM the driver,
    so it becomes a distributed anti-join (left-outer hash join on the id
    + null-marker filter)."""
    drop_ds = drop_ds.materialize()
    n = drop_ds.count()
    if n == 0:
        return ds
    if n <= broadcast_limit:
        ids = drop_ds.to_pandas()[drop_col].to_numpy()
        return filter_out_ids(ds, sorted(int(x) for x in ids), id_col)
    marked = drop_ds.map_batches(
        lambda b: pa.table(
            {
                "__drop_id": b[drop_col],
                "__dropm": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    joined = ds.join(
        marked,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("__drop_id",),
    )
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b["__dropm"])).drop_columns(["__dropm"]),
        batch_format="pyarrow",
    )


def semi_join_ids_ds(
    ds,
    keep_ds,
    id_col: str = "doc_id",
    *,
    keep_col: str = "node",
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 8,
):
    """Keep only rows of ``ds`` whose id appears in ``keep_ds`` (ids unique).

    Broadcast semi-join below ``broadcast_limit``; distributed inner hash
    join above it."""
    keep_ds = keep_ds.materialize()
    n = keep_ds.count()
    if n == 0:
        return ds.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")
    if n <= broadcast_limit:
        ids = keep_ds.to_pandas()[keep_col].to_numpy()
        return gather_rows_for_ids(ds, np.asarray(ids, dtype=np.int64), id_col)
    keyed = keep_ds.map_batches(
        lambda b: pa.table({"__keep_id": b[keep_col]}), batch_format="pyarrow"
    )
    joined = ds.join(
        keyed,
        join_type="inner",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("__keep_id",),
    )
    return joined


def apply_verified_pairs(
    ds,
    verified_pairs_ds,
    id_col: str,
    *,
    num_partitions: int = 2,
    broadcast_limit: int = 2_000_000,
):
    """Verified (a, b) near-dup pairs → survivors of ``ds``.

    Distributed end-to-end: min-label-propagation connected components
    over the pair graph (functions/components.py), then the drop set is
    applied via :func:`filter_out_ids_ds`."""
    from lsearch_ray.functions.components import drop_ids_from_pairs_ds

    verified_pairs_ds = verified_pairs_ds.materialize()
    if verified_pairs_ds.count() == 0:
        return ds
    drop = drop_ids_from_pairs_ds(
        verified_pairs_ds, num_partitions=num_partitions
    )
    return filter_out_ids_ds(
        ds,
        drop,
        id_col,
        broadcast_limit=broadcast_limit,
        num_partitions=num_partitions,
    )
