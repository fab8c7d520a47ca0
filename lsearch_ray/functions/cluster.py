"""Shared machinery for candidate-pair dedup pipelines (MinHash / SimHash /
embedding LSH): bucket → pairs, pair dedupe, union-find components,
survivor filtering."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bucket_pairs_fn(id_col: str = "doc_id", cap: int = 64):
    """Returns a ``map_groups`` fn emitting candidate pairs (a<b) within a
    bucket. Over-``cap`` buckets (boilerplate explosions) chain members to
    the bucket minimum instead of emitting O(n²) pairs — union-find still
    connects the whole cluster."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        if len(ids) > cap:
            return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0]), "b": ids[1:]})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ia], "b": ids[ib]})

    return pairs


def unique_pairs(pairs_ds):
    """Dedupe (a, b) pairs produced by multiple buckets/bands."""
    return pairs_ds.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
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
    minimum id is dropped."""
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
            pa.compute.invert(pa.compute.is_in(t[id_col], value_set=drop_arr))
        ),
        batch_format="pyarrow",
    )


def gather_rows_for_ids(ds, ids: np.ndarray, id_col: str = "doc_id"):
    """Broadcast semi-join: the subset of ``ds`` whose id is in ``ids``."""
    id_arr = pa.array(np.unique(ids), type=pa.int64())
    return ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=id_arr)),
        batch_format="pyarrow",
    )
