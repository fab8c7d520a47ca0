"""Sequence packing: the two-pass distributed ordered cumsum must equal
the trivial single-threaded packing rule (exclusive prefix // capacity in
id order) under any partitioning, including non-contiguous ids, token-less
docs and exact capacity boundaries."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.analyzer import tokenize
from lsearch_ray.functions.packing import pack_bins_ds

TEXTS = [
    "alpha beta gamma",          # 3 tokens
    "",                          # 0 tokens
    "one two three four five",   # 5 tokens
    "x",                         # 1 token
    "a b c d e f g",             # 7 tokens
    "p q",                       # 2 tokens
    "m n o",                     # 3 tokens
]
IDS = [0, 2, 5, 7, 11, 12, 20]  # non-contiguous on purpose


def _ref_bins(ids, texts, capacity):
    order = np.argsort(ids)
    out = {}
    acc = 0
    for i in order:
        out[ids[i]] = (len(tokenize(texts[i])), acc // capacity)
        acc += len(tokenize(texts[i]))
    return out


def _ds(blocks):
    tab = pa.table(
        {"doc_id": pa.array(IDS, pa.int64()), "text": pa.array(TEXTS)}
    )
    return rd.from_arrow(tab).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 4])
@pytest.mark.parametrize("capacity", [4, 5, 100])
@pytest.mark.parametrize("range_width", [3, 1000])
def test_pack_bins_matches_sequential_rule(blocks, capacity, range_width):
    out = pack_bins_ds(
        _ds(blocks), capacity=capacity, range_width=range_width,
        num_partitions=3,
    ).to_pandas()
    expect = _ref_bins(IDS, TEXTS, capacity)
    assert list(out["doc_id"]) == sorted(IDS)
    got = {
        r.doc_id: (r.n_tokens, r.bin_id) for r in out.itertuples(index=False)
    }
    assert got == expect


def test_pack_bins_capacity_boundary():
    # 3 docs of exactly `capacity` tokens each land in bins 0, 1, 2
    texts = ["a b c", "d e f", "g h i"]
    tab = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()), "text": pa.array(texts)}
    )
    out = pack_bins_ds(
        rd.from_arrow(tab), capacity=3, range_width=2
    ).to_pandas()
    assert list(out["bin_id"]) == [0, 1, 2]
    assert list(out["n_tokens"]) == [3, 3, 3]


def test_pack_bins_rejects_negative_ids_and_bad_params():
    tab = pa.table(
        {"doc_id": pa.array([-1, 0], pa.int64()), "text": pa.array(["a", "b"])}
    )
    with pytest.raises(Exception, match="negative ids"):
        pack_bins_ds(rd.from_arrow(tab), capacity=4).to_pandas()
    with pytest.raises(ValueError, match="must be > 0"):
        pack_bins_ds(rd.from_arrow(tab), capacity=0)


@pytest.mark.parametrize("blocks", [1, 4])
def test_token_budget_sample_matches_hash_order_rule(blocks):
    """Kept set == greedy hash-order prefix under any partitioning."""
    from lsearch_ray.functions.packing import token_budget_sample_ds
    from lsearch_ray.functions.sampling import _key_hash63

    out = token_budget_sample_ds(
        _ds(blocks), budget=10, range_bits=4, num_partitions=3
    ).to_pandas()

    h = _key_hash63(pa.array(IDS, pa.int64()))
    order = sorted(range(len(IDS)), key=lambda i: (h[i], IDS[i]))
    acc, expect = 0, []
    for i in order:
        n = len(tokenize(TEXTS[i]))
        if acc < 10:
            expect.append(IDS[i])
        acc += n
    assert sorted(out["doc_id"]) == sorted(expect)


def test_token_budget_zero_budget_empty():
    from lsearch_ray.functions.packing import token_budget_sample_ds

    out = token_budget_sample_ds(_ds(1), budget=0).to_pandas()
    assert len(out) == 0


@pytest.mark.parametrize("blocks", [1, 4])
def test_pack_by_group_restarts_per_group(blocks):
    from lsearch_ray.functions.packing import pack_bins_by_group_ds

    groups = ["x", "y", "x", "y", "x", "y", "x"]
    tab = pa.table(
        {
            "doc_id": pa.array(IDS, pa.int64()),
            "text": pa.array(TEXTS),
            "g": pa.array(groups),
        }
    )
    out = (
        pack_bins_by_group_ds(
            rd.from_arrow(tab).repartition(blocks), "g",
            capacity=4, range_width=3, num_partitions=3,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # reference: per-group sequential rule in id order
    order = np.argsort(IDS)
    acc = {}
    expect = {}
    for i in order:
        g = groups[i]
        n = len(tokenize(TEXTS[i]))
        expect[IDS[i]] = acc.get(g, 0) // 4
        acc[g] = acc.get(g, 0) + n
    assert {r.doc_id: r.bin_id for r in out.itertuples(index=False)} == expect


def test_pack_by_group_rejects_null_groups():
    from lsearch_ray.functions.packing import pack_bins_by_group_ds

    tab = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a", "b"]),
            "g": pa.array(["x", None]),
        }
    )
    with pytest.raises(Exception, match="has nulls"):
        pack_bins_by_group_ds(rd.from_arrow(tab), "g").to_pandas()
