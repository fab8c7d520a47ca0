"""Skew-handling helpers for term-keyed (Zipf-distributed) shuffles.

The index build itself shuffles by uniform doc-hash (immune to head-term
skew — build.py), but any raw term-keyed aggregation over triples hits
Zipf head terms: one reducer receives a constant fraction of ALL rows.
``salted_groupby_sum`` is the named north-rule mitigation: two-stage
aggregation where stage 1 groups by (key, salt) — splitting each hot key
across ``salt`` reducers — and stage 2 merges the ≤``salt`` partials per
key. Stage-2 input is ≤ ``salt × n_keys`` rows regardless of skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def salted_groupby_sum(
    ds,
    key: str,
    value_cols: list[str],
    *,
    salt: int = 16,
    seed: int = 99,
):
    """Sum ``value_cols`` per ``key`` with salted two-stage aggregation.

    Returns a Dataset with columns ``[key, *value_cols]``.
    """
    from ray.data.aggregate import Sum

    rng_mult = np.uint64(0x9E3779B97F4A7C15 ^ (seed * 0x10001))

    def add_salt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        # row-position salt: spreads a hot key's rows across reducers
        s = (np.arange(n, dtype=np.uint64) * rng_mult >> np.uint64(33)) % np.uint64(
            salt
        )
        return b.append_column("_salt", pa.array(s.astype(np.int32)))

    stage1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(*[Sum(c, alias_name=c) for c in value_cols])
    )
    stage2 = stage1.groupby(key).aggregate(
        *[Sum(c, alias_name=c) for c in value_cols]
    )
    return stage2
