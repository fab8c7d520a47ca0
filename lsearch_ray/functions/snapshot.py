"""Crawl snapshot diff: classify every key of two crawl snapshots as
added / removed / changed / same by comparing content fingerprints.

The incremental-ingest companion to the dedup family (and the engine
surface the reference's `canonicalize` exact-dup key, `cli.rs:454`,
points toward at crawl scale): a recrawl pipeline needs to know which
urls are new, which disappeared, and which changed content before
deciding what to re-extract / re-index.

Plan shape — join-free:
1. each side is fingerprinted map-side (``textstats.fingerprint`` — a
   63-bit rolling token hash), so the exchange carries (key, fp64) and
   never the payloads;
2. both sides union into one stream tagged with per-side fingerprint /
   presence columns (the absent side carried as the -1 sentinel, below
   any masked 63-bit fingerprint);
3. ONE key-keyed groupby-max folds the two sides together (max picks
   the real fingerprint over the sentinel; presence bits OR through
   max) — a single hash shuffle of fingerprint-sized rows;
4. a vectorized ``np.select`` finisher labels each key.

At 100 TB both snapshots stream; driver state is zero rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ABSENT = -1  # below any 63-bit-masked fingerprint


def snapshot_diff_ds(
    a_ds,
    b_ds,
    *,
    key_col: str = "doc_id",
    fp_col: str = "fp64",
):
    """Per-key diff of two (key, fingerprint) datasets.

    Returns (``key_col``, status:string) over the union of keys, with
    status ∈ {'added', 'removed', 'changed', 'same'} — 'added' = in B
    only, 'removed' = in A only, 'changed' = both sides with different
    fingerprints. Keys must be unique within each snapshot (the crawl
    contract; duplicate keys fold through max like an exact-dup pass).
    """
    from ray.data.aggregate import Max

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            fp = (
                t[fp_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            absent = np.full(len(fp), _ABSENT, dtype=np.int64)
            return pa.table(
                {
                    key_col: t[key_col].cast(pa.int64()),
                    "fa": pa.array(fp if side == 0 else absent),
                    "fb": pa.array(fp if side == 1 else absent),
                }
            )

        return f

    u = a_ds.map_batches(tag(0), batch_format="pyarrow").union(
        b_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    agg = u.groupby(key_col).aggregate(
        Max("fa", alias_name="fa"), Max("fb", alias_name="fb")
    )

    def finish(t: pa.Table) -> pa.Table:
        fa = t["fa"].to_numpy(zero_copy_only=False).astype(np.int64)
        fb = t["fb"].to_numpy(zero_copy_only=False).astype(np.int64)
        status = np.select(
            [fb == _ABSENT, fa == _ABSENT, fa == fb],
            ["removed", "added", "same"],
            default="changed",
        )
        return pa.table(
            {
                key_col: t[key_col],
                "status": pa.array(status.tolist(), type=pa.large_string()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
