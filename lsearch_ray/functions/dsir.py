"""DSIR-style hashed importance weights (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling" — public
method): score every raw-corpus document by the log-likelihood ratio of
its hashed unigram features under a TARGET distribution vs the RAW
distribution. High-weight documents "look like" the target domain;
importance resampling on these weights steers a 100-TB crawl toward a
small high-quality target without training a model.

Feature space: terms hashed into ``buckets`` bins with the engine's
finalized FNV-63 (``sampling._key_hash63`` — the same hash the SQL
oracle replays via HUGEINT). Bucket unigram distributions are
Laplace-smoothed (+1) and the per-bucket log-ratio is rounded to
INTEGER micro-nats BEFORE the per-document weighted sum:

    delta(b)  = floor((ln((ct_b+1)/(Tt+B)) - ln((cr_b+1)/(Tr+B)))
                * 1e6 + 0.5)
    weight(d) = Σ_terms tf · delta(bucket(term))     [pure int64]

so per-doc totals are bit-exact across engines regardless of summation
order (the established micro-nat contract of ``unigram_nll``).

Scale shape: ONE tokenize pass emits per-(doc, bucket) tf partials —
complete within a batch because a document never spans batches — into a
materialized Dataset consumed twice: (a) a B-row bucket aggregate
(B ≈ 1e4-1e6 buckets at scale; trivially collectable), (b) the scoring
pass, which carries the B-entry delta array in the task closure (one
object-store broadcast). No shuffle touches per-token rows; the only
exchange is the final per-doc sum.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import term_counts_table
from lsearch_ray.functions.sampling import _key_hash63


def _doc_bucket_partial(
    batch: pa.Table,
    buckets: int,
    text_col: str,
    id_col: str,
    target_col: str,
    target_value: str,
) -> pa.Table:
    """(id, bucket, v, tgt) hashed-unigram tf sums for one batch of
    DOCUMENTS; ``tgt`` = 1 iff the doc belongs to the target slice."""
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
            "tgt": pa.array([], type=pa.int64()),
        }
    )
    triples = term_counts_table(batch, text_col, id_col)
    if triples.num_rows == 0:
        return empty
    bk = _key_hash63(triples["term"]) % buckets
    tf = triples["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc = triples["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((bk, doc))
    doc, bk, tf = doc[order], bk[order], tf[order]
    change = np.flatnonzero((np.diff(doc) != 0) | (np.diff(bk) != 0)) + 1
    starts = np.concatenate(([0], change))
    # doc -> target flag from this batch's rows (null target misses);
    # vectorized id -> row-position lookup, no Python per-row loop
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    is_t = (
        pc.fill_null(
            pc.equal(batch[target_col], pa.scalar(target_value)), False
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    d = doc[starts]
    order = np.argsort(ids, kind="mergesort")
    rows = order[np.searchsorted(ids[order], d)]
    return pa.table(
        {
            id_col: pa.array(d),
            "bucket": pa.array(bk[starts]),
            "v": pa.array(np.add.reduceat(tf, starts)),
            "tgt": pa.array(is_t[rows]),
        }
    )


def dsir_weights_ds(
    docs_ds,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document DSIR importance weight. Returns a Dataset of
    (id_col, n_tokens, weight_micro) over documents with at least one
    token; ``weight_micro`` is the integer micro-nat log-likelihood
    ratio described in the module docstring (positive = target-like)."""
    from ray.data.aggregate import Sum

    e = docs_ds.map_batches(
        lambda b: _doc_bucket_partial(
            b, buckets, text_col, id_col, target_col, target_value
        ),
        batch_format="pyarrow",
    ).materialize()

    def bucket_partial(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "bucket": b["bucket"],
                "ct": pa.array(v * b["tgt"].to_numpy(zero_copy_only=False)),
                "cr": pa.array(v),
            }
        )
        return t.group_by("bucket").aggregate([("ct", "sum"), ("cr", "sum")])

    rows = (
        e.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("ct_sum", alias_name="ct"), Sum("cr_sum", alias_name="cr"))
        .take_all()
    )
    ct = np.zeros(buckets, dtype=np.int64)
    cr = np.zeros(buckets, dtype=np.int64)
    for r in rows:
        ct[int(r["bucket"])] = int(r["ct"])
        cr[int(r["bucket"])] = int(r["cr"])
    tt, tr = int(ct.sum()), int(cr.sum())
    delta = np.array(
        [
            math.floor(
                (
                    math.log((int(ct[b]) + 1) / (tt + buckets))
                    - math.log((int(cr[b]) + 1) / (tr + buckets))
                )
                * 1e6
                + 0.5
            )
            for b in range(buckets)
        ],
        dtype=np.int64,
    )

    def score(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = delta[b["bucket"].to_numpy(zero_copy_only=False)]
        t = pa.table(
            {
                id_col: b[id_col],
                "v": pa.array(v),
                "w": pa.array(v * d),
            }
        )
        return t.group_by(id_col).aggregate([("v", "sum"), ("w", "sum")])

    agg = (
        e.map_batches(score, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("v_sum", alias_name="n_tokens"),
            Sum("w_sum", alias_name="weight_micro"),
        )
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_tokens": b["n_tokens"].cast(pa.int64()),
                "weight_micro": b["weight_micro"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
