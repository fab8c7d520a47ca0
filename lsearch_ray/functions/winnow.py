"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 "Winnowing: Local Algorithms for Document Fingerprinting" —
the MOSS algorithm), re-expressed Ray-Data-first.

Selection rule (standard winnowing): hash every word ``k``-gram, slide
a window of ``w`` consecutive k-gram hashes over each document, and in
each window select the MINIMUM hash, breaking ties by the RIGHTMOST
occurrence; the fingerprint set is the distinct selected (position,
hash) pairs. The guarantee: any shared substring of at least
``t = k + w - 1`` tokens between two documents yields at least one
shared fingerprint, while only ~2/(w+1) of positions are kept —
a density-bounded sampler that, unlike plain 0 mod p sampling, can
never have unboundedly long gaps.

Arithmetic (shared with the MinHash family so the SQL twins replay it):

- token hash: 63-bit-masked FNV-1a (:func:`lsearch_ray.corpus.fnv1a64`,
  the ``_fnv63_of`` oracle twin);
- k-gram hash: the rolling ``acc = (acc · M mod 2^64) xor h`` combine of
  minhash's shingles (M = 0x9E3779B97F4A7C15, ``_mul_shingle64`` twin),
  masked to 63 bits for int64 storage — FULL windows only: documents
  with fewer than ``k`` tokens emit no k-grams (winnowing's guarantee
  only speaks about strings of length ≥ t anyway), and fewer than
  ``k + w - 1`` tokens emit no fingerprints (no full window).

Scale shape: fingerprint selection is pure map-side (one vectorized
pass per batch — the sliding-window argmin is O(m·w) numpy over a
zero-copy strided view, w is small). The pair operator is the sparse.py
layout: one hash-partition shuffle of the distinct (fp, doc) pairs on
fp — a partition holds every row of its fingerprints, so a
fingerprint's run length IS its global document frequency — with
boilerplate fingerprints pruned by ``max_df`` (the operator's DEFINED
kernel, exactly mirrored in the SQL twin), then a second
partition-trick shuffle sums shared-fingerprint counts per (a, b).

Reference counterpart: none (the reference has no dedup surface);
SURVEY §2.9 dedup-family extension — the fingerprint-sampling
complement to full-mass :mod:`dupspans`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.dedup import arrow_out, partition_ids

_MULT = np.uint64(0x9E3779B97F4A7C15)
_MASK63 = np.uint64((1 << 63) - 1)

_EMPTY_FPS = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "pos": pa.array([], type=pa.int64()),
        "fp": pa.array([], type=pa.int64()),
    }
)


def _winnow_batch(
    batch: pa.Table, k: int, w: int, id_col: str, text_col: str
) -> pa.Table:
    """Distinct selected (doc_id, pos, fp) rows of one batch. ``pos`` is
    the 1-based k-gram start index within the doc's token stream."""
    from lsearch_ray.analyzer import flat_tokens_arrow
    from lsearch_ray.corpus import fnv1a64

    parents, flat = flat_tokens_arrow(batch[text_col])
    m = len(flat) - k + 1
    if m <= 0:
        return _EMPTY_FPS
    h = fnv1a64(flat).astype(np.uint64)
    # full-window k-gram hashes over the flat token array (rows whose
    # window spans two docs are masked out below, same as doc_ngrams)
    acc = h.copy()
    with np.errstate(over="ignore"):
        for i in range(1, k):
            acc[: len(acc) - i] = acc[: len(acc) - i] * _MULT ^ h[i:]
    kh = acc[:m] & _MASK63
    kg_valid = parents[:m] == parents[k - 1 :]
    # winnow windows: w consecutive k-grams, inside one doc
    mw = m - w + 1
    if mw <= 0:
        return _EMPTY_FPS
    win_valid = kg_valid[:mw] & (parents[:mw] == parents[k + w - 2 :])
    starts = np.flatnonzero(win_valid)
    if len(starts) == 0:
        return _EMPTY_FPS
    view = np.lib.stride_tricks.sliding_window_view(kh, w)[starts]
    # rightmost minimum: argmin over the reversed columns
    rm = (w - 1) - np.argmin(view[:, ::-1], axis=1)
    sel = np.unique(starts + rm)
    # 1-based position within the doc: flat index minus the doc's first
    # token index (token i starts the k-gram at in-doc position i+1)
    first_tok = np.zeros(len(flat), dtype=np.int64)
    if len(parents):
        doc_first = np.concatenate(
            ([0], np.flatnonzero(np.diff(parents)) + 1)
        )
        first_tok = doc_first[
            np.cumsum(np.concatenate(([False], np.diff(parents) > 0)))
        ]
    ids = batch[id_col].take(pa.array(parents[sel]))
    return pa.table(
        {
            "doc_id": ids.cast(pa.int64()),
            "pos": pa.array(sel - first_tok[sel] + 1),
            "fp": pa.array(kh[sel].astype(np.int64)),
        }
    )


def winnow_fingerprints_ds(
    docs_ds,
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-doc winnowing fingerprints: (doc_id, pos, fp) sorted by
    (doc_id, pos) — the distinct window-selected k-gram hashes with
    their 1-based start positions. Pure map-side; the only exchange is
    the output sort."""

    def fps(b: pa.Table) -> pa.Table:
        return _winnow_batch(b, k, w, id_col, text_col)

    return docs_ds.map_batches(fps, batch_format="pyarrow").sort(
        ["doc_id", "pos"]
    )


def winnow_dup_pairs_ds(
    docs_ds,
    *,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
):
    """Document pairs sharing ≥ ``min_shared`` distinct winnowing
    fingerprints: (a, b, n_shared), a < b, sorted by (a, b).

    Fingerprints held by more than ``max_df`` documents are pruned
    (boilerplate cap — bounds the per-fingerprint pair blowup at
    df·(df−1)/2 and is part of the operator's defined kernel, mirrored
    exactly in the SQL twin)."""
    import pandas as pd

    from lsearch_ray.functions.sparse import _emit_index_pairs

    def fp_part(b: pa.Table) -> pa.Table:
        t = _winnow_batch(b, k, w, id_col, text_col)
        # distinct (doc, fp): a position-multiset fingerprint held twice
        # by one doc must count once toward sharing
        t = (
            t.select(["doc_id", "fp"])
            .group_by(["doc_id", "fp"])
            .aggregate([])
        )
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["fp"], num_partitions))
        )

    def pairs_partition(g: pd.DataFrame) -> pa.Table:
        fp = g["fp"].to_numpy()
        doc = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((doc, fp))
        fp, doc = fp[order], doc[order]
        change = np.flatnonzero(np.diff(fp)) + 1
        run_starts = np.concatenate(([0], change, [len(fp)]))
        L = np.diff(run_starts)
        # a partition holds every row of its fps → run length == global df
        keep = (L >= 2) & (L <= max_df)
        ia, ib = _emit_index_pairs(run_starts, keep)
        t = pa.table({"a": pa.array(doc[ia]), "b": pa.array(doc[ib])})
        return t.append_column(
            "__p2", pa.array(partition_ids(t, ["a", "b"], num_partitions))
        )

    def sum_pairs(g: pd.DataFrame) -> pa.Table:
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        change = np.flatnonzero((np.diff(a) != 0) | (np.diff(b) != 0)) + 1
        starts = np.concatenate(([0], change))
        n = np.diff(np.append(starts, len(a))).astype(np.int64)
        keep = n >= min_shared
        return arrow_out(
            pd.DataFrame(
                {
                    "a": a[starts][keep],
                    "b": b[starts][keep],
                    "n_shared": n[keep],
                }
            )
        )

    return (
        docs_ds.map_batches(fp_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pandas")
        .groupby("__p2")
        .map_groups(sum_pairs, batch_format="pandas")
        .sort(["a", "b"])
    )
