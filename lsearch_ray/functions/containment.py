"""Containment (overlap-coefficient) near-duplicate pairs.

``C(A, B) = |A ∩ B| / min(|A|, |B|)`` over per-doc DISTINCT token
5-shingle sets — the asymmetric dedup measure for SUBSET duplication
(a quote, a syndicated article inside a boilerplate wrapper, a doc
embedded in a larger one), where Jaccard is diluted by the size
mismatch and MinHash banding tuned for Jaccard recall misses the pair
outright. This is the "containment" of Broder '97 §3 symmetrized to
the overlap coefficient, the measure Dolma/CC-style pipelines use for
sub-document duplication triage.

Kernel (the operator's defined contract, mirrored by the SQL twin):

- shingles: FULL 5-token windows only — docs with < 5 tokens have an
  empty set and can never pair (the dupspans convention,
  ``_DUPSPAN_TOKS_SQL``); per-doc distinct;
- candidates: unordered pairs sharing ≥ 1 shingle whose document
  frequency is in ``[2, max_df]`` (the winnowing boilerplate cap —
  bounds per-shingle pair fan-out at df·(df−1)/2; an over-cap shingle
  is boilerplate, and a true containment pair that ONLY shares over-cap
  shingles is by definition boilerplate overlap, not content overlap);
- verify: EXACT intersection on the full distinct sets,
  ``cont_micro = (|A∩B| · 10^6) // min(|A|, |B|)`` (integer floor
  division both engines), keep pairs with ``cont_micro ≥
  threshold_micro``.

Scale shape: candidate generation is the winnow/sparse two-shuffle
layout (one hash-partition exchange on the shingle — a partition holds
every row of its shingles so run length IS global df — then one on the
pair key); verification attaches the two shingle-set blobs through
distributed hash joins (cluster.attach_pair_payloads) and intersects
inside map tasks. Nothing pair-shaped or set-shaped on the driver.

Engine-side shingle identity is the 63-bit-masked rolling hash of
minhash._shingle_hashes (vectorized); the SQL twin uses the literal
token 5-gram string — identical results assuming hash injectivity,
the dupspans precedent (collision probability ~n²/2⁶³).

Reference counterpart: none (no dedup surface in the reference);
SURVEY §2.9 dedup-family extension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.functions.dedup import arrow_out, partition_ids
from lsearch_ray.functions.minhash import _shingle_hashes, _token_hashes

_MASK63 = 0x7FFFFFFFFFFFFFFF

_EMPTY_PAIRS = pa.table(
    {
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "n_inter": pa.array([], type=pa.int64()),
        "cont_micro": pa.array([], type=pa.int64()),
    }
)


def _doc_shingle_lists(
    batch: pa.Table, ngram: int, id_col: str, text_col: str
) -> list[np.ndarray]:
    """Per-row sorted-distinct full-window shingle hashes (int64)."""
    n = batch.num_rows
    parents, h = _token_hashes(batch[text_col])
    L = (
        np.bincount(parents, minlength=n)
        if len(parents)
        else np.zeros(n, dtype=np.int64)
    )
    sh_starts, sh = _shingle_hashes(parents, h, n, ngram)
    out: list[np.ndarray] = []
    for d in range(n):
        if L[d] < ngram:  # full windows only — dupspans convention
            out.append(np.empty(0, dtype=np.int64))
            continue
        s, e = int(sh_starts[d]), int(sh_starts[d + 1])
        out.append(np.unique(sh[s:e]).astype(np.int64) & _MASK63)
    return out


def shared_shingle_candidates_ds(
    docs_ds,
    lists_fn,
    *,
    id_col: str = "doc_id",
    num_partitions: int = 32,
    max_df: int | None = 64,
):
    """Distinct unordered doc pairs sharing ≥ 1 shingle whose global df
    is in ``[2, max_df]`` (``max_df=None`` = uncapped — COMPLETE for any
    positive-overlap measure, since a pair with |A∩B| ≥ 1 shares a
    shingle). ``lists_fn(batch) -> list[np.ndarray]`` supplies each
    row's sorted-distinct shingle hashes, so callers pick the shingle
    convention (full-window 5-grams for containment, minhash 3-grams
    with the short-doc fold for exact Jaccard). Two hash-partition
    exchanges: one on the shingle (a partition holds every row of its
    shingles, so run length IS global df), one on the pair key for the
    multi-bucket dedup. Returns a materialized (a, b) Dataset."""
    import pandas as pd

    from lsearch_ray.functions.sparse import _emit_index_pairs

    def sh_part(b: pa.Table) -> pa.Table:
        lists = lists_fn(b)
        lens = np.array([len(u) for u in lists], dtype=np.int64)
        flat = (
            np.concatenate(lists) if lists else np.empty(0, dtype=np.int64)
        )
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        t = pa.table(
            {
                "doc_id": ids.take(
                    pa.array(np.repeat(np.arange(b.num_rows), lens))
                ).cast(pa.int64()),
                "sh": pa.array(flat, type=pa.int64()),
            }
        )
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["sh"], num_partitions))
        )

    def pairs_partition(g: pd.DataFrame) -> pa.Table:
        sh = g["sh"].to_numpy()
        doc = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((doc, sh))
        sh, doc = sh[order], doc[order]
        change = np.flatnonzero(np.diff(sh)) + 1
        run_starts = np.concatenate(([0], change, [len(sh)]))
        L = np.diff(run_starts)
        # a partition holds every row of its shingles → run len == global df
        keep = L >= 2
        if max_df is not None:
            keep &= L <= max_df
        ia, ib = _emit_index_pairs(run_starts, keep)
        t = pa.table({"a": pa.array(doc[ia]), "b": pa.array(doc[ib])})
        return t.append_column(
            "__p2", pa.array(partition_ids(t, ["a", "b"], num_partitions))
        )

    def distinct_pairs(g: pd.DataFrame) -> pa.Table:
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.concatenate(
            ([True], (np.diff(a) != 0) | (np.diff(b) != 0))
        )
        return arrow_out(pd.DataFrame({"a": a[first], "b": b[first]}))

    return (
        docs_ds.map_batches(sh_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pandas")
        .groupby("__p2")
        .map_groups(distinct_pairs, batch_format="pandas")
        .materialize()
    )


def containment_pairs_ds(
    docs_ds,
    *,
    ngram: int = 5,
    threshold_micro: int = 500_000,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
):
    """Doc pairs with overlap coefficient ≥ ``threshold_micro`` / 10⁶:
    ``(a, b, n_inter, cont_micro)``, a < b, sorted by (a, b)."""
    import ray.data as rd

    from lsearch_ray.functions.cluster import (
        attach_pair_payloads,
        blob_lists,
        list_to_blob,
    )

    cand = shared_shingle_candidates_ds(
        docs_ds,
        lambda b: _doc_shingle_lists(b, ngram, id_col, text_col),
        id_col=id_col,
        num_partitions=num_partitions,
        max_df=max_df,
    )
    if cand.count() == 0:
        return rd.from_arrow(_EMPTY_PAIRS)

    def blobs(b: pa.Table) -> pa.Table:
        lists = _doc_shingle_lists(b, ngram, id_col, text_col)
        offsets = np.concatenate(
            ([0], np.cumsum([len(u) for u in lists]))
        )
        flat = (
            np.concatenate(lists) if lists else np.empty(0, dtype=np.int64)
        )
        col = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(flat, type=pa.int64()),
        )
        return pa.table(
            {id_col: b[id_col].cast(pa.int64()), "sh": list_to_blob(col)}
        )

    payload = docs_ds.map_batches(blobs, batch_format="pyarrow")
    joined = attach_pair_payloads(
        cand, payload, id_col, num_partitions=max(2, num_partitions // 4)
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_PAIRS
        offs_a, flat_a = blob_lists(b["sh_a"])
        offs_b, flat_b = blob_lists(b["sh_b"])
        n_inter = np.zeros(b.num_rows, dtype=np.int64)
        cont = np.zeros(b.num_rows, dtype=np.int64)
        for i in range(b.num_rows):
            sa = flat_a[offs_a[i] : offs_a[i + 1]]
            sb = flat_b[offs_b[i] : offs_b[i + 1]]
            mn = min(len(sa), len(sb))
            if mn == 0:  # candidates share a shingle, so mn ≥ 1; guard anyway
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            n_inter[i] = inter
            cont[i] = (inter * 1_000_000) // mn
        t = pa.table(
            {
                "a": b["a"],
                "b": b["b"],
                "n_inter": pa.array(n_inter, type=pa.int64()),
                "cont_micro": pa.array(cont, type=pa.int64()),
            }
        )
        return t.filter(pa.array(cont >= threshold_micro))

    return joined.map_batches(verify, batch_format="pyarrow").sort(["a", "b"])
