"""Cross-document duplicated n-gram signals and exact substring-span
removal — the Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better") family, re-expressed Ray-Data-first.

Two operators over one layout:

- :func:`dup_shingle_stats_ds` — per document, what share of its
  DISTINCT word k-shingles also appears in at least one OTHER document?
  The per-doc "duplicated substring mass" curation signal (a doc that is
  90% shared shingles is boilerplate or a near-copy even when no whole
  chunk matches).
- :func:`dup_span_removal_ds` — the transform: every token covered by a
  cross-doc-duplicated k-shingle occurrence is REMOVED and the document
  is rebuilt from the surviving tokens (single-space joined). This is
  the exact-substring-dedup pass LLM pipelines run before training; the
  k-shingle formulation makes "duplicated span" well-defined and
  SQL-expressible (the suffix-array formulation of the paper is its
  limit as k sweeps all lengths).

Scale shape (no all-pairs, no driver materialization):

1. one map-side pass emits DISTINCT (doc, shingle) pairs — a doc never
   spans batches, so within-doc dedup is local (Arrow ``group_by``);
2. one hash-partition shuffle on the shingle; a partition holds every
   row of its shingles, so a shingle's run length IS its global doc
   count (the sparse.py df trick) — shared = run length ≥ 2;
3. stats: each partition emits per-doc (total, shared) PARTIALS
   already tagged with a doc-hash partition id, so the combine is a
   second partition-trick pass (whole-partition vectorized bincount)
   instead of Ray's Aggregate operator (~5x cheaper measured at sf0.1,
   where Aggregate's per-block fixed cost dominated); map-side zero
   rows keep shingle-less docs present;
4. removal: each partition emits only the SHARED (doc, shingle) pairs,
   collapsed to one (doc, \\x02-joined shingle blob) row per doc by a
   second doc-keyed partition pass (vectorized run-slicing +
   ``binary_join``), hash-joined back to the documents (left outer —
   untouched docs pass through), and a final
   vectorized pass recomputes shingle positions locally, unions coverage
   with a diff/cumsum sweep over the flat token array, and rebuilds the
   kept text with a zero-copy ListArray + ``binary_join``.

Reference counterpart: none (the reference has no dedup surface);
SURVEY §2.9 dedup-family extension alongside chunk/CDC dedup — this is
the SUB-chunk variant those operators cannot express.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.functions.dedup import partition_ids
from lsearch_ray.functions.ngrams import GRAM_SEP, doc_ngrams

def _ngrams_with_starts(
    texts: pa.ChunkedArray | pa.Array, n: int
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Like :func:`doc_ngrams` but also returns each gram's START index
    into the batch's flat token array — the coverage sweep needs real
    positions, and ``doc_ngrams``'s valid-window filter makes gram index
    ≠ flat position. Same windowing arithmetic, one extra output."""
    from lsearch_ray.analyzer import flat_tokens_arrow

    parents, flat = flat_tokens_arrow(texts)
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        pa.array([], type=pa.large_string()),
    )
    m = len(flat) - n + 1
    if m <= 0:
        return empty
    valid = parents[:m] == parents[n - 1 :]
    if not valid.any():
        return empty
    joined = pc.binary_join_element_wise(
        *[flat.slice(i, m) for i in range(n)],
        pa.scalar(GRAM_SEP, type=pa.large_string()),
    )
    starts = np.flatnonzero(valid)
    return starts, parents[starts], joined.filter(pa.array(valid))


_EMPTY_PAIRS = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "gram": pa.array([], type=pa.large_string()),
    }
)


def _distinct_doc_shingles(
    batch: pa.Table, n: int, id_col: str, text_col: str
) -> pa.Table:
    """DISTINCT (doc_id, gram) pairs of one batch — local dedup is exact
    because a document's text lives in exactly one batch row."""
    parents, grams = doc_ngrams(batch[text_col], n)
    if len(grams) == 0:
        return _EMPTY_PAIRS
    ids = batch[id_col].take(pa.array(parents))
    t = pa.table({"doc_id": ids, "gram": grams})
    return t.group_by(["doc_id", "gram"]).aggregate([])


def dup_shingle_stats_ds(
    docs_ds,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
):
    """Per-doc duplicated-shingle mass: (doc_id, n_shingles,
    dup_shingles, dup_micro) sorted by doc_id, where ``n_shingles``
    counts the doc's DISTINCT word ``n``-shingles, ``dup_shingles``
    those that appear in ≥1 other doc, and
    ``dup_micro = dup_shingles * 1e6 // n_shingles`` (floor fixed-point;
    0 for docs with fewer than ``n`` tokens — they still appear)."""

    def _with_dpart(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__dpart",
            pa.array(partition_ids(t, ["doc_id"], num_partitions)),
        )

    def pairs_part(b: pa.Table) -> pa.Table:
        t = _distinct_doc_shingles(b, n, id_col, text_col)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "gram": pa.array([], type=pa.large_string()),
                    "__part": pa.array([], type=pa.int64()),
                }
            )
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["gram"], num_partitions))
        )

    def flag_partial(g: pa.Table) -> pa.Table:
        # a gram's row count within its partition == global doc count
        # (pairs are per-doc distinct and a gram lives in ONE partition)
        codes = (
            g["gram"].combine_chunks().dictionary_encode().indices.to_numpy()
        )
        doc = g["doc_id"].to_numpy()
        shared = np.bincount(codes)[codes] >= 2
        ud, inv = np.unique(doc, return_inverse=True)
        tot = np.bincount(inv, minlength=len(ud)).astype(np.int64)
        shr = np.bincount(
            inv, weights=shared.astype(np.float64), minlength=len(ud)
        ).astype(np.int64)
        return _with_dpart(
            pa.table(
                {
                    "doc_id": pa.array(ud),
                    "tot": pa.array(tot),
                    "shr": pa.array(shr),
                }
            )
        )

    def zeros(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, dtype=np.int64)
        return _with_dpart(
            pa.table(
                {
                    "doc_id": b[id_col].cast(pa.int64()),
                    "tot": pa.array(z),
                    "shr": pa.array(z),
                }
            )
        )

    def sum_final(g: pa.Table) -> pa.Table:
        # whole-doc-partition vectorized combine of the per-gram-partition
        # partials — replaces groupby(doc).aggregate(Sum, Sum)
        doc = g["doc_id"].to_numpy()
        tot = g["tot"].to_numpy().astype(np.float64)
        shr = g["shr"].to_numpy().astype(np.float64)
        ud, inv = np.unique(doc, return_inverse=True)
        tot_s = np.bincount(inv, weights=tot, minlength=len(ud)).astype(
            np.int64
        )
        shr_s = np.bincount(inv, weights=shr, minlength=len(ud)).astype(
            np.int64
        )
        micro = np.zeros(len(ud), dtype=np.int64)
        nz = tot_s > 0
        micro[nz] = shr_s[nz] * 10**6 // tot_s[nz]
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "n_shingles": pa.array(tot_s),
                "dup_shingles": pa.array(shr_s),
                "dup_micro": pa.array(micro),
            }
        )

    partials = (
        docs_ds.map_batches(pairs_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(flag_partial, batch_format="pyarrow")
    )
    return (
        docs_ds.map_batches(zeros, batch_format="pyarrow")
        .union(partials)
        .groupby("__dpart")
        .map_groups(sum_final, batch_format="pyarrow")
        .sort("doc_id")
    )


# separator for the (row, gram) membership keys inside one batch; \x02
# cannot appear in a gram (tokens are [a-z0-9]+ runs joined by \x01)
_KEY_SEP = "\x02"


def _row_gram_keys(rows: np.ndarray, grams: pa.Array) -> pa.Array:
    """Batch-local (row index, gram) composite keys for set membership."""
    return pc.binary_join_element_wise(
        pc.cast(pa.array(rows.astype(np.int64)), pa.large_string()),
        pc.cast(grams, pa.large_string()),
        pa.scalar(_KEY_SEP, type=pa.large_string()),
    )


def dup_span_removal_ds(
    docs_ds,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
):
    """Exact duplicated-span removal: (doc_id, text, n_tokens,
    removed_tokens) sorted by doc_id, where every token position covered
    by ANY occurrence of a cross-doc-duplicated ``n``-shingle is dropped
    and ``text`` is the surviving tokens single-space-joined (the
    operator's output is the NORMALIZED token stream — case-folded,
    punctuation collapsed — matching every other text op here).

    Docs with no duplicated shingle pass through with their full
    normalized token stream and ``removed_tokens = 0``."""
    from lsearch_ray.functions.joins import hash_join, safe_partitions

    def pairs_part(b: pa.Table) -> pa.Table:
        t = _distinct_doc_shingles(b, n, id_col, text_col)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "gram": pa.array([], type=pa.large_string()),
                    "__part": pa.array([], type=pa.int64()),
                }
            )
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["gram"], num_partitions))
        )

    def shared_pairs(g: pa.Table) -> pa.Table:
        gr = g["gram"].combine_chunks()
        codes = gr.dictionary_encode().indices.to_numpy()
        keep = np.bincount(codes)[codes] >= 2
        mask = pa.array(keep)
        t = pa.table(
            {
                "doc_id": g["doc_id"].combine_chunks().filter(mask),
                "gram": gr.filter(mask),
            }
        )
        return t.append_column(
            "__dpart",
            pa.array(partition_ids(t, ["doc_id"], num_partitions)),
        )

    def collect_blobs(g: pa.Table) -> pa.Table:
        # one (doc, \x02-joined gram blob) row per dup doc of this
        # doc-partition, built vectorized: sort rows by doc, slice runs
        # into a ListArray, binary_join. The blob form rides the hash
        # join as ONE string — pyarrow joins reject list payloads.
        doc = g["doc_id"].to_numpy()
        order = np.argsort(doc, kind="stable")
        doc_s = doc[order]
        grams_s = g["gram"].combine_chunks().take(pa.array(order))
        change = np.flatnonzero(np.diff(doc_s)) + 1
        offsets = np.concatenate(([0], change, [len(doc_s)]))
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), grams_s
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_s[offsets[:-1]]),
                "dup_blob": pc.binary_join(
                    lst, pa.scalar(_KEY_SEP, type=pa.large_string())
                ),
            }
        )

    # materialized so count() + the join don't re-run the shingle
    # shuffle; holds only the DUP-doc gram lists (a corpus fraction),
    # object-store-resident and spillable
    dup_lists = (
        docs_ds.map_batches(pairs_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(shared_pairs, batch_format="pyarrow")
        .groupby("__dpart")
        .map_groups(collect_blobs, batch_format="pyarrow")
        .materialize()
    )

    n_dup_docs = dup_lists.count()
    docs = docs_ds.select_columns([id_col, text_col])
    if n_dup_docs == 0:
        # nothing duplicated: pass every doc through with an empty set
        # (a left join against an empty right side crashes Ray's hash
        # aggregator, and there is nothing to join anyway)
        joined = docs.map_batches(
            lambda b: b.append_column(
                "dup_blob", pa.nulls(b.num_rows, type=pa.large_string())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = hash_join(
            docs,
            dup_lists,
            on=id_col,
            right_on="doc_id",
            how="left_outer",
            num_partitions=safe_partitions(num_partitions, n_dup_docs),
        )

    def remove(b: pa.Table) -> pa.Table:
        from lsearch_ray.analyzer import flat_tokens_arrow

        parents, flat = flat_tokens_arrow(b[text_col])
        nrows = b.num_rows
        n_tok = np.bincount(parents, minlength=nrows).astype(np.int64)
        covered = np.zeros(len(flat), dtype=bool)
        col = pc.split_pattern(
            pc.cast(b["dup_blob"], pa.large_string()), _KEY_SEP
        )
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # explode each row's dup-gram list into batch-local (row, gram)
        # membership keys; null lists (left-outer misses) explode to none
        lens = pc.list_value_length(col)
        lens = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False)
        if int(lens.sum()) > 0 and len(flat) >= n:
            set_rows = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            set_keys = _row_gram_keys(set_rows, col.flatten())
            gstarts, gp, grams = _ngrams_with_starts(b[text_col], n)
            occ_keys = _row_gram_keys(gp, grams)
            flagged = pc.is_in(occ_keys, value_set=set_keys).to_numpy(
                zero_copy_only=False
            )
            s = gstarts[flagged]
            if len(s):
                # union of the covered intervals [s, s+n) — one
                # diff/cumsum sweep over the flat token array
                diff = np.zeros(len(flat) + 1, dtype=np.int64)
                np.add.at(diff, s, 1)
                np.add.at(diff, np.minimum(s + n, len(flat)), -1)
                covered = np.cumsum(diff[:-1]) > 0
        kept_parents = parents[~covered]
        kept = flat.filter(pa.array(~covered))
        offsets = np.searchsorted(
            kept_parents, np.arange(nrows + 1, dtype=np.int64)
        )
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), kept
        )
        texts = pc.binary_join(lst, pa.scalar(" ", type=pa.large_string()))
        removed = n_tok - np.diff(offsets)
        return pa.table(
            {
                "doc_id": b[id_col],
                "text": pc.fill_null(texts, ""),
                "n_tokens": pa.array(n_tok),
                "removed_tokens": pa.array(removed.astype(np.int64)),
            }
        )

    return joined.map_batches(remove, batch_format="pyarrow").sort("doc_id")
