"""Line-level boilerplate detection and removal — the CCNet /
RefinedWeb per-line dedup family, re-expressed Ray-Data-first.

Web pipelines (CCNet, C4, RefinedWeb, Dolma) strip navigation chrome,
cookie banners and template footers by counting how many DISTINCT
documents each LINE appears in and dropping high-document-frequency
lines before any document-level dedup runs. Three operators:

- :func:`reflow_lines_ds` — deterministic line segmentation for corpora
  whose text carries no newlines (our synthetic tables): every
  ``words_per_line`` space-separated words become one ``\\n``-line (the
  last line of a doc may be shorter). Raw ``' '``-split, NOT the
  analyzer, so the segmentation is exactly DuckDB ``string_split``:
  an empty text has ONE empty word and hence one empty line.
- :func:`boilerplate_lines_ds` — the detector: ``(line, df)`` for every
  line whose distinct-document frequency reaches ``min_docs``.
- :func:`line_dedup_ds` — the transform: every occurrence of a
  boilerplate line is removed and the document is rebuilt from the
  surviving lines in order (``\\n``-joined; a fully-boilerplate doc
  becomes the empty string but stays present).

Scale shape (no all-pairs, no driver materialization — the
``dupspans.py`` layout with lines in place of shingles):

1. one map-side pass emits DISTINCT (doc, line) pairs — a doc never
   spans batches, so within-doc dedup is local (Arrow ``group_by``);
2. one hash-partition shuffle on the line; a partition holds every row
   of its lines, so a line's run length IS its global distinct-doc
   count (the sparse.py df trick) — boilerplate = run length ≥
   ``min_docs``;
3. removal: each line-partition re-emits only the BOILERPLATE
   (doc, line) pairs, a doc-keyed partition pass collapses them to one
   (doc, ``\\n``-joined line blob) row per affected doc (lines cannot
   contain ``\\n``, so the separator is collision-free), a left-outer
   hash join carries the blob back to the documents, and a final
   vectorized pass re-splits each doc locally and drops the member
   lines (batch-local (row, line) composite keys + one ``is_in``).

The boilerplate set is NOT broadcast: with ``min_docs=2`` its size is
bounded only by total-lines/2, so it rides the doc-keyed blob join
(volume = affected docs only) exactly like ``dup_span_removal_ds``.

Reference counterpart: none (the reference has no dedup surface);
SURVEY §2.9 dedup-family extension — the LINE-granular member of the
chunk/CDC/shingle-span family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.functions.dedup import partition_ids

_LINE_SEP = "\n"

_EMPTY_PAIRS = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "line": pa.array([], type=pa.large_string()),
        "__part": pa.array([], type=pa.int64()),
    }
)


def _flat_lines(texts) -> tuple[np.ndarray, pa.Array]:
    """(parent row index, flat line values) of a batch's ``\\n``-split
    texts. Null text is treated as ``''``; ``''`` splits to one empty
    line — both matching DuckDB ``string_split`` on ``coalesce(t,'')``.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(pc.cast(texts, pa.large_string()), "")
    col = pc.split_pattern(texts, _LINE_SEP)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    parents = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    return parents, col.flatten()


def reflow_lines_ds(
    ds,
    *,
    words_per_line: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, text) with each doc's space-separated words re-segmented
    into ``\\n``-lines of ``words_per_line`` words (last line shorter).
    Pure map-side; the line-family gates compose this in front of the
    detectors so a newline-free corpus still exercises them for real.
    """
    k = int(words_per_line)
    if k < 1:
        raise ValueError("words_per_line must be >= 1")

    def reflow(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(pc.cast(texts, pa.large_string()), "")
        words = pc.split_pattern(texts, " ")
        wlens = (
            pc.list_value_length(words)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = words.flatten()
        doc_off = np.concatenate(([0], np.cumsum(wlens)))
        # >= 1 line per doc: ''.split(' ') == [''] so wlens >= 1 always
        n_lines = -(-wlens // k)
        line_starts_base = np.concatenate(([0], np.cumsum(n_lines)))
        line_parent = np.repeat(
            np.arange(len(wlens), dtype=np.int64), n_lines
        )
        within = (
            np.arange(int(n_lines.sum()), dtype=np.int64)
            - line_starts_base[line_parent]
        ) * k
        # line i spans [start_i, start_{i+1}) of the flat word array —
        # the next line's start IS this line's end, with the total as
        # the final sentinel (starts are globally monotone)
        offsets = np.concatenate((doc_off[line_parent] + within, doc_off[-1:]))
        lines = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, type=pa.int64()), flat
            ),
            pa.scalar(" ", type=pa.large_string()),
        )
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        docs = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(line_starts_base, type=pa.int64()), lines
            ),
            pa.scalar(_LINE_SEP, type=pa.large_string()),
        )
        return pa.table(
            {"doc_id": b[id_col].cast(pa.int64()), "text": pc.fill_null(docs, "")}
        )

    return ds.map_batches(reflow, batch_format="pyarrow")


def _pairs_part(
    b: pa.Table, id_col: str, text_col: str, num_partitions: int
) -> pa.Table:
    """DISTINCT (doc_id, line) pairs of one batch, tagged with the
    line-hash partition id (a doc's text lives in exactly one batch
    row, so within-doc dedup is local and exact)."""
    parents, flat = _flat_lines(b[text_col])
    if len(flat) == 0:
        return _EMPTY_PAIRS
    ids = b[id_col].cast(pa.int64()).take(pa.array(parents))
    t = pa.table({"doc_id": ids, "line": flat})
    t = t.group_by(["doc_id", "line"]).aggregate([])
    return t.append_column(
        "__part", pa.array(partition_ids(t, ["line"], num_partitions))
    )


def boilerplate_lines_ds(
    ds,
    *,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
):
    """(line, df) for every line appearing in at least ``min_docs``
    DISTINCT documents, sorted by df descending then line ascending.
    One pair shuffle; a line lives in exactly one partition, so its
    within-partition row count over per-doc-distinct pairs IS its df."""

    def df_part(g: pa.Table) -> pa.Table:
        enc = g["line"].combine_chunks().dictionary_encode()
        counts = np.bincount(
            enc.indices.to_numpy(), minlength=len(enc.dictionary)
        ).astype(np.int64)
        keep = counts >= min_docs
        return pa.table(
            {
                "line": enc.dictionary.filter(pa.array(keep)),
                "df": pa.array(counts[keep]),
            }
        )

    return (
        ds.map_batches(
            lambda b: _pairs_part(b, id_col, text_col, num_partitions),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(df_part, batch_format="pyarrow")
        .sort(["df", "line"], descending=[True, False])
    )


def line_dedup_ds(
    ds,
    *,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    sort: bool = True,
):
    """(doc_id, text, n_lines, removed_lines) sorted by doc_id: every
    line whose distinct-doc frequency reaches ``min_docs`` is removed
    from EVERY document containing it and the doc is rebuilt from the
    surviving lines ``\\n``-joined in order (empty string when nothing
    survives; untouched docs pass through verbatim).

    ``sort=False`` skips the terminal range sort (the oracle contract,
    not compute): callers that re-shuffle, aggregate or write
    partitioned output next should skip it — at sf0.1 the sort is ~half
    the operator's wall (the component_labels_ds convention)."""
    from lsearch_ray.functions.joins import hash_join, safe_partitions

    def shared_pairs(g: pa.Table) -> pa.Table:
        lr = g["line"].combine_chunks()
        codes = lr.dictionary_encode().indices.to_numpy()
        keep = np.bincount(codes)[codes] >= min_docs
        mask = pa.array(keep)
        t = pa.table(
            {
                "doc_id": g["doc_id"].combine_chunks().filter(mask),
                "line": lr.filter(mask),
            }
        )
        return t.append_column(
            "__dpart",
            pa.array(partition_ids(t, ["doc_id"], num_partitions)),
        )

    def collect_blobs(g: pa.Table) -> pa.Table:
        # one (doc, \n-joined line blob) row per affected doc: sort by
        # doc, slice runs into a ListArray, binary_join — the blob rides
        # the hash join as ONE string (pyarrow joins reject list
        # payloads), and '\n' cannot appear inside a line
        doc = g["doc_id"].to_numpy()
        order = np.argsort(doc, kind="stable")
        doc_s = doc[order]
        lines_s = g["line"].combine_chunks().take(pa.array(order))
        change = np.flatnonzero(np.diff(doc_s)) + 1
        offsets = np.concatenate(([0], change, [len(doc_s)]))
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), lines_s
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_s[offsets[:-1]]),
                "dup_blob": pc.binary_join(
                    lst, pa.scalar(_LINE_SEP, type=pa.large_string())
                ),
            }
        )

    # materialized so count() + the join don't re-run the line shuffle;
    # holds only the AFFECTED docs' boilerplate lines, object-store-
    # resident and spillable
    dup_lists = (
        ds.map_batches(
            lambda b: _pairs_part(b, id_col, text_col, num_partitions),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(shared_pairs, batch_format="pyarrow")
        .groupby("__dpart")
        .map_groups(collect_blobs, batch_format="pyarrow")
        .materialize()
    )

    n_dup_docs = dup_lists.count()
    docs = ds.select_columns([id_col, text_col])
    if n_dup_docs == 0:
        # nothing boilerplate: pass every doc through with a null blob
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

    def _row_line_keys(rows: np.ndarray, lines: pa.Array) -> pa.Array:
        # batch-local (row index, line) composite membership keys; '\n'
        # is collision-free as the key separator for the same reason it
        # is as the blob separator
        return pc.binary_join_element_wise(
            pc.cast(pa.array(rows.astype(np.int64)), pa.large_string()),
            pc.cast(lines, pa.large_string()),
            pa.scalar(_LINE_SEP, type=pa.large_string()),
        )

    def remove(b: pa.Table) -> pa.Table:
        parents, flat = _flat_lines(b[text_col])
        nrows = b.num_rows
        n_lines = np.bincount(parents, minlength=nrows).astype(np.int64)
        member = np.zeros(len(flat), dtype=bool)
        blob = pc.split_pattern(
            pc.cast(b["dup_blob"], pa.large_string()), _LINE_SEP
        )
        if isinstance(blob, pa.ChunkedArray):
            blob = blob.combine_chunks()
        lens = pc.fill_null(pc.list_value_length(blob), 0).to_numpy(
            zero_copy_only=False
        )
        if int(lens.sum()) > 0:
            set_rows = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            set_keys = _row_line_keys(set_rows, blob.flatten())
            occ_keys = _row_line_keys(parents, flat)
            member = pc.is_in(occ_keys, value_set=set_keys).to_numpy(
                zero_copy_only=False
            )
        kept_parents = parents[~member]
        kept = flat.filter(pa.array(~member))
        offsets = np.searchsorted(
            kept_parents, np.arange(nrows + 1, dtype=np.int64)
        )
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), kept
        )
        texts = pc.binary_join(
            lst, pa.scalar(_LINE_SEP, type=pa.large_string())
        )
        return pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "text": pc.fill_null(texts, ""),
                "n_lines": pa.array(n_lines),
                "removed_lines": pa.array(n_lines - np.diff(offsets)),
            }
        )

    out = joined.map_batches(remove, batch_format="pyarrow")
    return out.sort("doc_id") if sort else out
