"""Chunk-level exact deduplication (RefinedWeb/Gopher-style).

Web-corpus boilerplate (headers, footers, license blurbs) repeats at
sub-document granularity, so document-level dedup misses it. This
operator re-expresses that pass Ray-Data-first: split every document
into fixed-width word chunks map-side (zero-copy over the flat token
stream — no per-row Python), then run ONE hash-partitioned exact dedup
over the chunk text, keeping each distinct chunk's first occurrence in
global ``(doc_id, chunk_idx)`` order. Output is relational — the kept
``(doc_id, chunk_idx, chunk)`` rows — so reassembly stays a trivially
vectorized downstream concat and the SQL oracle compares exact strings,
not re-joined documents.

Scale plan: chunking is pure map-side; the only shuffle is the dedup's
hash partition on the chunk text (via ``exact_dedup``'s shared
``partition_ids`` arithmetic). At 100 TB the shuffle key could be
switched to a 64-bit chunk hash (the ``exact_dedup_by_content`` shape);
kept as text here because the driver oracle deduplicates on exact
strings and hash collisions would silently merge distinct chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import flat_tokens_arrow


def doc_chunks(
    texts: pa.ChunkedArray | pa.Array, width: int
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Fixed-width word chunks of each row of a string column.

    Returns ``(parents, chunk_idx, chunks)``: chunk i came from row
    ``parents[i]`` and covers that row's tokens
    ``[chunk_idx[i]*width, ...)``, joined with single spaces. The final
    chunk of a row may be shorter than ``width``. Rows with no tokens
    contribute none. Vectorized: one boundary mask over the flat token
    stream, one LargeListArray wrap, one ``binary_join`` kernel.
    """
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    parents, flat = flat_tokens_arrow(texts)
    n = len(parents)
    if n == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            pa.array([], type=pa.large_string()),
        )
    first = np.concatenate(([True], parents[1:] != parents[:-1]))
    run_start = np.flatnonzero(first)
    run_of = np.cumsum(first) - 1
    ordinal = np.arange(n, dtype=np.int64) - run_start[run_of]
    starts = np.flatnonzero(ordinal % width == 0)
    offsets = np.append(starts, n).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), flat)
    chunks = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
    return parents[starts], ordinal[starts] // width, chunks


def _chunk_batch(
    batch: pa.Table, width: int, text_col: str, id_col: str
) -> pa.Table:
    parents, chunk_idx, chunks = doc_chunks(batch[text_col], width)
    ids = batch[id_col].take(pa.array(parents))
    return pa.table(
        {
            id_col: ids,
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            "chunk": chunks.cast(pa.string()),
        }
    )


def chunk_exact_dedup(
    docs_ds,
    *,
    width: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
):
    """Keep the first occurrence of every distinct ``width``-word chunk.

    "First" is global ``(doc_id, chunk_idx)`` order. Returns a Dataset of
    the surviving ``(doc_id, chunk_idx, chunk)`` rows; duplicated
    boilerplate chunks appear exactly once, attributed to the earliest
    document position that contains them.
    """
    from lsearch_ray.functions.dedup import exact_dedup

    chunked = docs_ds.map_batches(
        lambda b: _chunk_batch(b, width, text_col, id_col),
        batch_format="pyarrow",
    )
    return exact_dedup(
        chunked,
        key_cols=["chunk"],
        order_cols=[id_col, "chunk_idx"],
        num_partitions=num_partitions,
    )


def doc_chunks_cdc(
    texts: pa.ChunkedArray | pa.Array, *, divisor: int = 16
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """CONTENT-DEFINED chunking at the token level: a chunk boundary
    falls after every token whose 63-bit hash ≡ 0 (mod ``divisor``), so
    the expected chunk length is ``divisor`` tokens and boundaries are a
    pure function of local content — inserting or deleting text upstream
    shifts fixed-width chunk grids everywhere downstream, but leaves CDC
    boundaries outside the edit unchanged (the rolling-hash dedup
    property, rsync/LBFS-style, expressed on the token stream).

    Returns ``(parents, chunk_idx, n_tokens, chunks)``. The classic
    byte-level CDC min/max chunk-size clamps are deliberately omitted:
    they make boundaries sequentially dependent (unvectorizable and not
    SQL-expressible); the pure form keeps the shift-robustness that
    matters for dedup. Vectorized: one hash pass + one boundary mask
    over the flat token stream, one LargeListArray wrap, one
    ``binary_join``.
    """
    from lsearch_ray.functions.sampling import _key_hash63

    if divisor < 1:
        raise ValueError(f"divisor must be >= 1, got {divisor}")
    parents, flat = flat_tokens_arrow(texts)
    n = len(parents)
    if n == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            pa.array([], type=pa.large_string()),
        )
    h = _key_hash63(flat)
    boundary = (h % divisor) == 0  # ends its chunk
    first = np.concatenate(([True], parents[1:] != parents[:-1]))
    prev_b = np.concatenate(([False], boundary[:-1]))
    starts_mask = first | (prev_b & ~first)
    starts = np.flatnonzero(starts_mask)
    offsets = np.append(starts, n).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), flat)
    chunks = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
    run_of = np.cumsum(first) - 1
    cs = np.cumsum(starts_mask)
    doc_first_cs = cs[np.flatnonzero(first)]
    chunk_idx = cs[starts] - doc_first_cs[run_of[starts]]
    return (
        parents[starts],
        chunk_idx.astype(np.int64),
        np.diff(offsets),
        chunks,
    )


def cdc_chunks_table(
    batch: pa.Table,
    *,
    divisor: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Batch transform: documents → (id, chunk_id, n_tokens, chunk)."""
    parents, chunk_idx, n_tokens, chunks = doc_chunks_cdc(
        batch[text_col], divisor=divisor
    )
    return pa.table(
        {
            id_col: batch[id_col].take(pa.array(parents)),
            "chunk_id": pa.array(chunk_idx, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "chunk": chunks.cast(pa.string()),
        }
    )


def doc_chunks_overlap(
    texts: pa.ChunkedArray | pa.Array, width: int, stride: int
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Sliding word windows: a chunk starts every ``stride`` tokens and
    covers up to ``width`` tokens (stride < width ⇒ RAG-style overlap;
    stride == width ≡ :func:`doc_chunks`). Returns (parents, chunk_idx,
    chunks). Overlapping windows cannot share one ListArray offsets
    vector (list slices must be consecutive), so the flat token stream
    is re-GATHERED once per output token — one vectorized take, then the
    same list-wrap + binary_join kernels.
    """
    if width < 1 or stride < 1:
        raise ValueError(f"width and stride must be >= 1, got {width}, {stride}")
    parents, flat = flat_tokens_arrow(texts)
    n = len(parents)
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        pa.array([], type=pa.large_string()),
    )
    if n == 0:
        return empty
    first = np.concatenate(([True], parents[1:] != parents[:-1]))
    run_start = np.flatnonzero(first)
    run_of = np.cumsum(first) - 1
    ordinal = np.arange(n, dtype=np.int64) - run_start[run_of]
    # chunk starts: every token whose within-row ordinal is a multiple
    # of stride begins a window
    s = np.flatnonzero(ordinal % stride == 0)
    if len(s) == 0:
        return empty
    run_end = np.append(run_start[1:], n)  # flat end of each row's run
    lens = np.minimum(s + width, run_end[run_of[s]]) - s
    total = int(lens.sum())
    # gather indices: for window i, s[i] .. s[i]+lens[i)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    gather = np.repeat(s - bounds[:-1], lens) + np.arange(total, dtype=np.int64)
    taken = flat.take(pa.array(gather))
    lists = pa.LargeListArray.from_arrays(pa.array(bounds), taken)
    chunks = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
    return parents[s], ordinal[s] // stride, chunks


def overlap_chunks_ds(
    docs_ds,
    *,
    width: int = 8,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dataset form of :func:`doc_chunks_overlap` — pure map-side
    (doc_id, chunk_idx, chunk) rows, the RAG chunking shape."""

    def chunk(b: pa.Table) -> pa.Table:
        parents, idx, chunks = doc_chunks_overlap(b[text_col], width, stride)
        return pa.table(
            {
                id_col: b[id_col].take(pa.array(parents)),
                "chunk_idx": pa.array(idx, type=pa.int64()),
                "chunk": chunks.cast(pa.string()),
            }
        )

    return docs_ds.map_batches(chunk, batch_format="pyarrow")
