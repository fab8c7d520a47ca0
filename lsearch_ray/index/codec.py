"""Delta + varint posting-list codec with block-max skip metadata.

Encodes per-term posting lists — ``(doc_id, tf, dl)`` sorted by ``doc_id``
— into three varint-compressed binary columns plus per-block skip entries:

- ``docs``: varints of doc_id deltas (first value is the raw doc_id);
- ``tfs`` / ``dls``: varints of term frequencies / document lengths;
- skip lists, one entry per ``block_size`` postings:
  ``skip_last`` (last doc_id of the block, for skipping), ``skip_doff`` /
  ``skip_toff`` / ``skip_loff`` (byte offsets of the block start into the
  three blobs), ``skip_max_tf`` and ``skip_min_dl``.

Block-max design note: the BM25 per-posting impact
``idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`` is monotone increasing in
``tf`` and decreasing in ``dl``, so ``f(max_tf, min_dl)`` evaluated at query
time (when ``idf``/``avgdl`` are known) upper-bounds every posting in the
block — the bound block-max WAND needs — while keeping the codec
independent of global corpus statistics. That independence is what makes
shard encoding a single self-contained pass (resumable per shard, no
second pass to patch score bounds in).

Everything is vectorized numpy over flat arrays; the only Python-level
loop is over 7-bit varint byte positions (≤ 10 iterations).

Reference lineage: the reference has no persistence or compression at all
(SURVEY.md §4); this implements the north-star codec
("delta-encoded, varint-compressed posting lists with per-partition skip
blocks and block-max metadata").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_BLOCK_SIZE = 128


def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode an unsigned array.

    Returns ``(data, lengths)``: the concatenated byte stream and the byte
    length of each value. Vectorized over values; loops only over the ≤10
    possible byte positions.

    Two construction strategies, byte-identical output (pinned by
    test_codec + the resume byte-identity tests):

    - ``max_len == 1`` (tf columns): the stream IS the value array.
    - small ``max_len`` (≤4 — dl columns, dense deltas): build the
      (n, max_len) byte matrix with one broadcast shift and select the
      valid bytes with a single row-major boolean take — measured ~9×
      faster than per-position masked scatter for 1-byte and ~3× for
      2-3-byte values.
    - large ``max_len`` (sparse ~7-byte doc-hash deltas): the matrix
      would be mostly padding; per-position masked scatter wins there.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    lengths = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lengths += tmp != 0
        tmp >>= np.uint64(7)
    max_len = int(lengths.max())
    if max_len == 1:
        return v.astype(np.uint8), lengths
    if max_len <= 4:
        shifts = np.arange(max_len, dtype=np.uint64) * np.uint64(7)
        mat = ((v[:, None] >> shifts[None, :]) & np.uint64(0x7F)).astype(
            np.uint8
        )
        karr = np.arange(max_len, dtype=np.int64)
        mat |= (karr[None, :] < (lengths[:, None] - 1)).astype(np.uint8) << 7
        return mat[karr[None, :] < lengths[:, None]], lengths
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    data = np.zeros(offsets[-1], dtype=np.uint8)
    for k in range(max_len):
        mask = lengths > k
        idx = offsets[:-1][mask] + k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lengths[mask] - 1 > k).astype(np.uint8) << 7
        data[idx] = byte | cont
    return data, lengths


def varint_decode(data: np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte stream back to a uint64 array. Vectorized."""
    buf = np.ascontiguousarray(data, dtype=np.uint8)
    if len(buf) == 0:
        return np.empty(0, dtype=np.uint64)
    cont = (buf & 0x80) != 0
    ends = np.flatnonzero(~cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    pos = np.arange(len(buf))
    group = np.searchsorted(ends, pos)
    shift = ((pos - starts[group]) * 7).astype(np.uint64)
    contrib = (buf & np.uint8(0x7F)).astype(np.uint64) << shift
    return np.bitwise_or.reduceat(contrib, starts)


def _grouped_delta(values: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """First-difference with reset at each group start (delta encoding of
    concatenated sorted posting lists)."""
    out = np.empty_like(values)
    out[0] = values[0]
    out[1:] = values[1:] - values[:-1]
    out[group_starts] = values[group_starts]
    return out


def _grouped_undelta(deltas: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_grouped_delta`: per-group cumulative sum.

    Works in modular uint64 arithmetic: the global cumsum may wrap (each
    group's first delta is a raw ~2^62 doc id), but subtracting the
    pre-group prefix — also wrapped — recovers the exact in-group sums.
    """
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    if len(d) == 0:
        return d
    with np.errstate(over="ignore"):
        cs = np.cumsum(d, dtype=np.uint64)
        sub = np.zeros(len(group_starts), dtype=np.uint64)
        sub[1:] = cs[group_starts[1:] - 1]
        lengths = np.diff(np.concatenate((group_starts, [len(d)])))
        return cs - np.repeat(sub, lengths)


def build_doc_table(doc_ids: np.ndarray) -> np.ndarray:
    """Sorted unique doc ids of a shard — the ordinal → id mapping the
    docs blobs reference (see :func:`encode_shard_postings`)."""
    return np.unique(np.asarray(doc_ids, dtype=np.int64))


def _doc_table_column(doc_table: np.ndarray, n_terms: int) -> pa.Array:
    """The embedded-doc-table column: row 0 = the whole table as
    little-endian int64 bytes, rows 1..n null. Built from offsets + a
    validity bitmap so no n_terms-long Python list is materialized."""
    blob = np.ascontiguousarray(doc_table, dtype="<i8").view(np.uint8)
    offsets = np.full(n_terms + 1, len(blob), dtype=np.int64)
    offsets[0] = 0
    validity = np.zeros((n_terms + 7) // 8, dtype=np.uint8)
    if n_terms:
        validity[0] = 1  # only row 0 is set (LSB bit order)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n_terms,
        [
            pa.py_buffer(validity.tobytes()),
            pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(blob.tobytes()),
        ],
        null_count=max(n_terms - 1, 0),
    )


def doc_table_from_postings(table: pa.Table) -> np.ndarray:
    """The shard doc table embedded in a postings table (row 0 of the
    ``docs_tab`` column; see :func:`encode_shard_postings`)."""
    if table.num_rows == 0 or "docs_tab" not in table.column_names:
        return np.empty(0, dtype=np.int64)
    blob = table["docs_tab"][0].as_py()
    if not blob:
        return np.empty(0, dtype=np.int64)
    return np.frombuffer(blob, dtype="<i8").astype(np.int64, copy=False)


def _block_starts_flat(df: np.ndarray, block_size: int) -> np.ndarray:
    """Flat posting-row indices of every block start of every term (term
    starts are each term's block 0) — the docs delta-chain reset points."""
    df = np.asarray(df, dtype=np.int64)
    n_blocks_per_term = (df + block_size - 1) // block_size
    total_blocks = int(n_blocks_per_term.sum())
    term_of_block = np.repeat(np.arange(len(df)), n_blocks_per_term)
    block_ordinal = np.arange(total_blocks) - np.repeat(
        np.concatenate(([0], np.cumsum(n_blocks_per_term)[:-1])),
        n_blocks_per_term,
    )
    term_first = np.concatenate(([0], np.cumsum(df)))[:-1]
    return term_first[term_of_block] + block_ordinal * block_size


def _binary_from_offsets(data: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Zero-copy build of a large_binary Arrow array from flat bytes +
    int64 offsets."""
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64)), pa.py_buffer(data)],
    )


def _list_from_offsets(values: pa.Array, offsets: np.ndarray) -> pa.Array:
    return pa.LargeListArray.from_arrays(
        pa.array(offsets.astype(np.int64), type=pa.int64()), values
    )


def encode_shard_postings(
    terms: pa.Array,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
    positions: np.ndarray | None = None,
    doc_table: np.ndarray | None = None,
) -> pa.Table:
    """Encode ALL posting lists of one shard in one vectorized pass.

    Inputs are the shard's flat triples, already sorted by (term, doc_id);
    ``terms`` is the per-row term (dictionary-encoded ok). Output: one row
    per term with columns ``term, df, docs, tfs, dls, skip_last,
    skip_doff, skip_toff, skip_loff, skip_max_tf, skip_min_dl``.

    **Ordinal docs encoding**: the ``docs`` blob stores varints of each
    posting's ORDINAL in the shard's sorted-unique doc table
    (``doc_table``; built with :func:`build_doc_table` when not given).
    Raw doc-hash ids are ~47-bit apart (≈7-byte varint deltas carrying
    irreducible entropy); ordinals are dense, so deltas shrink to 1-2
    bytes — the docs blob drops ~4× and both encode and block decode
    speed up. The delta chain resets at EVERY block start (each block's
    first varint is an absolute ordinal), so a block decodes
    self-contained with no cross-block rebase. ``skip_last`` keeps RAW
    ids — block-range pruning compares candidate doc ids without
    touching the table.

    The doc table itself is EMBEDDED in the output as the ``docs_tab``
    column: row 0 holds the whole table as little-endian int64 bytes,
    every other row is null. One file stays the unit of atomic
    replacement — compaction/merge rewrite postings+table in a single
    ``os.replace`` (or object PUT), so no crash or concurrent reader can
    ever pair a new table with old blobs. Term-filtered reads never pay
    for it (column pruning); loaders fetch it via
    :func:`doc_table_from_postings` on row group 0.

    ``positions``: optional flat int array of within-doc token positions,
    concatenated in triple-row order (``len == tfs.sum()``; posting i owns
    ``tfs[i]`` ascending positions). Adds a ``poss`` blob per term
    (delta-varint per posting — first position raw, then gaps) plus
    ``skip_poff`` per-block byte offsets, enabling phrase queries.
    """
    n = len(doc_ids)
    if n == 0:
        return _empty_postings_table(positions is not None)
    t = terms
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    denc = t.dictionary_encode() if not pa.types.is_dictionary(t.type) else t
    codes = np.asarray(denc.indices)
    # term boundaries (input is sorted by term)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(codes)) + 1))
    ends = np.concatenate((starts[1:], [n]))
    df = ends - starts
    uniq_terms = denc.dictionary.take(pa.array(codes[starts]))

    # ---- block structure (needed before docs encoding: the docs delta
    # chain resets at every block start) ----
    n_blocks_per_term = (df + block_size - 1) // block_size
    total_blocks = int(n_blocks_per_term.sum())
    # global row index of each block's first posting
    term_of_block = np.repeat(np.arange(len(df)), n_blocks_per_term)
    block_ordinal = np.arange(total_blocks) - np.repeat(
        np.concatenate(([0], np.cumsum(n_blocks_per_term)[:-1])), n_blocks_per_term
    )
    blk_start = starts[term_of_block] + block_ordinal * block_size
    blk_end = np.minimum(blk_start + block_size, ends[term_of_block])

    if doc_table is None:
        doc_table = build_doc_table(doc_ids)
    ords = np.searchsorted(doc_table, np.asarray(doc_ids, dtype=np.int64))
    deltas = _grouped_delta(ords.astype(np.uint64), blk_start)
    d_data, d_len = varint_encode(deltas)
    t_data, t_len = varint_encode(tfs.astype(np.uint64))
    l_data, l_len = varint_encode(dls.astype(np.uint64))
    d_off = np.concatenate(([0], np.cumsum(d_len)))
    t_off = np.concatenate(([0], np.cumsum(t_len)))
    l_off = np.concatenate(([0], np.cumsum(l_len)))

    docs_col = _binary_from_offsets(d_data, d_off[np.concatenate((starts, [n]))])
    tfs_col = _binary_from_offsets(t_data, t_off[np.concatenate((starts, [n]))])
    dls_col = _binary_from_offsets(l_data, l_off[np.concatenate((starts, [n]))])

    skip_last = doc_ids[blk_end - 1].astype(np.int64)
    # per-block max tf / min dl via ufunc.reduceat on block starts
    skip_max_tf = np.maximum.reduceat(tfs.astype(np.int64), blk_start)
    skip_min_dl = np.minimum.reduceat(dls.astype(np.int64), blk_start)
    # byte offsets of block start RELATIVE to the term's blob start
    skip_doff = (d_off[blk_start] - d_off[starts[term_of_block]]).astype(np.int64)
    skip_toff = (t_off[blk_start] - t_off[starts[term_of_block]]).astype(np.int64)
    skip_loff = (l_off[blk_start] - l_off[starts[term_of_block]]).astype(np.int64)

    blk_list_off = np.concatenate(([0], np.cumsum(n_blocks_per_term)))

    def lst(vals: np.ndarray, typ: pa.DataType) -> pa.Array:
        return _list_from_offsets(pa.array(vals, type=typ), blk_list_off)

    cols = {
        "term": uniq_terms,
        "df": pa.array(df, type=pa.int32()),
        "docs": docs_col,
        "tfs": tfs_col,
        "dls": dls_col,
        "skip_last": lst(skip_last, pa.int64()),
        "skip_doff": lst(skip_doff, pa.int64()),
        "skip_toff": lst(skip_toff, pa.int64()),
        "skip_loff": lst(skip_loff, pa.int64()),
        "skip_max_tf": lst(skip_max_tf, pa.int64()),
        "skip_min_dl": lst(skip_min_dl, pa.int64()),
        "docs_tab": _doc_table_column(doc_table, len(df)),
    }
    if positions is not None:
        # value index of each posting's first position (row → value space)
        voff = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
        if len(positions) != voff[-1]:
            raise ValueError(
                f"positions length {len(positions)} != sum(tf) {voff[-1]}"
            )
        pos_deltas = _grouped_delta(
            np.ascontiguousarray(positions, dtype=np.uint64), voff[:-1]
        )
        p_data, p_len = varint_encode(pos_deltas)
        p_off = np.concatenate(([0], np.cumsum(p_len)))
        term_val_bounds = voff[np.concatenate((starts, [n]))]
        cols["poss"] = _binary_from_offsets(p_data, p_off[term_val_bounds])
        skip_poff = (
            p_off[voff[blk_start]] - p_off[voff[starts[term_of_block]]]
        ).astype(np.int64)
        cols["skip_poff"] = lst(skip_poff, pa.int64())
    return pa.table(cols)


def _empty_postings_table(positions: bool = False) -> pa.Table:
    i64list = pa.large_list(pa.int64())
    cols = {
        "term": pa.array([], type=pa.large_string()),
        "df": pa.array([], type=pa.int32()),
        "docs": pa.array([], type=pa.large_binary()),
        "tfs": pa.array([], type=pa.large_binary()),
        "dls": pa.array([], type=pa.large_binary()),
        "skip_last": pa.array([], type=i64list),
        "skip_doff": pa.array([], type=i64list),
        "skip_toff": pa.array([], type=i64list),
        "skip_loff": pa.array([], type=i64list),
        "skip_max_tf": pa.array([], type=i64list),
        "skip_min_dl": pa.array([], type=i64list),
        "docs_tab": pa.array([], type=pa.large_binary()),
    }
    if positions:
        cols["poss"] = pa.array([], type=pa.large_binary())
        cols["skip_poff"] = pa.array([], type=i64list)
    return pa.table(cols)


def decode_positions_column(
    pos_blob: bytes, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's positions blob.

    Returns ``(offsets, flat)``: posting i's ascending positions are
    ``flat[offsets[i]:offsets[i+1]]`` (``offsets`` = cumulative tf)."""
    deltas = varint_decode(np.frombuffer(pos_blob, dtype=np.uint8))
    offsets = np.concatenate(
        ([0], np.cumsum(np.asarray(tfs, dtype=np.int64)))
    )
    flat = _grouped_undelta(deltas, offsets[:-1]).astype(np.int64)
    return offsets, flat


def decode_posting_column(
    docs_blob: bytes,
    tfs_blob: bytes,
    dls_blob: bytes,
    doc_table: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one term's blobs back to (doc_ids, tfs, dls).

    ``doc_table``/``block_size`` must be the shard's table and the
    index's block size: the docs blob stores ordinal deltas resetting at
    every block start (see :func:`encode_shard_postings`)."""
    tfs = varint_decode(np.frombuffer(tfs_blob, dtype=np.uint8)).astype(np.int64)
    dls = varint_decode(np.frombuffer(dls_blob, dtype=np.uint8)).astype(np.int64)
    deltas = varint_decode(np.frombuffer(docs_blob, dtype=np.uint8))
    group_starts = np.arange(0, len(tfs), block_size, dtype=np.int64)
    ords = _grouped_undelta(deltas, group_starts).astype(np.int64)
    doc_ids = np.asarray(doc_table, dtype=np.int64)[ords]
    return doc_ids, tfs, dls


def _gather_slices(
    buf: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """Concatenate buf[starts[i]:ends[i]] slices, vectorized."""
    lengths = (ends - starts).astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    out_off = np.concatenate(([0], np.cumsum(lengths)))
    gather = np.arange(total, dtype=np.int64) + np.repeat(
        starts.astype(np.int64) - out_off[:-1], lengths
    )
    return buf[gather]


class LazyPostings:
    """One term-fragment kept ENCODED, with per-block skip metadata.

    True skip-pointer decoding: ``decode_blocks`` varint-decodes only the
    requested blocks by slicing the three blobs at the codec's per-block
    byte offsets; the doc ORDINAL delta chain resets at every block
    start (each block's first varint is an absolute ordinal into the
    shard's ``doc_table``), so a block decodes self-contained.
    ``decode_all`` is the memoized full decode for paths that need the
    whole list (θ lead term, AND intersection, negation fallback).
    """

    __slots__ = (
        "docs_buf",
        "tfs_buf",
        "dls_buf",
        "skip_last",
        "skip_doff",
        "skip_toff",
        "skip_loff",
        "skip_max_tf",
        "skip_min_dl",
        "df",
        "block_size",
        "doc_table",
        "_all",
    )

    def __init__(
        self,
        docs_blob: bytes,
        tfs_blob: bytes,
        dls_blob: bytes,
        skip_last: np.ndarray,
        skip_doff: np.ndarray,
        skip_toff: np.ndarray,
        skip_loff: np.ndarray,
        skip_max_tf: np.ndarray,
        skip_min_dl: np.ndarray,
        df: int,
        block_size: int,
        doc_table: np.ndarray,
    ):
        self.docs_buf = np.frombuffer(docs_blob, dtype=np.uint8)
        self.tfs_buf = np.frombuffer(tfs_blob, dtype=np.uint8)
        self.dls_buf = np.frombuffer(dls_blob, dtype=np.uint8)
        self.skip_last = np.asarray(skip_last, dtype=np.int64)
        self.skip_doff = np.asarray(skip_doff, dtype=np.int64)
        self.skip_toff = np.asarray(skip_toff, dtype=np.int64)
        self.skip_loff = np.asarray(skip_loff, dtype=np.int64)
        self.skip_max_tf = np.asarray(skip_max_tf, dtype=np.int64)
        self.skip_min_dl = np.asarray(skip_min_dl, dtype=np.int64)
        self.df = int(df)
        self.block_size = int(block_size)
        self.doc_table = np.asarray(doc_table, dtype=np.int64)
        self._all = None

    @property
    def n_blocks(self) -> int:
        return len(self.skip_last)

    def block_counts(self) -> np.ndarray:
        nb = self.n_blocks
        counts = np.full(nb, self.block_size, dtype=np.int64)
        if nb:
            counts[-1] = self.df - (nb - 1) * self.block_size
        return counts

    def block_ranges(self) -> tuple[np.ndarray, np.ndarray]:
        """Inclusive doc-id interval [lo, hi] each block can cover: hi is
        the stored block-last; lo is the previous block's last + 1 (doc
        ids are strictly increasing within a term)."""
        hi = self.skip_last
        lo = np.concatenate(([0], self.skip_last[:-1] + 1))
        return lo, hi

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._all is None:
            self._all = decode_posting_column(
                self.docs_buf.tobytes(),
                self.tfs_buf.tobytes(),
                self.dls_buf.tobytes(),
                self.doc_table,
                self.block_size,
            )
        return self._all

    def decode_blocks(
        self, sel: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode only blocks ``sel`` (sorted indices). Returns the
        concatenated (doc_ids, tfs, dls) of those blocks, identical to
        the corresponding slices of ``decode_all``."""
        sel = np.asarray(sel, dtype=np.int64)
        if len(sel) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        if len(sel) == self.n_blocks or self._all is not None:
            docs, tfs, dls = self.decode_all()
            if len(sel) == self.n_blocks:
                return docs, tfs, dls
            counts = self.block_counts()
            starts = np.concatenate(([0], np.cumsum(counts)))
            lengths = counts[sel]
            out_off = np.concatenate(([0], np.cumsum(lengths)))
            idx = np.arange(out_off[-1], dtype=np.int64) + np.repeat(
                starts[sel] - out_off[:-1], lengths
            )
            return docs[idx], tfs[idx], dls[idx]
        d_b = np.concatenate((self.skip_doff, [len(self.docs_buf)]))
        t_b = np.concatenate((self.skip_toff, [len(self.tfs_buf)]))
        l_b = np.concatenate((self.skip_loff, [len(self.dls_buf)]))
        deltas = varint_decode(
            _gather_slices(self.docs_buf, d_b[sel], d_b[sel + 1])
        )
        tfs = varint_decode(
            _gather_slices(self.tfs_buf, t_b[sel], t_b[sel + 1])
        ).astype(np.int64)
        dls = varint_decode(
            _gather_slices(self.dls_buf, l_b[sel], l_b[sel + 1])
        ).astype(np.int64)
        counts = self.block_counts()[sel]
        group_starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        # each block's chain restarts at an absolute ordinal — the
        # selected blocks decode self-contained, no cross-block rebase
        ords = _grouped_undelta(deltas, group_starts).astype(np.int64)
        return self.doc_table[ords], tfs, dls
