"""The analyzer: ASCII-lowercase + alphanumeric-split tokenization.

Semantics generalize the reference's case fold (``to_ascii_lowercase`` at
``cli.rs:384-386`` / ``cli.rs:397``) and its substring counting scorer
(``More``, ``search.rs:267-283``) into token extraction: lowercase ASCII
letters only, then split on any run of characters outside ``[a-z0-9]``.

Two implementations, guaranteed to agree byte-for-byte:

- :func:`tokenize` — pure-Python reference used by golden tests.
- :func:`term_counts_table` / :class:`TermCounter` — the vectorized Arrow
  path used inside ``Dataset.map_batches`` (pyarrow ``ascii_lower`` +
  ``split_pattern_regex``; no Python loop over rows).

The ASCII-only fold matters: Python's ``str.lower()`` can expand non-ASCII
codepoints (e.g. ``"İ".lower()`` yields ``"i̇"``, introducing an ASCII ``i``)
while Arrow's ``ascii_lower`` does not. Both sides here fold ``A-Z → a-z``
only, so token streams agree on any input.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Pure-ASCII case fold: A-Z -> a-z, nothing else.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)
_TOKEN_RE = re.compile(r"[a-z0-9]+")
# Arrow split pattern: runs of non-token characters.
SPLIT_PATTERN = "[^a-z0-9]+"


def ascii_lower(text: str) -> str:
    """ASCII-only lowercase (parity with pyarrow ``pc.ascii_lower``)."""
    return text.translate(_ASCII_LOWER)


def tokenize(text: str) -> list[str]:
    """Pure-Python reference tokenizer: ascii-lower then [a-z0-9]+ runs."""
    return _TOKEN_RE.findall(ascii_lower(text))


def term_counts(text: str) -> dict[str, int]:
    """Pure-Python reference term-frequency map for one document."""
    counts: dict[str, int] = {}
    for tok in tokenize(text):
        counts[tok] = counts.get(tok, 0) + 1
    return counts


def flat_tokens_arrow(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, pa.Array]:
    """Vectorized tokenize of a string column.

    Returns ``(parent_row_indices, flat_token_array)`` where
    ``parent_row_indices[i]`` is the row of ``texts`` that produced flat
    token ``i``. Empty tokens (from leading/trailing/adjacent separators)
    are filtered out. No Python per-row loop.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lowered = pc.ascii_lower(texts)
    token_lists = pc.split_pattern_regex(lowered, SPLIT_PATTERN)
    parents = pc.list_parent_indices(token_lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(token_lists)
    nonempty = pc.not_equal(pc.utf8_length(flat), 0)
    mask = nonempty.to_numpy(zero_copy_only=False)
    return parents[mask], flat.filter(nonempty)


def term_counts_table(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Batch transform: documents -> (term, doc_id, tf, dl) triples.

    ``dl`` (document length in tokens) is attached to every triple of the
    document so posting lists can embed it — BM25 then needs no separate
    doc-stats lookup at query time.

    Fully vectorized: Arrow tokenize + numpy lexsort/run-length counting.
    This is the hot stage of the index build (SURVEY.md §7 step 2).
    """
    n_rows = batch.num_rows
    if n_rows == 0:
        return _empty_triples(batch.schema.field(id_col).type)
    parents, flat = flat_tokens_arrow(batch[text_col])
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
    if len(parents) == 0:
        return _empty_triples(batch.schema.field(id_col).type)
    # dl per input row (token count), mapped back through parent indices.
    dl_per_row = np.bincount(parents, minlength=n_rows).astype(np.int32)

    # Count (row, term) pairs: dictionary-encode terms to ints, then a
    # single lexsort + run-length encode. Avoids pandas and Python dicts.
    dict_arr = flat.dictionary_encode()
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    term_codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary  # unique terms in this batch

    # Composite key: parent_row * |vocab| + term_code (fits int64 for any
    # realistic batch: rows < 2**31, vocab < 2**31).
    key = parents.astype(np.int64) * len(vocab) + term_codes
    key.sort(kind="stable")
    boundaries = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(key)]))
    tf = (ends - starts).astype(np.int32)
    uniq = key[starts]
    row_of = (uniq // len(vocab)).astype(np.int64)
    code_of = uniq % len(vocab)

    return pa.table(
        {
            "term": vocab.take(pa.array(code_of)),
            "doc_id": pa.array(doc_ids[row_of], type=pa.int64()),
            "tf": pa.array(tf, type=pa.int32()),
            "dl": pa.array(dl_per_row[row_of], type=pa.int32()),
        }
    )


def _empty_triples(id_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.int64()),
            "tf": pa.array([], type=pa.int32()),
            "dl": pa.array([], type=pa.int32()),
        }
    )


def doc_lengths_table(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Batch transform: documents -> (doc_id, dl) token counts."""
    parents, _ = flat_tokens_arrow(batch[text_col])
    dl = np.bincount(parents, minlength=batch.num_rows).astype(np.int64)
    return pa.table({id_col: batch[id_col], "dl": pa.array(dl)})


class TermCounter:
    """Actor-pool form of :func:`term_counts_table` for ``map_batches``.

    Stateless today, but shaped as a callable class so analyzer config
    (stopword lists, alternative split patterns) is compiled once per actor
    (reference: loader construction at ``search.rs:32-40``).
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return term_counts_table(batch, self.text_col, self.id_col)
