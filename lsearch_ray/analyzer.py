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


def parse_query(query: str) -> tuple[list[str], list[str]]:
    """Query syntax: whitespace-separated clauses; a ``-`` prefix excludes.

    ``"data -spark"`` → include ``[data]``, exclude ``[spark]``. Both sides
    go through the analyzer; results are deduped and sorted (the
    determinism contract for scoring order). Generalizes the reference's
    ``Not``/``Hasnt`` operators (search.rs:216-231, 250-265) to the query
    language: an excluded doc is dropped even if it matches every other
    clause (conjunctive drop, cli.rs:405-408).
    """
    inc: list[str] = []
    exc: list[str] = []
    for clause in query.split():
        if clause.startswith("-") and len(clause) > 1:
            exc.extend(tokenize(clause[1:]))
        else:
            inc.extend(tokenize(clause))
    return sorted(set(inc)), sorted(set(exc))


_PHRASE_RE = re.compile(r'(-?)"([^"]*)"')


def parse_query_full(
    query: str,
) -> tuple[list[str], list[str], list[list[str]], list[list[str]]]:
    """Extended query grammar: ``parse_query`` plus quoted phrases.

    ``'"exact phrase" loose -banned -"bad phrase"'`` →
    (include terms, exclude terms, phrases, negated phrases).

    Phrase words COUNT as include terms (they contribute BM25 like any
    term); the phrase itself additionally restricts results to docs
    containing the exact adjacent sequence. A quoted single word is just
    a term. Unquoted text behaves exactly as :func:`parse_query`.
    """
    phrases: list[list[str]] = []
    neg_phrases: list[list[str]] = []

    def strip(m: re.Match) -> str:
        toks = tokenize(m.group(2))
        if not toks:
            return " "
        if m.group(1) == "-":
            if len(toks) == 1:
                return f" -{toks[0]} "
            neg_phrases.append(toks)
            return " "
        if len(toks) == 1:
            return f" {toks[0]} "
        phrases.append(toks)
        # phrase words also score as ordinary terms
        return " " + " ".join(toks) + " "

    rest = _PHRASE_RE.sub(strip, query)
    inc, exc = parse_query(rest)
    return inc, exc, phrases, neg_phrases


def term_counts(text: str) -> dict[str, int]:
    """Pure-Python reference term-frequency map for one document."""
    counts: dict[str, int] = {}
    for tok in tokenize(text):
        counts[tok] = counts.get(tok, 0) + 1
    return counts


def term_positions(text: str) -> dict[str, list[int]]:
    """Pure-Python reference: term → ascending token positions."""
    out: dict[str, list[int]] = {}
    for i, tok in enumerate(tokenize(text)):
        out.setdefault(tok, []).append(i)
    return out


# byte classes for the fast tokenizer: [a-z0-9] after ascii_lower; every
# non-ASCII byte (>= 0x80, i.e. inside any multibyte UTF-8 sequence) is a
# separator — identical splitting to the codepoint regex, since no
# non-ASCII codepoint matches [a-z0-9].
_TOKEN_BYTE = np.zeros(256, dtype=bool)
for _b in range(ord("a"), ord("z") + 1):
    _TOKEN_BYTE[_b] = True
for _b in range(ord("0"), ord("9") + 1):
    _TOKEN_BYTE[_b] = True


def flat_tokens_arrow(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, pa.Array]:
    """Vectorized tokenize of a string column.

    Returns ``(parent_row_indices, flat_token_array)`` where
    ``parent_row_indices[i]`` is the row of ``texts`` that produced flat
    token ``i``. No Python per-row loop: byte-level run detection in numpy
    directly over the Arrow buffer (measured ~5× faster than the
    ``split_pattern_regex`` kernel; parity fuzz-tested against the
    pure-Python tokenizer and :func:`flat_tokens_regex`).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    empty = (
        np.empty(0, dtype=np.int64),
        pa.array([], type=pa.large_string()),
    )
    if n == 0:
        return empty
    lowered = pc.ascii_lower(texts).cast(pa.large_utf8())
    off0 = lowered.offset
    offsets = np.frombuffer(
        lowered.buffers()[1], dtype=np.int64, count=n + 1 + off0
    )[off0:]
    buf = np.frombuffer(lowered.buffers()[2], dtype=np.uint8)
    lo, hi = int(offsets[0]), int(offsets[-1])
    if hi == lo:
        return empty
    d = buf[lo:hi]
    istok = _TOKEN_BYTE[d]
    starts_rel = (offsets[:-1] - lo).astype(np.int64)
    doc_starts = starts_rel[starts_rel < len(d)]
    prev = np.empty_like(istok)
    prev[0] = False
    prev[1:] = istok[:-1]
    prev[doc_starts] = False  # a token never spans a document boundary
    tok_start = np.flatnonzero(istok & ~prev)
    if len(tok_start) == 0:
        return empty
    nxt = np.empty_like(istok)
    nxt[-1] = False
    nxt[:-1] = istok[1:]
    inner_doc_starts = doc_starts[doc_starts > 0]
    nxt[inner_doc_starts - 1] = False
    tok_end = np.flatnonzero(istok & ~nxt) + 1
    lengths = tok_end - tok_start
    parents = np.searchsorted(offsets, tok_start + lo, side="right") - 1
    out_off = np.concatenate(([0], np.cumsum(lengths)))
    # the concatenated token bytes are exactly the token-class bytes in
    # stream order (tokens are maximal runs), so a boolean compress
    # replaces the index-array gather (measured ~5× faster on this step)
    flat = pa.Array.from_buffers(
        pa.large_utf8(),
        len(lengths),
        [None, pa.py_buffer(out_off), pa.py_buffer(d[istok])],
    )
    return parents.astype(np.int64), flat


def flat_tokens_regex(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, pa.Array]:
    """The Arrow-regex reference implementation (slow path, kept for
    cross-checking the byte-level fast path)."""
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
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: bool = False,
) -> pa.Table:
    """Batch transform: documents -> (term, doc_id, tf, dl[, pos]) triples.

    ``dl`` (document length in tokens) is attached to every triple of the
    document so posting lists can embed it — BM25 then needs no separate
    doc-stats lookup at query time. With ``positions=True`` each triple
    also carries ``pos``: the ascending within-document token positions of
    that term's occurrences (``len(pos) == tf``) — the payload phrase
    queries need.

    Fully vectorized: Arrow tokenize + numpy lexsort/run-length counting.
    This is the hot stage of the index build (SURVEY.md §7 step 2).
    """
    n_rows = batch.num_rows
    if n_rows == 0:
        return _empty_triples(batch.schema.field(id_col).type, positions)
    parents, flat = flat_tokens_arrow(batch[text_col])
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
    if len(parents) == 0:
        return _empty_triples(batch.schema.field(id_col).type, positions)
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
    if positions:
        # stable argsort keeps original (= position) order within each
        # (doc, term) group, so the grouped values are ascending positions
        order = np.argsort(key, kind="stable")
        key = key[order]
    else:
        key.sort(kind="stable")
    boundaries = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(key)]))
    tf = (ends - starts).astype(np.int32)
    uniq = key[starts]
    row_of = (uniq // len(vocab)).astype(np.int64)
    code_of = uniq % len(vocab)

    cols = {
        "term": vocab.take(pa.array(code_of)),
        "doc_id": pa.array(doc_ids[row_of], type=pa.int64()),
        "tf": pa.array(tf, type=pa.int32()),
        "dl": pa.array(dl_per_row[row_of], type=pa.int32()),
    }
    if positions:
        # dl_per_row IS bincount(parents) — no second pass over the stream
        doc_starts = np.concatenate(
            ([0], np.cumsum(dl_per_row.astype(np.int64)))
        )[:-1]
        within_doc = np.arange(len(parents), dtype=np.int64) - doc_starts[parents]
        pos_flat = within_doc[order].astype(np.int32)
        offsets = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))
        cols["pos"] = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(pos_flat, type=pa.int32()),
        )
    return pa.table(cols)


def _empty_triples(id_type: pa.DataType, positions: bool = False) -> pa.Table:
    cols = {
        "term": pa.array([], type=pa.string()),
        "doc_id": pa.array([], type=pa.int64()),
        "tf": pa.array([], type=pa.int32()),
        "dl": pa.array([], type=pa.int32()),
    }
    if positions:
        cols["pos"] = pa.array([], type=pa.large_list(pa.int32()))
    return pa.table(cols)


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
