"""Deterministic synthetic Common-Crawl-style web-page corpus.

Per ``BASELINE.json.input_hint`` the engine's canonical input is a Parquet
table ``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.  This module synthesizes it at small scale (seed-fixed, no
wall clock, no external data) and defines the **extraction invariant**: for
every generated row, ``extract_text(html) == text`` byte-for-byte.  That
invariant stands in for the reference's whole-file read (``content-text``,
search.rs:99-123): the reference's "content" for a file is its exact bytes;
ours for a page is the exact text the generator embedded in the html
template.

Generation rules (FIXTURES.md §1):
- ``text``: Zipf-distributed tokens over a ~200-word vocabulary → natural
  head-term skew, exercising the salted-repartition path at scale.
- ``url``: unique per row; ~3% of rows are near-duplicate urls of an earlier
  row (http:// scheme + ``#frag``) so exact dedup by normalized url has work
  to do.
- ``warc_ts``: fixed epoch + i·Δ — no ``now()``.
- ``html``: a fixed template, exactly invertible by :func:`extract_text`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ~200-word deterministic vocabulary: a fixed themed head plus generated tails.
_HEAD_WORDS = [
    "the", "of", "and", "to", "a", "in", "is", "for", "on", "with",
    "data", "search", "index", "query", "ray", "web", "page", "text",
    "engine", "term", "score", "rank", "crawl", "parquet", "token",
    "biology", "chemistry", "physics", "history", "music",
]
_VOCAB = _HEAD_WORDS + [f"word{i:03d}" for i in range(200 - len(_HEAD_WORDS))]

_HTML_PREFIX = b"<html><head><title>"
_HTML_MID = b"</title></head><body><p>"
_HTML_SUFFIX = b"</p></body></html>"

_LANGS = ["en", "es", "zh", "de", "fr"]
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z, fixed
_TS_STEP_US = 1_000_000  # 1s per row


def make_html(title: str, text: str) -> bytes:
    """The fixed html template; its inverse is :func:`extract_text`."""
    return (
        _HTML_PREFIX
        + title.encode("utf-8")
        + _HTML_MID
        + text.encode("utf-8")
        + _HTML_SUFFIX
    )


def extract_text(html: bytes) -> str:
    """Extract body text from template html — byte-identical per url.

    Pure-Python reference extractor (the per-row invariant of
    ``BASELINE.json.input_hint``). Raises ``ValueError`` on non-template
    html rather than returning garbage (the reference panics on unreadable
    content, search.rs:112-116; we surface a typed error instead).
    """
    start = html.find(b"<p>")
    end = html.rfind(b"</p>")
    if start < 0 or end < 0 or end < start:
        raise ValueError("html does not match the corpus template")
    return html[start + 3 : end].decode("utf-8")


def extract_title(html: bytes) -> str:
    """Title extraction (reference ``content-title``, search.rs:42-60)."""
    start = html.find(b"<title>")
    end = html.find(b"</title>")
    if start < 0 or end < 0 or end < start:
        return ""
    return html[start + 7 : end].decode("utf-8")


def extract_text_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Vectorized extractor for ``map_batches(batch_format="pyarrow")``.

    Appends ``text_extracted:string``. Uses Arrow RE2 kernels — no Python
    loop over rows. Rows that don't match the template yield null (poisoned
    rows must not crash a distributed job; SURVEY.md §4 retries row).
    """
    as_str = batch[html_col].cast(pa.string())
    ext = pc.extract_regex(as_str, r"<p>(?P<text_extracted>.*)</p>")
    text = pc.struct_field(ext, "text_extracted")
    return batch.append_column("text_extracted", text)


def normalize_url_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``url_norm``: scheme folded to https, fragment stripped.

    Generalizes the reference's path canonicalization dedup key
    (cli.rs:454 — ``./x`` vs ``x``). Vectorized Arrow kernels.
    """
    u = batch[url_col]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    u = pc.replace_substring_regex(u, r"^http://", "https://")
    u = pc.replace_substring_regex(u, r"#.*$", "")
    return batch.append_column("url_norm", u)


def make_corpus(n_rows: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Deterministic CC-style table of ``n_rows`` pages.

    ``start`` offsets the global row index used for urls/timestamps, so a
    large corpus can be generated as independent deterministic chunks
    (chunk i: ``make_corpus(chunk, seed + i, start=i * chunk)``) in
    parallel Ray tasks — the scale path for bench corpora.
    """
    rng = np.random.RandomState(seed)
    # Zipf ranks over the vocabulary (shuffled so head words aren't simply
    # the first listed); clip to vocab size.
    vocab = np.array(_VOCAB)
    order = rng.permutation(len(vocab))
    zipf_ranks = rng.zipf(1.3, size=n_rows * 40)
    zipf_ranks = zipf_ranks[zipf_ranks <= len(vocab)] - 1
    doc_len = rng.randint(5, 60, size=n_rows)
    total = int(doc_len.sum())
    while len(zipf_ranks) < total:
        more = rng.zipf(1.3, size=total)
        zipf_ranks = np.concatenate([zipf_ranks, more[more <= len(vocab)] - 1])
    words = vocab[order[zipf_ranks[:total]]]
    offsets = np.concatenate(([0], np.cumsum(doc_len)))

    texts: list[str] = []
    titles: list[str] = []
    urls: list[str] = []
    langs: list[str] = []
    htmls: list[bytes] = []
    lang_idx = rng.randint(0, len(_LANGS), size=n_rows)
    dup_flags = rng.rand(n_rows) < 0.03
    for i in range(n_rows):
        gi = start + i
        toks = words[offsets[i] : offsets[i + 1]]
        text = " ".join(toks)
        title = " ".join(toks[:3]) if len(toks) else f"page {gi}"
        if i > 0 and dup_flags[i]:
            # near-duplicate url of an earlier page (scheme + fragment noise)
            j = rng.randint(0, i)
            url = urls[j].replace("https://", "http://", 1) + f"#frag{gi}"
        else:
            url = f"https://site{gi % 17}.example/{gi:09d}/{'-'.join(toks[:2]) if len(toks) >= 2 else 'p'}"
        texts.append(text)
        titles.append(title)
        urls.append(url)
        langs.append(_LANGS[lang_idx[i]])
        htmls.append(make_html(title, text))

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(
                [_EPOCH_US + (start + i) * _TS_STEP_US for i in range(n_rows)],
                type=pa.timestamp("us"),
            ),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_corpus(path: str, n_rows: int, seed: int = 42) -> str:
    """Write the synthetic corpus as one parquet file; returns the path."""
    import pyarrow.parquet as pq

    pq.write_table(make_corpus(n_rows, seed), path)
    return path


def assign_doc_ids(batch: pa.Table) -> pa.Table:
    """Stable doc_id = low-63-bit FNV-1a hash of the normalized url.

    Deterministic, order-independent, collision-improbable at test scale
    (collision probability ~n²/2⁶³). At 10^12-doc scale the dense-rank
    alternative (sort by url → row number) costs a global sort; hashing is
    the scale path (SURVEY.md §1.2).
    """
    if "url_norm" not in batch.column_names:
        batch = normalize_url_batch(batch)
    ids = fnv1a64(batch["url_norm"])
    return batch.append_column("doc_id", pa.array(ids, type=pa.int64()))


def fnv1a64(strings: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized FNV-1a 64-bit over a string column, masked to 63 bits.

    Iterates over BYTE POSITIONS (≤ max string length, ~50 for urls), with
    each step a numpy ufunc across all rows — no Python per-row loop. Runs
    on the raw Arrow offsets/data buffers, zero-copy.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    arr = strings.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # honor arr.offset: a zero-copy SLICE (Ray hands block slices to batch
    # fns) shares the parent's buffers — element i's offsets live at
    # buffer position arr.offset + i, and offset values index the shared
    # data buffer absolutely
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    prime = np.uint64(0x100000001B3)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for pos in range(max_len):
            active = lengths > pos
            idx = offsets[:-1][active] + pos
            b = data[idx].astype(np.uint64)
            h[active] = (h[active] ^ b) * prime
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
