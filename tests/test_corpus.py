"""Corpus generator + extraction invariant (FIXTURES.md §1).

The per-row invariant from ``BASELINE.json.input_hint``: extracted text is
byte-identical per url — here checked for both the pure-Python extractor
and the vectorized Arrow batch extractor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.corpus import (
    assign_doc_ids,
    extract_text,
    extract_text_batch,
    extract_title,
    fnv1a64,
    make_corpus,
    make_html,
    normalize_url_batch,
)


def test_corpus_deterministic():
    a = make_corpus(200, seed=42)
    b = make_corpus(200, seed=42)
    assert a.equals(b)
    c = make_corpus(200, seed=7)
    assert not a.equals(c)


def test_schema_matches_input_hint():
    t = make_corpus(10)
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert t.schema.field("url").type == pa.string()
    assert t.schema.field("warc_ts").type == pa.timestamp("us")
    assert t.schema.field("html").type == pa.binary()
    assert t.schema.field("text").type == pa.string()
    assert t.schema.field("lang").type == pa.string()


def test_extract_text_byte_identical():
    t = make_corpus(300)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(html) == text
        assert extract_text(html).encode("utf-8") in html


def test_extract_text_batch_matches_python():
    t = make_corpus(300)
    out = extract_text_batch(t)
    assert out["text_extracted"].to_pylist() == t["text"].to_pylist()


def test_extract_title():
    html = make_html("my title", "body words")
    assert extract_title(html) == "my title"
    assert extract_text(html) == "body words"


def test_extract_bad_html_raises():
    import pytest

    with pytest.raises(ValueError):
        extract_text(b"not the template")


def test_url_normalization_dedups_variants():
    t = normalize_url_batch(make_corpus(1000))
    urls = t["url"].to_pylist()
    norm = t["url_norm"].to_pylist()
    # generator injects ~3% http://...#frag duplicates of earlier urls
    assert len(set(urls)) == len(urls)  # raw urls unique
    assert len(set(norm)) < len(norm)  # normalization reveals dups
    for u, n in zip(urls, norm):
        assert n.startswith("https://")
        assert "#" not in n


def test_doc_ids_stable_and_distinct_per_norm_url():
    t = assign_doc_ids(make_corpus(1000))
    norm = t["url_norm"].to_pylist()
    ids = t["doc_id"].to_pylist()
    mapping: dict[str, int] = {}
    for n, i in zip(norm, ids):
        assert mapping.setdefault(n, i) == i  # same norm url -> same id
    # distinct norm urls -> distinct ids (no collisions at this scale)
    inv: dict[int, str] = {}
    for n, i in mapping.items():
        assert inv.setdefault(i, n) == n
    assert all(i >= 0 for i in ids)


def test_fnv1a64_known_vector():
    # FNV-1a 64 of "a" is 0xaf63dc4c8601ec8c; masked to 63 bits.
    got = fnv1a64(pa.array(["a"]))[0]
    assert got == (0xAF63DC4C8601EC8C & 0x7FFFFFFFFFFFFFFF)
    assert fnv1a64(pa.array([], type=pa.string())).shape == (0,)
    # empty string hashes to the offset basis
    got_empty = fnv1a64(pa.array([""]))[0]
    assert got_empty == (0xCBF29CE484222325 & 0x7FFFFFFFFFFFFFFF)


def test_zipf_head_skew_present():
    """Head-term skew must exist so the salted-shuffle path is exercised."""
    from lsearch_ray.analyzer import term_counts

    t = make_corpus(500)
    counts: dict[str, int] = {}
    for text in t["text"].to_pylist():
        for term, c in term_counts(text).items():
            counts[term] = counts.get(term, 0) + c
    freq = sorted(counts.values(), reverse=True)
    assert freq[0] > 10 * np.median(freq)
