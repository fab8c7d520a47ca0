"""Analyzer parity: pure-Python tokenizer == vectorized Arrow path.

The analyzer generalizes the reference's ``to_ascii_lowercase`` fold
(cli.rs:384-386) and ``More`` substring counting (search.rs:267-283) into
lowercase + [a-z0-9]+ token counting (SURVEY.md §2.3, §7 step 1).
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lsearch_ray.analyzer import (
    ascii_lower,
    flat_tokens_arrow,
    term_counts,
    term_counts_table,
    tokenize,
)


def test_tokenize_basic():
    assert tokenize("Hello there!") == ["hello", "there"]
    assert tokenize("a-b_c d9 X") == ["a", "b", "c", "d9", "x"]
    assert tokenize("") == []
    assert tokenize("!!!") == []


def test_ascii_lower_is_ascii_only():
    # Python str.lower would expand 'İ' to 'i̇' (adds an ASCII i); ours must not.
    assert ascii_lower("İ") == "İ"
    assert ascii_lower("ABCz9É") == "abcz9É"


def test_term_counts():
    assert term_counts("the cat the hat") == {"the": 2, "cat": 1, "hat": 1}


def _counts_from_table(texts: list[str]) -> list[dict[str, int]]:
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    out = term_counts_table(batch)
    per_doc: list[dict[str, int]] = [{} for _ in texts]
    for term, doc_id, tf in zip(
        out["term"].to_pylist(), out["doc_id"].to_pylist(), out["tf"].to_pylist()
    ):
        per_doc[doc_id][term] = tf
    return per_doc


def test_arrow_matches_python_simple():
    texts = ["Hello there!", "the cat THE hat", "", "x" * 10, "a b a b a"]
    assert _counts_from_table(texts) == [term_counts(t) for t in texts]


def test_dl_column():
    batch = pa.table({"doc_id": pa.array([7], type=pa.int64()), "text": ["a b a"]})
    out = term_counts_table(batch)
    assert set(out["dl"].to_pylist()) == {3}


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=12))
def test_arrow_matches_python_fuzz(texts):
    assert _counts_from_table(texts) == [term_counts(t) for t in texts]


def test_flat_tokens_parents():
    parents, flat = flat_tokens_arrow(pa.array(["a b", "", "c"]))
    assert list(parents) == [0, 0, 2]
    assert flat.to_pylist() == ["a", "b", "c"]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=10))
def test_fast_tokenizer_matches_regex_path(texts):
    from lsearch_ray.analyzer import flat_tokens_regex

    arr = pa.array(texts, type=pa.string())
    p_fast, f_fast = flat_tokens_arrow(arr)
    p_ref, f_ref = flat_tokens_regex(arr)
    assert list(p_fast) == list(p_ref)
    assert f_fast.to_pylist() == f_ref.to_pylist()


def test_fast_tokenizer_nulls_and_unicode():
    from lsearch_ray.analyzer import flat_tokens_regex

    arr = pa.array(["a b", None, "", "héllo wörld", "日本語 abc", "x"])
    p_fast, f_fast = flat_tokens_arrow(arr)
    p_ref, f_ref = flat_tokens_regex(arr)
    assert list(p_fast) == list(p_ref)
    assert f_fast.to_pylist() == f_ref.to_pylist()
