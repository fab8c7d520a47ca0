"""Reference operator truth table (FIXTURES.md §3, README.md:44-92)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.stages import ContentRun, ScoreOp, explain, op_scores, run_pipeline
from lsearch_ray.stages.ops import resolve_content

CONTENT = pa.array(["Hello there!", "aXbXc", "txt", "hello", ""])


def scores(kind, target, insensitive=False):
    return list(op_scores(CONTENT, ScoreOp(kind, target), insensitive))


def test_is():
    assert scores("is", "txt") == [0.0, 0.0, 1.0, 0.0, 0.0]


def test_not():
    assert scores("not", "txt") == [1.0, 1.0, 0.0, 1.0, 1.0]


def test_has():
    assert scores("has", "there") == [1.0, 0.0, 0.0, 0.0, 0.0]


def test_hasnt():
    assert scores("hasnt", "there") == [0.0, 1.0, 1.0, 1.0, 1.0]


def test_more_counts_non_overlapping():
    assert scores("more", "X") == [1.0, 3.0, 1.0, 1.0, 1.0]
    # Rust str::matches is non-overlapping: "aaa".matches("aa") == 1
    assert list(op_scores(pa.array(["aaa"]), ScoreOp("more", "aa"), False)) == [2.0]


def test_insensitive_folds_both_sides():
    # reference lowercases content AND target (cli.rs:384-386, cli.rs:397)
    assert scores("has", "HELLO", insensitive=True) == [1.0, 0.0, 0.0, 1.0, 0.0]
    assert scores("is", "Hello", insensitive=True) == [0.0, 0.0, 0.0, 1.0, 0.0]


def test_pass():
    assert scores("pass", "") == [1.0] * 5


def test_more_with_regex_special_target():
    assert list(op_scores(pa.array(["a.b.c"]), ScoreOp("more", "."), False)) == [3.0]


def test_conjunction_and_sum():
    """Two filters + more → score = 1 + 1 + (1 + tf); any <1 drops
    (cli.rs:395-408)."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["the cat the", "dog", "the dog the cat the"],
        }
    )
    ds = rd.from_arrow(t)
    run = ContentRun(
        "text",
        (ScoreOp("has", "cat"), ScoreOp("hasnt", "bird"), ScoreOp("more", "the")),
        insensitive=True,
    )
    out = run_pipeline(ds, [run], id_col="doc_id").take_all()
    assert [(r["doc_id"], r["score"]) for r in out] == [(3, 6.0), (1, 5.0)]


def test_run_chaining_keeps_last_score():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["aa bb", "aa", "bb"],
            "ext": ["rs", "rs", "py"],
        }
    )
    runs = [
        ContentRun("text", (ScoreOp("has", "aa"),)),
        ContentRun("ext", (ScoreOp("is", "rs"), ScoreOp("more", "r"))),
    ]
    out = run_pipeline(rd.from_arrow(t), runs, id_col="doc_id").take_all()
    # docs 1,2 survive run1; run2 keeps ext==rs; score = 1 + (1+1) = 3
    assert [(r["doc_id"], r["score"]) for r in out] == [(1, 3.0), (2, 3.0)]


def test_derived_title_and_ext_loaders():
    t = pa.table({"url": ["https://a.example/dir/page.html", "https://b.example/x"]})
    assert resolve_content(t, "title").to_pylist() == ["page.html", "x"]
    assert resolve_content(t, "ext").to_pylist() == ["html", ""]


def test_callable_loader():
    t = pa.table({"a": ["x"], "b": ["y"]})
    got = resolve_content(t, lambda b: pa.compute.binary_join_element_wise(b["a"], b["b"], "-"))
    assert got.to_pylist() == ["x-y"]


def test_unknown_loader_raises():
    with pytest.raises(KeyError):
        resolve_content(pa.table({"a": ["x"]}), "nope")


def test_explain():
    s = explain([ContentRun("text", (ScoreOp("has", "x"),), insensitive=False)])
    assert "load[text]" in s and "has(x)" in s and "sensitive" in s


def test_topk_limit():
    t = pa.table(
        {
            "doc_id": pa.array(range(20), type=pa.int64()),
            "text": [f"{'x ' * (i % 5)}end" for i in range(20)],
        }
    )
    out = run_pipeline(
        rd.from_arrow(t),
        [ContentRun("text", (ScoreOp("more", "x"),))],
        id_col="doc_id",
        k=3,
    ).take_all()
    assert len(out) == 3
    assert [r["score"] for r in out] == [5.0, 5.0, 5.0]
    assert [r["doc_id"] for r in out] == [4, 9, 14]  # tie -> doc_id asc
