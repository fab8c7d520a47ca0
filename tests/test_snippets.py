"""Query snippet extraction (:mod:`lsearch_ray.functions.snippets`) —
hand fixtures for the selection rule plus a pure-Python brute force on
a randomized corpus."""

from __future__ import annotations

import random
import re

import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.functions import snippets_ds


def _tok(t: str) -> list[str]:
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _ref(texts, query, w):
    q = sorted(set(_tok(query)))
    out = {}
    for d, t in texts.items():
        ts = _tok(t)
        if not ts:
            continue
        best = None
        for i in range(max(len(ts) - w, 0) + 1):
            win = ts[i : i + w]
            sc = sum(1 for x in q if x in win)
            if best is None or sc > best[0]:
                best = (sc, i)
        if best[0] >= 1:
            i = best[1]
            out[d] = (i + 1, best[0], " ".join(ts[i : i + w]))
    return out


def _run(texts, query, w):
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": [texts[k] for k in sorted(texts)],
        }
    )
    df = snippets_ds(rd.from_arrow(t), query, window=w).to_pandas()
    return {
        int(r.doc_id): (int(r.start), int(r.n_terms), r.snippet)
        for r in df.itertuples()
    }


def test_hand_fixture():
    texts = {
        1: "x x x scan y merge y y sort z z z",  # all 3 terms in one window
        2: "scan a b c d e f g h i j k l scan",  # term only at edges
        3: "no matching words at all in here",
        4: "",  # empty doc never appears
        5: "sort",  # shorter than the window: whole doc
    }
    got = _run(texts, "scan merge sort", 10)
    assert set(got) == {1, 2, 5}
    # doc 1: window starting at 'scan' (pos 4) holds scan+merge+sort
    assert got[1][1] == 3 and "scan" in got[1][2] and "sort" in got[1][2]
    # doc 2: two windows tie at 1 term -> leftmost (start 1)
    assert got[2] == (1, 1, "scan a b c d e f g h i")
    assert got[5] == (1, 1, "sort")
    assert got == _ref(texts, "scan merge sort", 10)


def test_leftmost_tie_and_distinctness():
    # repeated term counts ONCE (distinct terms, not occurrences)
    texts = {1: "scan scan scan scan b c d e f g h merge sort"}
    got = _run(texts, "scan merge sort", 5)
    # best window must include merge+sort (2 distinct) over scan-only (1)
    assert got[1][1] >= 2
    assert got == _ref(texts, "scan merge sort", 5)


def test_empty_query_raises():
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
    with pytest.raises(ValueError):
        snippets_ds(rd.from_arrow(t), "!!! ???", window=5)


def test_randomized_vs_bruteforce():
    rng = random.Random(17)
    vocab = [f"v{i}" for i in range(15)] + ["scan", "merge", "sort"]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for d in range(60)
    }
    for w in (3, 10):
        assert _run(texts, "scan merge sort", w) == _ref(
            texts, "scan merge sort", w
        )
