"""Lexicon topic tagging (:mod:`lsearch_ray.functions.lexicon`) —
hand fixtures for the tag tiebreak/zero rules plus a pure-Python
brute-force reference on a randomized corpus."""

from __future__ import annotations

import random
import re

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.lexicon import lexicon_tag_ds

_LEX = {
    "b_topic": ["beta", "shared"],
    "a_topic": ["alpha", "shared"],
    "c_topic": ["gamma"],
}


def _ref(texts: dict[int, str], lexicon: dict[str, list[str]]):
    topics = sorted(lexicon)
    sets = {t: set(lexicon[t]) for t in topics}
    out = {}
    for d, txt in texts.items():
        toks = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        counts = [sum(tok in sets[t] for tok in toks) for t in topics]
        mx = max(counts) if counts else 0
        tag = topics[counts.index(mx)] if mx > 0 else "none"
        out[d] = (counts, tag)
    return topics, out


def _run(texts: dict[int, str], lexicon):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), type=pa.int64()),
                "text": [texts[k] for k in sorted(texts)],
            }
        )
    )
    return lexicon_tag_ds(ds, lexicon).sort("doc_id").to_pandas()


def _check(texts, lexicon):
    topics, ref = _ref(texts, lexicon)
    df = _run(texts, lexicon)
    assert list(df.columns) == ["doc_id"] + [f"{t}_n" for t in topics] + [
        "tag"
    ]
    for _, row in df.iterrows():
        counts, tag = ref[int(row["doc_id"])]
        assert [int(row[f"{t}_n"]) for t in topics] == counts
        assert row["tag"] == tag


def test_hand_fixture_tiebreak_and_zero():
    texts = {
        1: "alpha beta shared",  # a=2 b=2 c=0 → tie → 'a_topic'
        2: "beta beta gamma",  # b=2 c=1 → 'b_topic'
        3: "nothing here",  # all zero → 'none'
        4: "",  # token-less → 'none'
        5: "GAMMA, gamma; Gamma!",  # case-fold + multiset count = 3
    }
    _check(texts, _LEX)
    df = _run(texts, _LEX)
    assert list(df["tag"]) == ["a_topic", "b_topic", "none", "none", "c_topic"]
    assert int(df.loc[df["doc_id"] == 5, "c_topic_n"].iloc[0]) == 3


def test_randomized_against_reference():
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "shared", "x1", "y2"]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30)))
        for d in range(60)
    }
    _check(texts, _LEX)


def test_empty_lexicon_rejected():
    import pytest

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": ["a"]})
    )
    with pytest.raises(ValueError):
        lexicon_tag_ds(ds, {})
