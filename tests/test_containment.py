"""Containment / overlap-coefficient near-dup pairs
(:mod:`lsearch_ray.functions.containment`) — pure-Python brute-force
reference (string shingles, all pairs) on corpora with engineered
subset duplication."""

from __future__ import annotations

import random
import re

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.containment import containment_pairs_ds


def _ref(texts: dict[int, str], ngram: int, thr_micro: int, max_df: int):
    sh = {}
    for d, t in texts.items():
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        sh[d] = {
            tuple(toks[i : i + ngram])
            for i in range(len(toks) - ngram + 1)
        }
    df = {}
    for s in set().union(*sh.values()) if sh else set():
        df[s] = sum(1 for d in sh if s in sh[d])
    out = []
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = sh[a] & sh[b]
            if not any(2 <= df[s] <= max_df for s in shared):
                continue  # candidate rule: ≥1 df-capped shared shingle
            mn = min(len(sh[a]), len(sh[b]))
            if mn == 0:
                continue
            cont = (len(shared) * 1_000_000) // mn
            if cont >= thr_micro:
                out.append((a, b, len(shared), cont))
    return out


def _run(texts: dict[int, str], **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), type=pa.int64()),
                "text": [texts[k] for k in sorted(texts)],
            }
        )
    )
    df = containment_pairs_ds(ds, **kw).to_pandas()
    return [
        (int(r["a"]), int(r["b"]), int(r["n_inter"]), int(r["cont_micro"]))
        for _, r in df.iterrows()
    ]


def test_subset_duplication_detected():
    base = "one two three four five six seven eight nine ten"
    texts = {
        1: base,
        # 1 fully contained in 2: containment 1.0, Jaccard only ~0.4
        2: "intro words here " + base + " trailing content after the quote",
        3: "completely different text with no overlap at all whatsoever",
    }
    got = _run(texts, threshold_micro=900_000)
    assert got == _ref(texts, 5, 900_000, 64)
    assert [(a, b) for a, b, *_ in got] == [(1, 2)]
    assert got[0][3] == 1_000_000  # exact subset


def test_short_docs_never_pair():
    texts = {1: "a b c d", 2: "a b c d", 3: "x"}  # < 5 tokens each
    assert _run(texts) == []


def test_randomized_against_reference():
    rng = random.Random(21)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for d in range(40):
        texts[d] = " ".join(
            rng.choice(vocab) for _ in range(rng.randrange(0, 25))
        )
    # engineered containments: doc 100+k embeds doc k's text
    for k in range(6):
        texts[100 + k] = (
            texts[k] + " " + " ".join(rng.choice(vocab) for _ in range(8))
        )
    got = _run(texts, threshold_micro=500_000)
    assert got == _ref(texts, 5, 500_000, 64)


def test_max_df_boilerplate_cap():
    # one shingle shared by MANY docs (df > max_df) must not form
    # candidates on its own
    boiler = "alpha beta gamma delta epsilon"
    texts = {d: boiler for d in range(10)}
    got = _run(texts, max_df=4)
    assert got == _ref(texts, 5, 500_000, 4) == []
    # with the cap lifted the same corpus is all-pairs duplicated
    got2 = _run(texts, max_df=64)
    assert len(got2) == 45 and all(c == 1_000_000 for *_, c in got2)
