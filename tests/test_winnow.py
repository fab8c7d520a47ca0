"""Winnowing fingerprints (:mod:`lsearch_ray.functions.winnow`) —
pure-Python reference on randomized corpora plus hand fixtures for the
selection rule's edges (rightmost tie-break, short docs, window span)."""

from __future__ import annotations

import random
import re

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions import winnow_dup_pairs_ds, winnow_fingerprints_ds

_MULT = 0x9E3779B97F4A7C15
_M64 = 1 << 64
_M63 = (1 << 63) - 1


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _h63(s: str) -> int:
    h = 14695981039346656037
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) % _M64
    return h & _M63


def _ref_fps(text: str, k: int, w: int) -> list[tuple[int, int]]:
    hs = [_h63(t) for t in _tok(text)]
    m = len(hs) - k + 1
    if m <= 0:
        return []
    kh = []
    for i in range(m):
        acc = hs[i]
        for j in range(1, k):
            acc = ((acc * _MULT) % _M64) ^ hs[i + j]
        kh.append(acc & _M63)
    sel = set()
    for s in range(0, m - w + 1):
        win = kh[s : s + w]
        mn = min(win)
        j = max(i for i, v in enumerate(win) if v == mn)
        sel.add((s + j + 1, kh[s + j]))
    return sorted(sel)


def _ref_pairs(texts, k, w, min_shared, max_df):
    from collections import Counter

    sets = {d: {fp for _, fp in _ref_fps(t, k, w)} for d, t in texts.items()}
    df = Counter(fp for s in sets.values() for fp in s)
    out = {}
    docs = sorted(sets)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            n = sum(1 for fp in sets[a] & sets[b] if 2 <= df[fp] <= max_df)
            if n >= min_shared:
                out[(a, b)] = n
    return out


def _ds(texts):
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": [texts[k] for k in sorted(texts)],
        }
    )
    return rd.from_arrow(t)


def _check(texts, k=4, w=4, min_shared=2, max_df=64):
    ds = _ds(texts)
    fps = winnow_fingerprints_ds(ds, k=k, w=w).to_pandas()
    for d, t in texts.items():
        got = [
            (int(r.pos), int(r.fp))
            for r in fps[fps.doc_id == d].itertuples()
        ]
        assert got == _ref_fps(t, k, w), f"fps doc {d}"
    pairs = winnow_dup_pairs_ds(
        ds, k=k, w=w, min_shared=min_shared, max_df=max_df
    ).to_pandas()
    got = {(int(r.a), int(r.b)): int(r.n_shared) for r in pairs.itertuples()}
    assert got == _ref_pairs(texts, k, w, min_shared, max_df)


def test_shared_run_guarantee():
    # t = k + w - 1 = 7: a shared 8-token run MUST yield >= 1 shared
    # fingerprint (the winnowing guarantee)
    run = "q1 q2 q3 q4 q5 q6 q7 q8"
    texts = {
        1: f"alpha beta {run} gamma delta",
        2: f"{run} omega psi chi phi",
        3: "totally unrelated words flowing here without any overlap at all",
    }
    ds = _ds(texts)
    fps = winnow_fingerprints_ds(ds).to_pandas()
    s1 = set(fps[fps.doc_id == 1].fp)
    s2 = set(fps[fps.doc_id == 2].fp)
    s3 = set(fps[fps.doc_id == 3].fp)
    assert s1 & s2, "shared 8-token run produced no shared fingerprint"
    assert not (s1 & s3) and not (s2 & s3)
    _check(texts)


def test_short_docs_emit_nothing():
    texts = {
        1: "a b c",            # < k tokens: no k-grams
        2: "a b c d e f",      # m = 3 k-grams < w: no full window
        3: "",                 # empty
        4: "a b c d e f g",    # m = 4 = w: exactly one window
    }
    ds = _ds(texts)
    fps = winnow_fingerprints_ds(ds).to_pandas()
    assert set(fps.doc_id) == {4}
    assert len(fps) == 1
    _check(texts)


def test_density_bound():
    # winnowing keeps ~2/(w+1) of positions; it must never select more
    # than one fingerprint per window worth of new positions
    rng = random.Random(5)
    words = " ".join(f"t{rng.randrange(10000)}" for _ in range(400))
    texts = {1: words}
    fps = winnow_fingerprints_ds(_ds(texts)).to_pandas()
    n_kgrams = 400 - 4 + 1
    assert 0 < len(fps) <= n_kgrams - 4 + 1
    # distinct hashes: expected density around 2/(w+1) = 0.4
    assert len(fps) / n_kgrams < 0.6
    _check(texts)


def test_randomized_vs_bruteforce():
    rng = random.Random(901)
    vocab = [f"w{i}" for i in range(25)]  # small vocab forces hash ties
    shared = " ".join(rng.choice(vocab) for _ in range(12))
    texts = {}
    for d in range(35):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 40))]
        if d % 5 == 0:
            p = rng.randrange(0, len(words) + 1)
            words[p:p] = shared.split()
        texts[d] = " ".join(words)
    _check(texts, k=3, w=5, min_shared=1, max_df=32)
    _check(texts, k=4, w=4, min_shared=2, max_df=64)
