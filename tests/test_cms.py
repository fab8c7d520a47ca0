"""Count-Min Sketch term counts
(:func:`lsearch_ray.functions.sketches.cms_term_counts_ds`) — a
pure-Python CMS reference replaying the same hash kernel, the
one-sided-error property, and block-split invariance (mergeability)."""

from __future__ import annotations

import random
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.corpus import fnv1a64
from lsearch_ray.functions.sketches import cms_hash_params, cms_term_counts_ds

_P = (1 << 61) - 1


def _ref_cms(texts: list[str], k: int, depth: int, width: int, seed: int):
    a, b = cms_hash_params(depth, seed)
    toks: list[str] = []
    for t in texts:
        toks += [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
    cnt = Counter(toks)
    terms = sorted(cnt)
    h = fnv1a64(pa.array(terms, type=pa.large_string()))
    sketch = np.zeros((depth, width), dtype=np.int64)
    bkt = {}
    for term, x in zip(terms, h.astype(np.uint64)):
        xm = int(x) % _P
        bkt[term] = [
            ((int(a[j]) * xm + int(b[j])) % _P) % width for j in range(depth)
        ]
        for j in range(depth):
            sketch[j, bkt[term][j]] += cnt[term]
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        (t, c, int(min(sketch[j, bkt[t][j]] for j in range(depth))))
        for t, c in top
    ]


def _mk_ds(texts: list[str], blocks: int = 1):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_against_python_reference_and_one_sided():
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for _ in range(120)
    ]
    got = (
        cms_term_counts_ds(_mk_ds(texts), k=10, depth=3, width=16, seed=99)
        .to_pandas()
    )
    ref = _ref_cms(texts, 10, 3, 16, 99)
    assert [
        (r["term"], int(r["exact_n"]), int(r["cms_est"]))
        for _, r in got.iterrows()
    ] == ref
    # one-sided error: the sketch never undercounts
    assert (got["cms_est"] >= got["exact_n"]).all()
    # width 16 over 40 terms MUST collide somewhere (sanity the test bites)
    assert (got["cms_est"] > got["exact_n"]).any()


def test_wide_sketch_is_exact():
    texts = ["alpha beta beta", "gamma alpha", "beta"]
    got = (
        cms_term_counts_ds(_mk_ds(texts), k=5, depth=4, width=4096, seed=7)
        .to_pandas()
    )
    assert list(got["term"]) == ["beta", "alpha", "gamma"]
    assert list(got["exact_n"]) == [3, 2, 1]
    assert list(got["cms_est"]) == list(got["exact_n"])


def test_block_split_invariance():
    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30)))
        for _ in range(90)
    ]
    one = cms_term_counts_ds(_mk_ds(texts, 1), k=8, width=32).to_pandas()
    many = cms_term_counts_ds(_mk_ds(texts, 7), k=8, width=32).to_pandas()
    assert one.equals(many)
