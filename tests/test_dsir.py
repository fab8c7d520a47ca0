"""DSIR hashed importance weights: sequential replay of the integer
micro-nat contract (functions/dsir.py)."""

import math

import numpy as np
import pyarrow as pa


def _reference(texts, langs, buckets):
    import re

    from lsearch_ray.functions.sampling import _key_hash63

    ct = np.zeros(buckets, dtype=np.int64)
    cr = np.zeros(buckets, dtype=np.int64)
    per = []
    for t, lang in zip(texts, langs):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        if not toks:
            per.append(None)
            continue
        bk = _key_hash63(pa.array(toks, pa.large_string())) % buckets
        counts = np.bincount(bk, minlength=buckets).astype(np.int64)
        per.append(counts)
        cr += counts
        if lang == "en":
            ct += counts
    tt, tr = int(ct.sum()), int(cr.sum())
    delta = np.array(
        [
            math.floor(
                (
                    math.log((int(ct[b]) + 1) / (tt + buckets))
                    - math.log((int(cr[b]) + 1) / (tr + buckets))
                )
                * 1e6
                + 0.5
            )
            for b in range(buckets)
        ],
        dtype=np.int64,
    )
    out = {}
    for i, counts in enumerate(per):
        if counts is None:
            continue
        out[i] = (int(counts.sum()), int((counts * delta).sum()))
    return out


def test_dsir_weights_match_sequential_replay():
    import ray.data as rd

    from lsearch_ray.functions.dsir import dsir_weights_ds

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "der schnelle braune fuchs springt",
        "the dog sleeps the dog eats",
        "le renard brun rapide saute",
        "",
        "quick quick quick dog",
    ]
    langs = ["en", "de", "en", "fr", "en", None]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    want = _reference(texts, langs, 16)
    got = (
        dsir_weights_ds(rd.from_arrow(tab).repartition(3), buckets=16)
        .to_pandas()
        .set_index("doc_id")
    )
    assert {
        int(i): (int(r["n_tokens"]), int(r["weight_micro"]))
        for i, r in got.iterrows()
    } == want
    # target-slice docs must skew positive relative to off-target ones:
    # every token of doc 2 is pure-English vocabulary shared with doc 0
    assert got.loc[2, "weight_micro"] > got.loc[1, "weight_micro"]
