"""Dunning log-likelihood keyness: sequential replay of the integer
micro-nat G2 contract (functions/keyness.py)."""

import math
import re
from collections import Counter

import pyarrow as pa


def _replay(texts, langs, k, min_count):
    a_c, b_c = Counter(), Counter()
    for t, lang in zip(texts, langs):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        (a_c if lang == "en" else b_c).update(toks)
    ta, tb = sum(a_c.values()), sum(b_c.values())
    rows = []
    for term in set(a_c) | set(b_c):
        a, b = a_c[term], b_c[term]
        if a + b < min_count:
            continue
        t1 = (
            math.floor(
                (math.log(a) - math.log(a + b) - math.log(ta) + math.log(ta + tb))
                * 1e6
                + 0.5
            )
            if a > 0
            else 0
        )
        t2 = (
            math.floor(
                (math.log(b) - math.log(a + b) - math.log(tb) + math.log(ta + tb))
                * 1e6
                + 0.5
            )
            if b > 0
            else 0
        )
        g2 = 2 * (a * t1 + b * t2)
        assoc = (a * tb > b * ta) - (a * tb < b * ta)
        rows.append((term, a, b, assoc, g2))
    rows.sort(key=lambda r: (-r[4], r[0]))
    return rows[:k]


def test_keyness_terms_match_sequential_replay():
    import ray.data as rd

    from lsearch_ray.functions.keyness import keyness_terms_ds

    texts = [
        "the quick brown fox the lazy dog the end",
        "the dog sleeps the dog eats the dog runs",
        "der schnelle braune fuchs der faule hund der hund",
        "le renard brun le chien le chat le chien",
        "",
        "quick quick dog fox fox fox",
    ]
    langs = ["en", "en", "de", "fr", "en", None]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    want = _replay(texts, langs, k=10, min_count=2)
    out = keyness_terms_ds(
        rd.from_arrow(tab).repartition(3), k=10, min_count=2
    )
    got = list(
        zip(
            out["term"].to_pylist(),
            out["a"].to_pylist(),
            out["b"].to_pylist(),
            out["assoc"].to_pylist(),
            out["g2_micro"].to_pylist(),
        )
    )
    assert got == want
    # direction sanity: 'der'/'le' are rest-only -> assoc −1 with a = 0
    by_term = {r[0]: r for r in got}
    for term in ("der", "le"):
        if term in by_term:
            assert by_term[term][1] == 0 and by_term[term][3] == -1


def test_slice_jaccard_exact_sets():
    import ray.data as rd

    from lsearch_ray.functions.keyness import slice_jaccard_ds

    texts = [
        "alpha beta gamma delta",     # en: grams abg, bgd
        "alpha beta gamma epsilon",   # de: grams abg, bge
        "zeta eta theta",             # fr: gram zet
        "alpha beta gamma delta",     # None lang — ignored
    ]
    langs = ["en", "de", "fr", None]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        slice_jaccard_ds(
            rd.from_arrow(tab).repartition(2), ["de", "en", "fr"], n=3
        )
        .to_pandas()
        .set_index(["slice_a", "slice_b"])
    )
    # de={abg,bge}, en={abg,bgd}, fr={zet}
    assert out.loc[("de", "en")].tolist() == [1, 3, 333333]
    assert out.loc[("de", "fr")].tolist() == [0, 3, 0]
    assert out.loc[("en", "fr")].tolist() == [0, 3, 0]


def test_slice_jaccard_requires_sorted_slices():
    import pytest
    import ray.data as rd

    from lsearch_ray.functions.keyness import slice_jaccard_ds

    tab = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "lang": pa.array(["en"], pa.string()),
            "text": pa.array(["a b c"], pa.string()),
        }
    )
    with pytest.raises(ValueError):
        slice_jaccard_ds(rd.from_arrow(tab), ["en", "de"])
