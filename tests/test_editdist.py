"""Edit-distance-1 matching: symmetric-deletion banding + vectorized
alignment verify."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.editdist import (
    deletion_variants,
    edit1_mask,
    edit1_matches_ds,
)


def _lev(a: str, b: str) -> int:
    a, b = a.encode(), b.encode()
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_edit1_mask_fuzz_vs_dp():
    rng = np.random.RandomState(9)
    words = [
        "".join("ab"[c] for c in rng.randint(0, 2, size=rng.randint(0, 6)))
        for _ in range(120)
    ]
    pairs = [(words[i], words[(i * 7 + 3) % 120]) for i in range(120)]
    got = edit1_mask([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([_lev(a, b) <= 1 for a, b in pairs])
    assert (got == want).all()


def test_deletion_banding_never_under_generates():
    import itertools

    words = ["cold", "old", "bold", "colt", "gold", "coal", "cool", ""]
    parents, variants = deletion_variants(pa.array(words))
    neigh: dict[int, set] = {}
    for p, v in zip(parents, variants.to_pylist()):
        neigh.setdefault(int(p), set()).add(v)
    for i, j in itertools.combinations(range(len(words)), 2):
        if _lev(words[i], words[j]) <= 1:
            assert neigh[i] & neigh[j], (words[i], words[j])


def test_edit1_matches_ds_exact_no_self_pairs():
    """'feel' has a doubled letter: both deletions of 'e' give 'fel' —
    the (variant, id) dedup must prevent a self-pair."""
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "s": ["feel", "fell", "felt", "unrelated", "fee"],
        }
    )
    out = edit1_matches_ds(
        rd.from_arrow(t).repartition(2), "s", "id"
    ).take_all()
    got = sorted((r["a"], r["b"]) for r in out)
    words = dict(zip(t["id"].to_pylist(), t["s"].to_pylist()))
    want = sorted(
        (i, j)
        for i in words
        for j in words
        if i < j and _lev(words[i], words[j]) <= 1
    )
    assert got == want
    assert all(a != b for a, b in got)


def test_edit1_matches_null_names_never_match():
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "s": pa.array(["abc", None, None], pa.large_string()),
        }
    )
    out = edit1_matches_ds(rd.from_arrow(t), "s", "id").take_all()
    assert out == []


def test_spell_suggestions_matches_python_reference():
    """Suggestions equal a brute-force Levenshtein<=1 scan of the exact
    df table, ranked (df desc, term asc), top-k per query term."""
    import re

    import ray.data as rd

    from lsearch_ray.functions.editdist import spell_suggestions_ds

    texts = [
        "cat hat bat cat",
        "hat rat",
        "cart cat chat",
        "dog dig dug dog dog",
        "zebra",
        "hat cat",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    qterms = ["cat", "dg", "zzz", "hhat"]
    k = 3
    out = (
        spell_suggestions_ds(rd.from_arrow(tbl), qterms, k=k)
        .to_pandas()
        .sort_values(["qterm", "rn"])
        .reset_index(drop=True)
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    df: dict[str, set[int]] = {}
    for did, s in enumerate(texts):
        for t in re.findall(r"[a-z0-9]+", s.lower()):
            df.setdefault(t, set()).add(did)
    expected = []
    for q in sorted(set(qterms)):
        cands = sorted(
            ((t, len(d)) for t, d in df.items() if lev(q, t) <= 1),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        for rn, (t, n) in enumerate(cands, 1):
            expected.append((q, t, n, rn))
    got = [
        (r.qterm, r.term, int(r.df), int(r.rn)) for r in out.itertuples()
    ]
    assert got == expected
    assert all(q != "zzz" for q, *_ in got)  # no-match term yields nothing
