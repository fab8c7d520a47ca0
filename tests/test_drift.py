"""Per-slice unigram TV drift (:mod:`lsearch_ray.functions.drift`) —
hand fixture plus a pure-Python brute-force reference on a randomized
corpus (including the partition-partial path with tiny partitions)."""

from __future__ import annotations

import random
import re
from collections import Counter

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.drift import slice_tv_drift_ds


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _ref(rows: list[tuple[str, str]]):
    """Brute force: exact integer TV numerator per slice vs rest."""
    cnt: dict[str, Counter] = {}
    for sl, text in rows:
        cnt.setdefault(sl, Counter()).update(_tok(text))
    tot = Counter()
    for c in cnt.values():
        tot.update(c)
    T = sum(tot.values())
    out = []
    for sl in sorted(cnt):
        A = sum(cnt[sl].values())
        B = T - A
        n = sum(
            abs(cnt[sl].get(t, 0) * B - (tc - cnt[sl].get(t, 0)) * A)
            for t, tc in tot.items()
        )
        tv = n * 10**6 // (2 * A * B) if A > 0 and B > 0 else 0
        out.append((sl, A, B, tv))
    return out


def _run(rows: list[tuple[str, str]], **kw):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), type=pa.int64()),
            "lang": [r[0] for r in rows],
            "text": [r[1] for r in rows],
        }
    )
    got = slice_tv_drift_ds(rd.from_arrow(t), slice_col="lang", **kw)
    return list(
        zip(
            got["slice"].to_pylist(),
            got["slice_tokens"].to_pylist(),
            got["rest_tokens"].to_pylist(),
            got["tv_micro"].to_pylist(),
        )
    )


def test_identical_distributions_zero_drift():
    rows = [("a", "x y z"), ("b", "x y z")]
    got = _run(rows)
    assert got == [("a", 3, 3, 0), ("b", 3, 3, 0)]


def test_disjoint_vocabulary_max_drift():
    rows = [("a", "p q r"), ("b", "x y z")]
    got = _run(rows)
    # disjoint supports: TV = 1 exactly
    assert got == [("a", 3, 3, 10**6), ("b", 3, 3, 10**6)]


def test_hand_fixture():
    rows = [("a", "x x y"), ("b", "x z")]
    # slice a: A=3; rest B=2. counts a={x:2,y:1}, rest={x:1,z:1}
    # n = |2*2-1*3| + |1*2-0*3| + |0*2-1*3| = 1+2+3 = 6
    # tv = 6*1e6 // 12 = 500000 (symmetric for b)
    assert _run(rows) == [("a", 3, 2, 500000), ("b", 2, 3, 500000)]


def test_single_slice_is_zero():
    rows = [("only", "x y z w")]
    assert _run(rows) == [("only", 4, 0, 0)]


def test_randomized_brute_force():
    rng = random.Random(777)
    vocab = [f"w{i}" for i in range(25)]
    for trial in range(3):
        rows = [
            (
                rng.choice(["en", "de", "fr"]),
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))),
            )
            for _ in range(60)
        ]
        assert _run(rows, num_partitions=5) == _ref(rows)
