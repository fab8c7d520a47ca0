"""Duplicated-shingle stats and exact duplicated-span removal
(:mod:`lsearch_ray.functions.dupspans`) — hand-computed fixtures plus a
pure-Python brute-force reference on a randomized corpus."""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions import dup_shingle_stats_ds, dup_span_removal_ds


def _tok(text: str) -> list[str]:
    out, cur = [], []
    for ch in text.lower():
        if ch.isascii() and (ch.isdigit() or "a" <= ch <= "z"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _ref(texts: dict[int, str], n: int):
    """Brute-force reference: per-doc distinct shingle sets, shared =
    present in >= 2 docs; removal covers every occurrence interval."""
    toks = {d: _tok(t) for d, t in texts.items()}
    sets = {
        d: {tuple(t[i : i + n]) for i in range(len(t) - n + 1)}
        for d, t in toks.items()
    }
    from collections import Counter

    cnt = Counter(s for ss in sets.values() for s in ss)
    stats, removed = {}, {}
    for d, t in toks.items():
        tot = len(sets[d])
        shr = sum(1 for s in sets[d] if cnt[s] >= 2)
        stats[d] = (tot, shr, shr * 10**6 // tot if tot else 0)
        cov = [False] * len(t)
        for i in range(len(t) - n + 1):
            if cnt[tuple(t[i : i + n])] >= 2:
                for p in range(i, i + n):
                    cov[p] = True
        kept = [w for w, c in zip(t, cov) if not c]
        removed[d] = (" ".join(kept), len(t), len(t) - len(kept))
    return stats, removed


def _run(texts: dict[int, str], n: int, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": [texts[k] for k in sorted(texts)],
        }
    )
    ds = rd.from_arrow(t)
    stats = dup_shingle_stats_ds(ds, n=n, **kw).to_pandas()
    rem = dup_span_removal_ds(ds, n=n, **kw).to_pandas()
    return stats, rem


def _check(texts: dict[int, str], n: int, **kw):
    e_stats, e_rem = _run(texts, n, **kw)
    r_stats, r_rem = _ref(texts, n)
    assert list(e_stats["doc_id"]) == sorted(texts)
    assert list(e_rem["doc_id"]) == sorted(texts)
    for _, row in e_stats.iterrows():
        assert (
            row["n_shingles"],
            row["dup_shingles"],
            row["dup_micro"],
        ) == r_stats[row["doc_id"]], f"stats doc {row['doc_id']}"
    for _, row in e_rem.iterrows():
        assert (
            row["text"],
            row["n_tokens"],
            row["removed_tokens"],
        ) == r_rem[row["doc_id"]], f"removal doc {row['doc_id']}"


def test_hand_fixture():
    texts = {
        # docs 1 and 2 share the 5-gram "a b c d e" (and its extension);
        # doc 3 is disjoint; doc 4 is too short to have any 5-shingle
        1: "a b c d e f g h",
        2: "x y a b c d e z",
        3: "p q r s t u v w",
        4: "one two three",
        5: "",
    }
    stats, rem = _run(texts, 5)
    s = stats.set_index("doc_id")
    # doc 1: shingles abcde bcdef cdefg defgh -> only abcde shared
    assert s.loc[1, "n_shingles"] == 4 and s.loc[1, "dup_shingles"] == 1
    assert s.loc[1, "dup_micro"] == 250000
    assert s.loc[2, "dup_shingles"] == 1
    assert s.loc[3, "dup_shingles"] == 0
    assert s.loc[4, "n_shingles"] == 0 and s.loc[4, "dup_micro"] == 0
    assert s.loc[5, "n_shingles"] == 0
    r = rem.set_index("doc_id")
    # doc 1 loses tokens a..e (positions 0-4 covered by the shared run)
    assert r.loc[1, "text"] == "f g h"
    assert r.loc[1, "n_tokens"] == 8 and r.loc[1, "removed_tokens"] == 5
    assert r.loc[2, "text"] == "x y z"
    assert r.loc[3, "text"] == "p q r s t u v w"
    assert r.loc[3, "removed_tokens"] == 0
    assert r.loc[4, "text"] == "one two three"
    assert r.loc[5, "text"] == "" and r.loc[5, "n_tokens"] == 0
    _check(texts, 5)


def test_overlapping_spans_union():
    # the two shared occurrences overlap inside doc 1: coverage is the
    # UNION of intervals, not their sum
    texts = {
        1: "a b c d e f g",  # abcde at 0, cdefg at 2 -> covers 0..6
        2: "a b c d e",
        3: "c d e f g",
    }
    _, rem = _run(texts, 5)
    r = rem.set_index("doc_id")
    assert r.loc[1, "text"] == "" and r.loc[1, "removed_tokens"] == 7
    assert r.loc[2, "removed_tokens"] == 5
    _check(texts, 5)


def test_repeat_within_one_doc_not_shared():
    # a shingle repeated inside ONE doc only is not cross-doc duplicated
    texts = {
        1: "a b c d e x a b c d e",
        2: "totally different words here now",
    }
    stats, rem = _run(texts, 5)
    s = stats.set_index("doc_id")
    assert s.loc[1, "dup_shingles"] == 0
    assert rem.set_index("doc_id").loc[1, "removed_tokens"] == 0
    _check(texts, 5)


def test_randomized_vs_bruteforce():
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(8))
    texts = {}
    for d in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        if d % 3 == 0:
            pos = rng.randrange(0, len(words) + 1)
            words[pos:pos] = shared.split()
        texts[d] = " ".join(words)
    _check(texts, 5, num_partitions=7)
    _check(texts, 3, num_partitions=4)


def test_no_duplicates_passthrough():
    # fully unique corpus: removal is identity on the normalized stream
    texts = {i: " ".join(f"u{i}x{j}" for j in range(10)) for i in range(6)}
    stats, rem = _run(texts, 5)
    assert int(stats["dup_shingles"].sum()) == 0
    assert int(rem["removed_tokens"].sum()) == 0
    _check(texts, 5)
