"""Distributed BPE merge learning: sequential replay of the greedy
left-to-right merge contract (functions/bpe.py)."""

import re
from collections import Counter

import pyarrow as pa


def _replay(texts, iters):
    """Reference implementation: per-step corpus argmax pair under
    (n DESC, w1, w2), greedy left-to-right non-overlapping fuse."""
    docs = [
        [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for t in texts
    ]
    steps = []
    for k in range(1, iters + 1):
        c = Counter()
        for d in docs:
            c.update(zip(d, d[1:]))
        if not c:
            break
        (w1, w2), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        steps.append(
            (k, w1.replace("\x01", " "), w2.replace("\x01", " "), n)
        )
        nd = []
        for d in docs:
            o, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == w1 and d[i + 1] == w2:
                    o.append(d[i] + "\x01" + d[i + 1])
                    i += 2
                else:
                    o.append(d[i])
                    i += 1
            nd.append(o)
        docs = nd
    return steps, docs


def test_bpe_merges_match_sequential_replay():
    import ray.data as rd

    from lsearch_ray.functions.bpe import bpe_merges_ds

    texts = [
        "a a a a b",          # run of (a,a) candidates — parity path
        "a a b c",
        "b c b c b c",
        "the cat sat on the mat the cat",
        "x",
        "",
    ]
    tab = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    want, _ = _replay(texts, 5)
    out = bpe_merges_ds(rd.from_arrow(tab).repartition(3), iters=5)
    got = list(
        zip(
            out["step"].to_pylist(),
            out["w1"].to_pylist(),
            out["w2"].to_pylist(),
            out["n"].to_pylist(),
        )
    )
    assert got == want


def test_bpe_apply_fused_lengths_match_replay():
    import ray.data as rd

    from lsearch_ray.functions.bpe import bpe_apply_ds

    texts = ["a a a a b", "a a b c", "b c b c", "x", ""]
    tab = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    steps, docs = _replay(texts, 2)  # replay applies the first 2 merges
    merges = [
        (w1.replace(" ", "\x01"), w2.replace(" ", "\x01"))
        for _, w1, w2, _ in steps
    ]
    got = (
        bpe_apply_ds(rd.from_arrow(tab).repartition(2), merges)
        .to_pandas()
        .sort_values("doc_id")["n_tokens"]
        .tolist()
    )
    assert got == [len(d) for d in docs]


def test_bpe_merges_stops_when_no_pairs():
    import ray.data as rd

    from lsearch_ray.functions.bpe import bpe_merges_ds

    tab = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["solo", ""],
        }
    )
    out = bpe_merges_ds(rd.from_arrow(tab), iters=3)
    assert out.num_rows == 0
