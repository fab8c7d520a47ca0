"""Property-based fuzzing (hypothesis) of the codec and scorer paths.

These pin the invariants the engine's correctness rests on:
- varint/delta codec round-trips arbitrary posting shapes exactly;
- LazyPostings block decoding equals full decoding on any block subset;
- the lazy block-max scorer is bit-identical to the exhaustive scorer on
  random corpora/queries with the pruning forced on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from lsearch_ray.index.codec import (
    LazyPostings,
    decode_posting_column,
    encode_shard_postings,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 62)), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    data, lengths = varint_encode(v)
    assert int(lengths.sum()) == len(data)
    out = varint_decode(data)
    assert np.array_equal(out, v)


@st.composite
def posting_lists(draw):
    n_terms = draw(st.integers(min_value=1, max_value=5))
    rows = []
    for t in range(n_terms):
        term = f"t{t:02d}"
        n = draw(st.integers(min_value=1, max_value=120))
        seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
        rng = np.random.RandomState(seed)
        docs = np.unique(rng.randint(0, 1 << 40, size=n).astype(np.int64))
        for d in docs:
            rows.append(
                (term, int(d), int(rng.randint(1, 50)), int(rng.randint(1, 400)))
            )
    return rows


@given(posting_lists(), st.integers(min_value=2, max_value=64))
@settings(max_examples=60, deadline=None)
def test_codec_roundtrip_and_lazy_blocks(rows, block_size):
    rows.sort(key=lambda r: (r[0], r[1]))
    from lsearch_ray.index.codec import build_doc_table

    all_docs = np.array([r[1] for r in rows], dtype=np.int64)
    dtab = build_doc_table(all_docs)
    t = encode_shard_postings(
        pa.array([r[0] for r in rows]),
        np.array([r[1] for r in rows], dtype=np.int64),
        np.array([r[2] for r in rows], dtype=np.int64),
        np.array([r[3] for r in rows], dtype=np.int64),
        block_size=block_size,
    )
    for i in range(t.num_rows):
        term = t["term"][i].as_py()
        want = [(r[1], r[2], r[3]) for r in rows if r[0] == term]
        d, tf, dl = decode_posting_column(
            t["docs"][i].as_py(), t["tfs"][i].as_py(), t["dls"][i].as_py(),
            dtab, block_size,
        )
        assert list(zip(d.tolist(), tf.tolist(), dl.tolist())) == want
        lp = LazyPostings(
            t["docs"][i].as_py(),
            t["tfs"][i].as_py(),
            t["dls"][i].as_py(),
            np.array(t["skip_last"][i].as_py()),
            np.array(t["skip_doff"][i].as_py()),
            np.array(t["skip_toff"][i].as_py()),
            np.array(t["skip_loff"][i].as_py()),
            np.array(t["skip_max_tf"][i].as_py()),
            np.array(t["skip_min_dl"][i].as_py()),
            int(t["df"][i].as_py()),
            block_size,
            dtab,
        )
        nb = lp.n_blocks
        # odd blocks only — a non-contiguous subset
        sel = np.arange(nb)[1::2]
        if len(sel):
            counts = lp.block_counts()
            starts = np.concatenate(([0], np.cumsum(counts)))
            idx = np.concatenate(
                [np.arange(starts[b], starts[b + 1]) for b in sel]
            )
            d2, tf2, dl2 = lp.decode_blocks(sel)
            assert np.array_equal(d2, d[idx])
            assert np.array_equal(tf2, tf[idx])
            assert np.array_equal(dl2, dl[idx])
        # block-max metadata really bounds the block
        for b in range(nb):
            s, e = b * block_size, min((b + 1) * block_size, len(tf))
            assert t["skip_max_tf"][i][b].as_py() == int(tf[s:e].max())
            assert t["skip_min_dl"][i][b].as_py() == int(dl[s:e].min())
            assert t["skip_last"][i][b].as_py() == int(d[e - 1])


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=15, deadline=None)
def test_lazy_scorer_bit_identical_random_corpora(seed):
    """Random tiny corpora + random queries: pruned lazy path ==
    exhaustive path, bit for bit."""
    import lsearch_ray.index.search as S
    from lsearch_ray.index.build import IndexMeta
    from lsearch_ray.index.codec import encode_shard_postings as enc

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(8)]
    n_docs = int(rng.randint(5, 60))
    rows = []
    dls = {}
    for d in range(n_docs):
        toks = rng.choice(vocab, size=rng.randint(1, 30))
        dls[d] = len(toks)
        terms, counts = np.unique(toks, return_counts=True)
        for t_, c in zip(terms, counts):
            rows.append((str(t_), d, int(c), len(toks)))
    rows.sort(key=lambda r: (r[0], r[1]))
    tbl = enc(
        pa.array([r[0] for r in rows]),
        np.array([r[1] for r in rows], dtype=np.int64),
        np.array([r[2] for r in rows], dtype=np.int64),
        np.array([r[3] for r in rows], dtype=np.int64),
        block_size=4,
    )
    meta = IndexMeta(
        num_shards=1,
        n_docs=n_docs,
        avgdl=sum(dls.values()) / n_docs,
        block_size=4,
    )
    from lsearch_ray.index.codec import build_doc_table

    lazy = {}
    S._lazy_rows(
        tbl, 4, lazy,
        build_doc_table(np.array([r[1] for r in rows], dtype=np.int64)),
    )
    dfs = S.global_dfs_lazy(lazy)
    eager = S._eager5(lazy)
    old_cut, old_sparse = S.EXHAUSTIVE_CUTOFF, S.SPARSE_DECODE_LIMIT
    S.EXHAUSTIVE_CUTOFF, S.SPARSE_DECODE_LIMIT = 0, 3
    try:
        for _ in range(4):
            q = " ".join(rng.choice(vocab, size=rng.randint(1, 4), replace=False))
            k = int(rng.randint(1, 8))
            a = S.score_query(q, eager, dfs, meta, k, "or")
            b = S.score_query_blockmax_lazy(q, lazy, dfs, meta, k, "or")
            assert a[0].tolist() == b[0].tolist(), (seed, q)
            assert a[1].tolist() == b[1].tolist(), (seed, q)
    finally:
        S.EXHAUSTIVE_CUTOFF, S.SPARSE_DECODE_LIMIT = old_cut, old_sparse


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("L", "N", "P", "Z", "S", "C")
            ),
            max_size=60,
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_byte_tokenizer_matches_pure_python_on_unicode(texts):
    """flat_tokens_arrow (byte-level numpy over raw Arrow buffers) must
    agree with the pure-Python tokenizer on arbitrary Unicode, including
    multibyte sequences, empty strings, and control characters."""
    import pyarrow as pa

    from lsearch_ray.analyzer import flat_tokens_arrow, tokenize

    arr = pa.array(texts, type=pa.string())
    parents, flat = flat_tokens_arrow(arr)
    got: dict[int, list[str]] = {}
    for p, t in zip(parents.tolist(), flat.to_pylist()):
        got.setdefault(p, []).append(t)
    for i, text in enumerate(texts):
        assert got.get(i, []) == tokenize(text), (i, text)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8"),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=150, deadline=None)
def test_term_counts_positions_fuzz(texts):
    """Positions from the vectorized path equal pure-Python order."""
    import pyarrow as pa

    from lsearch_ray.analyzer import term_counts_table, term_positions

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = term_counts_table(t, positions=True)
    got: dict[tuple[int, str], list[int]] = {}
    for i in range(out.num_rows):
        got[(out["doc_id"][i].as_py(), out["term"][i].as_py())] = out["pos"][
            i
        ].as_py()
    for d, text in enumerate(texts):
        want = term_positions(text)
        mine = {t_: p for (dd, t_), p in got.items() if dd == d}
        assert mine == want, (d, text)


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_buckets=st.sampled_from([8, 32, 256]),
    collect_limit=st.sampled_from([10, 200]),
)
@settings(max_examples=12, deadline=None)
def test_exact_quantiles_fuzz_vs_numpy(seed, n_buckets, collect_limit):
    """exact_quantiles == numpy sorted-order statistic on random mixes of
    point masses, ties, heavy tails and NaNs, for any bucket/collect
    configuration (exercises the refinement AND the stall probe)."""
    import ray.data as rd

    from lsearch_ray.functions.quantiles import exact_quantiles

    rng = np.random.RandomState(seed)
    parts = [rng.lognormal(0, 2, size=rng.randint(1, 800))]
    for _ in range(rng.randint(0, 3)):
        parts.append(np.full(rng.randint(1, 1200), float(rng.randint(-5, 6))))
    if rng.rand() < 0.5:
        parts.append(np.full(rng.randint(1, 50), np.nan))
    vals = np.concatenate(parts)
    rng.shuffle(vals)
    qs = sorted(rng.rand(rng.randint(1, 4)).round(3).tolist())
    t = pa.table({"value": pa.array(vals, type=pa.float64())})
    out = exact_quantiles(
        rd.from_arrow(t).repartition(int(rng.randint(1, 5))),
        "value",
        qs,
        n_buckets=n_buckets,
        collect_limit=collect_limit,
    )
    finite = np.sort(vals[np.isfinite(vals)])
    for q, v in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        want = finite[int(np.floor(q * (len(finite) - 1)))]
        assert v == want, (q, v, want, seed)


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    cap=st.sampled_from([2, 8, 64]),
    cand_cap=st.sampled_from([3, 10, 100]),
)
@settings(max_examples=12, deadline=None)
def test_heavy_hitters_certificate_sound_fuzz(seed, cap, cand_cap):
    """Soundness: WHENEVER heavy_hitters claims provably_exact, the
    result equals the brute-force top-k — across random Zipf multisets,
    random batch splits and aggressive truncation settings."""
    from collections import Counter

    import ray.data as rd

    from lsearch_ray.functions.sketches import heavy_hitters

    rng = np.random.RandomState(seed)
    vals = [f"v{int(x) % 60:02d}" for x in rng.zipf(1.3, size=int(rng.randint(50, 3000)))]
    k = int(rng.randint(1, 12))
    # random batch split: emit as multiple blocks
    cut = sorted(rng.choice(len(vals), size=min(3, len(vals) - 1), replace=False).tolist())
    bounds = [0] + cut + [len(vals)]
    tables = [
        pa.table({"s": pa.array(vals[a:b], type=pa.large_string())})
        for a, b in zip(bounds[:-1], bounds[1:])
        if b > a
    ]
    table, info = heavy_hitters(
        rd.from_arrow(tables), "s", k=k, per_batch_cap=cap, candidate_cap=cand_cap
    )
    if info["provably_exact"]:
        cnt = Counter(vals)
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        got = list(zip(table["value"].to_pylist(), table["n"].to_pylist()))
        assert got == [(v, c) for v, c in want], (seed, cap, cand_cap, k)


_WORDS = st.text(
    alphabet="ab1 .,-XY\t\n", min_size=0, max_size=60
)


@given(st.lists(_WORDS, min_size=0, max_size=12), st.integers(1, 7))
@settings(max_examples=150, deadline=None)
def test_doc_chunks_matches_python_reference_fuzz(texts, width):
    """doc_chunks' boundary-mask chunking equals the per-row python
    reference on arbitrary mixed-noise texts: same parents, same chunk
    ordinals, same joined chunk strings."""
    import re

    from lsearch_ray.functions.chunks import doc_chunks

    parents, idx, chunks = doc_chunks(pa.array(texts, type=pa.string()), width)
    got = list(zip(parents.tolist(), idx.tolist(), chunks.to_pylist()))
    exp = []
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        for j in range(0, len(toks), width):
            exp.append((i, j // width, " ".join(toks[j : j + width])))
    assert got == exp, (texts, width)


@given(st.integers(0, 2**31 - 1), st.integers(1, 4))
@settings(max_examples=10, deadline=None)
def test_quota_sample_partition_invariant_fuzz(seed, parts):
    """quota_sample keeps an identical row set under any block split and
    never exceeds a stratum's cap."""
    from collections import Counter

    import ray.data as rd

    from lsearch_ray.functions.mixture import quota_sample

    rng = np.random.RandomState(seed)
    n = int(rng.randint(1, 120))
    strata = [f"s{int(x) % 4}" for x in rng.randint(0, 6, size=n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "lang": pa.array(strata, type=pa.string()),
        }
    )
    caps = {"s0": int(rng.randint(0, 8)), "s1": 3, "s2": 10_000}
    base = sorted(
        (r["doc_id"], r["lang"])
        for r in quota_sample(rd.from_arrow(t), "lang", "doc_id", caps).take_all()
    )
    split = sorted(
        (r["doc_id"], r["lang"])
        for r in quota_sample(
            rd.from_arrow(t).repartition(parts), "lang", "doc_id", caps
        ).take_all()
    )
    assert base == split, seed
    by = Counter(lang for _, lang in base)
    for s, c in by.items():
        assert c <= caps.get(s, 0), (s, c)
    assert "s3" not in by


def _lev_dp(a: str, b: str) -> int:
    ab, bb = a.encode(), b.encode()
    dp = list(range(len(bb) + 1))
    for i, ca in enumerate(ab, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(bb, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(bb)]


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=0, max_size=7),
            st.text(alphabet="abc", min_size=0, max_size=7),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_edit1_mask_matches_dp(pairs):
    from lsearch_ray.functions.editdist import edit1_mask

    got = edit1_mask([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([_lev_dp(a, b) <= 1 for a, b in pairs])
    assert (got == want).all()


@given(st.lists(st.text(alphabet="ab", min_size=0, max_size=5), min_size=2, max_size=25))
@settings(max_examples=100, deadline=None)
def test_deletion_banding_is_exact_for_edit1(words):
    """SymSpell identity: deletion-1 neighborhoods intersect ⟺ the pair
    is a candidate; must NEVER under-generate for true lev≤1 pairs."""
    import itertools

    from lsearch_ray.functions.editdist import deletion_variants

    parents, variants = deletion_variants(pa.array(words, type=pa.large_string()))
    neigh: dict[int, set] = {i: set() for i in range(len(words))}
    for p, v in zip(parents, variants.to_pylist()):
        neigh[int(p)].add(v)
    for i, j in itertools.combinations(range(len(words)), 2):
        if _lev_dp(words[i], words[j]) <= 1:
            assert neigh[i] & neigh[j], (words[i], words[j])


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),       # doc id
            st.integers(min_value=0, max_value=40),         # token count
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=64),                 # capacity
    st.integers(min_value=1, max_value=1024),               # range width
)
@settings(max_examples=40, deadline=None)
def test_pack_bins_fuzz_matches_sequential_rule(rows, capacity, range_width):
    """pack_bins under random sparse ids / capacities / range widths must
    equal the trivial sequential rule (exclusive prefix // capacity)."""
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.packing import pack_bins_ds

    rows = sorted(rows)
    # synthesize texts with exactly the requested token counts
    texts = [" ".join(["tok"] * n) for _, n in rows]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(3)
    out = (
        pack_bins_ds(
            ds, capacity=capacity, range_width=range_width, num_partitions=2
        )
        .to_pandas()
    )
    acc = 0
    expect = []
    for _, n in rows:
        expect.append(acc // capacity)
        acc += n
    assert list(out["bin_id"]) == expect
    assert list(out["n_tokens"]) == [n for _, n in rows]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),               # group
            st.integers(min_value=-50, max_value=50),       # value
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(max_examples=40, deadline=None)
def test_grouped_rank_percentile_fuzz_matches_pandas(rows):
    """percent-rank under random groups/ties must equal pandas
    rank(method='min')-1 scaled by 1e6 // group size."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.grouped import grouped_rank_percentile_ds

    df = pd.DataFrame(
        {
            "g": [g for g, _ in rows],
            "v": pd.array([v for _, v in rows], dtype="int64"),
            "rid": range(len(rows)),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
    out = (
        grouped_rank_percentile_ds(
            ds, "g", "v", id_cols=["rid"], num_partitions=2
        )
        .to_pandas()
        .sort_values("rid")
    )
    rank0 = df.groupby("g")["v"].rank(method="min").astype("int64") - 1
    sizes = df.groupby("g")["v"].transform("size").astype("int64")
    expect = (rank0 * 10**6) // sizes
    assert list(out["pct_micro"]) == list(expect)


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "ab"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=25, deadline=None)
def test_bpe_merges_fuzz_vs_sequential_replay(docs, iters):
    """The distributed BPE learner must equal the sequential greedy
    replay on tie-heavy, repeated-token corpora (w1 == w2 runs exercise
    the run-parity kernel; tiny alphabets force count ties)."""
    import ray.data as rd

    from lsearch_ray.functions.bpe import bpe_merges_ds
    from tests.test_bpe import _replay

    texts = [" ".join(d) for d in docs]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    want, _ = _replay(texts, iters)
    out = bpe_merges_ds(rd.from_arrow(tab).repartition(2), iters=iters)
    got = list(
        zip(
            out["step"].to_pylist(),
            out["w1"].to_pylist(),
            out["w2"].to_pylist(),
            out["n"].to_pylist(),
        )
    )
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 40), _WORDS),
        min_size=1,
        max_size=14,
        unique_by=lambda r: r[0],
    ),
    st.integers(2, 6),
)
@settings(max_examples=12, deadline=None)
def test_vocab_growth_fuzz_vs_sequential_replay(rows, n_buckets):
    """vocab_growth equals the per-prefix distinct-token count of a
    sequential replay on arbitrary sparse id sets and bucket counts."""
    import re

    import ray.data as rd

    from lsearch_ray.functions.ngrams import vocab_growth_ds

    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": texts}
    )
    out = (
        vocab_growth_ds(rd.from_arrow(tbl), n_buckets=n_buckets)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    lo, hi = min(ids), max(ids)
    span = hi - lo + 1
    for i in range(1, n_buckets + 1):
        thr = lo + (span * i + n_buckets - 1) // n_buckets
        vocab = set()
        for did, s in zip(ids, texts):
            if did < thr:
                vocab.update(re.findall(r"[a-z0-9]+", s.lower()))
        row = out.iloc[i - 1]
        assert int(row["doc_id_lt"]) == thr
        assert int(row["vocab_size"]) == len(vocab), (rows, n_buckets)


@given(
    st.dictionaries(st.integers(0, 12), st.integers(0, 3), max_size=8),
    st.dictionaries(st.integers(0, 12), st.integers(0, 3), max_size=8),
)
@settings(max_examples=12, deadline=None)
def test_snapshot_diff_fuzz_vs_dict_replay(a, b):
    """snapshot_diff matches the dict-based replay on arbitrary key/fp
    maps (statuses partition A ∪ B; fingerprint 0 is a legal value)."""
    import ray.data as rd

    from lsearch_ray.functions.snapshot import snapshot_diff_ds

    if not a and not b:
        return

    def ds(d):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(d), pa.int64()),
                    "fp64": pa.array(list(d.values()), pa.int64()),
                }
            )
        )

    got = {
        int(r["doc_id"]): r["status"]
        for r in snapshot_diff_ds(ds(a), ds(b)).take_all()
    }
    expected = {}
    for k in set(a) | set(b):
        if k not in b:
            expected[k] = "removed"
        elif k not in a:
            expected[k] = "added"
        else:
            expected[k] = "same" if a[k] == b[k] else "changed"
    assert got == expected, (a, b)


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False
            ).map(lambda x: round(x, 3)),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=60, deadline=None)
def test_int8_quantization_fuzz_vs_scalar_replay(vecs):
    """int8 quantize-dequantize equals the per-element scalar replay and
    bounds the per-component error by scale/254."""
    import numpy as np

    from lsearch_ray.functions.ann import int8_dequantized_batch

    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    got = int8_dequantized_batch(t)["embedding"].to_pylist()
    for orig, dq in zip(vecs, got):
        scale = max(abs(x) for x in orig)
        if scale == 0:
            assert dq == [0.0] * len(orig)
            continue
        want = [
            np.floor(x * 127.0 / scale + 0.5) * scale / 127.0 for x in orig
        ]
        assert dq == want, (orig, dq)
        assert all(
            abs(g - x) <= scale / 254 + 1e-9 for g, x in zip(dq, orig)
        )
