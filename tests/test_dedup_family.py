"""MinHash-LSH / SimHash / n-gram-Jaccard / embedding near-dup operators."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions import (
    embedding_dedup,
    lsh_cosine_topk,
    minhash_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from lsearch_ray.functions.minhash import MinHashSignatures, _shingle_hashes, _token_hashes
from lsearch_ray.functions.simhash import SimHash64, hamming64

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "bird and the fish swim under the bridge near the old mill town square"
)


def _docs_table():
    texts = {
        1: BASE,
        2: BASE,  # exact dup of 1
        3: BASE.replace("lazy", "sleepy"),  # near dup of 1
        4: "completely different content about database engines and queries "
        "with analytical workloads running on distributed clusters",
        5: "numbers 1 2 3 4 5 6 7 8 9 10 counting words apples oranges pears "
        "bananas grapes melons peaches plums cherries lemons",
    }
    return pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": [texts[k] for k in sorted(texts)],
        }
    )


def test_minhash_signature_deterministic_across_batching():
    t = _docs_table()
    m = MinHashSignatures(num_perm=32)
    full = m(t)
    split = pa.concat_tables([m(t.slice(0, 2)), m(t.slice(2))])
    assert full.equals(split)


def test_minhash_similarity_ordering():
    t = _docs_table()
    sigs = MinHashSignatures(num_perm=128)(t)
    s = {
        sigs["doc_id"][i].as_py(): np.asarray(sigs["sig"][i].as_py())
        for i in range(sigs.num_rows)
    }
    est = lambda a, b: float((s[a] == s[b]).mean())
    assert est(1, 2) == 1.0  # exact dup
    assert est(1, 3) > 0.6  # near dup
    assert est(1, 4) < 0.2  # unrelated


def test_minhash_dedup_removes_cluster():
    ds = rd.from_arrow(_docs_table())
    out = minhash_dedup(ds, threshold=0.6)
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == [1, 4, 5]  # 2 and 3 fold into cluster of 1


def test_ngram_jaccard_dedup_exact_verify():
    ds = rd.from_arrow(_docs_table())
    out = ngram_jaccard_dedup(ds, threshold=0.5, ngram=3)
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert 1 in ids and 2 not in ids and 4 in ids and 5 in ids


def test_shingles_short_doc_no_cross_boundary():
    t = pa.table(
        {"doc_id": pa.array([1, 2], type=pa.int64()), "text": ["ab cd", "ef gh ij kl"]}
    )
    parents, h = _token_hashes(t["text"])
    starts, sh = _shingle_hashes(parents, h, 2, 3)
    # doc 1 (2 tokens < ngram): exactly one shingle
    assert starts.tolist() == [0, 1, 3]
    # recompute doc 1 alone: same shingle (no dependence on doc 2)
    p1, h1 = _token_hashes(pa.array(["ab cd"]))
    s1, sh1 = _shingle_hashes(p1, h1, 1, 3)
    assert sh1[0] == sh[0]


def test_simhash_properties():
    t = _docs_table()
    fp = SimHash64()(t)
    vals = {fp["doc_id"][i].as_py(): fp["simhash"][i].as_py() for i in range(5)}
    assert vals[1] == vals[2]
    d13 = hamming64(np.array([vals[1]]), np.array([vals[3]]))[0]
    d14 = hamming64(np.array([vals[1]]), np.array([vals[4]]))[0]
    assert d13 < d14
    assert d13 <= 8


def test_simhash_dedup():
    ds = rd.from_arrow(_docs_table())
    out = simhash_dedup(ds, max_hamming=8)
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert 1 in ids and 2 not in ids and 4 in ids


def _emb_table():
    rng = np.random.RandomState(5)
    base = rng.randn(20, 12).astype(np.float64)
    vecs = list(base)
    vecs.append(base[0] + 1e-4 * rng.randn(12))  # near-dup of 0 -> id 20
    vecs.append(base[3] * 2.0)  # scaled copy of 3 (cos=1) -> id 21
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_embedding_dedup():
    ds = rd.from_arrow(_emb_table())
    out = embedding_dedup(ds, threshold=0.999, nplanes=8)
    ids = sorted(r["vec_id"] for r in out.take_all())
    assert 20 not in ids and 21 not in ids
    assert 0 in ids and 3 in ids
    assert len(ids) == 20


def test_lsh_cosine_topk_finds_near_neighbor():
    t = _emb_table()
    ds = rd.from_arrow(t)
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    got = lsh_cosine_topk(ds, q, k=3, nplanes=8, nprobe_hamming=1, round_to=None)
    top2 = got["vec_id"].to_pylist()[:2]
    assert set(top2) == {0, 20}


def test_connected_components_ds():
    from lsearch_ray.functions.components import (
        connected_components_ds,
        drop_ids_from_pairs_ds,
    )
    from lsearch_ray.functions.cluster import drop_ids_from_pairs

    # two chains + one isolated edge: {1-2-3-4}, {10-11}, {20-21-22}
    pairs = pa.table(
        {
            "a": pa.array([1, 2, 3, 10, 20, 21], type=pa.int64()),
            "b": pa.array([2, 3, 4, 11, 21, 22], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(pairs)
    labels = {
        r["node"]: r["label"] for r in connected_components_ds(ds).take_all()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    got = sorted(
        r["node"] for r in drop_ids_from_pairs_ds(rd.from_arrow(pairs)).take_all()
    )
    want = drop_ids_from_pairs(
        pairs["a"].to_numpy(), pairs["b"].to_numpy()
    )
    assert got == want


def test_minhash_dedup_antijoin_drop_path_matches_broadcast():
    """Force the distributed anti-join drop regime (broadcast_limit=0):
    the drop set is applied without ever materializing on the driver."""
    ds = rd.from_arrow(_docs_table())
    broadcast = sorted(
        r["doc_id"] for r in minhash_dedup(ds, threshold=0.6).take_all()
    )
    anti = sorted(
        r["doc_id"]
        for r in minhash_dedup(ds, threshold=0.6, broadcast_limit=0).take_all()
    )
    assert anti == broadcast == [1, 4, 5]


def test_filter_out_ids_ds_antijoin_matches_broadcast():
    from lsearch_ray.functions.cluster import filter_out_ids_ds

    ds = rd.from_arrow(_docs_table())
    drop = rd.from_arrow(pa.table({"node": pa.array([2, 4], type=pa.int64())}))
    bc = sorted(r["doc_id"] for r in filter_out_ids_ds(ds, drop).take_all())
    aj = sorted(
        r["doc_id"]
        for r in filter_out_ids_ds(ds, drop, broadcast_limit=0).take_all()
    )
    assert bc == aj == [1, 3, 5]


def test_exact_dedup_by_content_join_path_matches_broadcast():
    from lsearch_ray.functions import exact_dedup_by_content

    t = _docs_table()
    bc = sorted(
        r["doc_id"]
        for r in exact_dedup_by_content(
            rd.from_arrow(t), "text", "doc_id"
        ).take_all()
    )
    joined = sorted(
        r["doc_id"]
        for r in exact_dedup_by_content(
            rd.from_arrow(t), "text", "doc_id", broadcast_limit=0
        ).take_all()
    )
    # doc 2 is a byte-exact dup of doc 1; both regimes keep min-id survivors
    assert bc == joined == [1, 3, 4, 5]


def test_fuzzy_decontaminate_flags_near_matches():
    """Corpus docs near a benchmark doc are flagged; unrelated ones are
    not. Bench ids BELOW the corpus ids exercise the a/b swap
    normalization (candidate pairs are emitted with a < b)."""
    from lsearch_ray.functions import fuzzy_decontaminate

    bench = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": [BASE, "unrelated benchmark prompt about "
                               "astronomy stars planets and moons orbiting"]})
    corpus = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": [
                BASE.replace("lazy", "sleepy"),  # near dup of bench 1
                "completely different content about database engines and "
                "distributed query processing over columnar storage files",
                BASE,  # exact dup of bench 1
            ],
        }
    )
    out = fuzzy_decontaminate(
        rd.from_arrow(corpus).repartition(2),
        rd.from_arrow(bench),
        # the one-token edit shifts 3 of ~24 shingles → jaccard ≈ 0.78
        threshold=0.75,
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [10, 12]


def test_fuzzy_decontaminate_no_bench_or_no_hits():
    from lsearch_ray.functions import fuzzy_decontaminate

    corpus = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": [BASE]}
    )
    empty_bench = corpus.slice(0, 0)
    out = fuzzy_decontaminate(
        rd.from_arrow(corpus), rd.from_arrow(empty_bench)
    ).take_all()
    assert out == []
    far_bench = pa.table(
        {
            "doc_id": pa.array([99], pa.int64()),
            "text": ["nothing in common with the corpus at all here"],
        }
    )
    out = fuzzy_decontaminate(
        rd.from_arrow(corpus), rd.from_arrow(far_bench)
    ).take_all()
    assert out == []


def test_fuzzy_decontaminate_empty_docs_never_match():
    """Two 0-token docs share the sentinel MinHash signature (candidate
    pair), but exact verify treats empty∩empty as NO match — parity with
    the SQL twin, whose shingle CTE emits no rows for empty docs."""
    from lsearch_ray.functions import fuzzy_decontaminate

    corpus = pa.table(
        {"doc_id": pa.array([10], pa.int64()), "text": ["   "]}
    )
    bench = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [""]})
    out = fuzzy_decontaminate(
        rd.from_arrow(corpus), rd.from_arrow(bench)
    ).take_all()
    assert out == []


def test_component_labels_ds_total_labeling():
    from lsearch_ray.functions.components import component_labels_ds

    pairs = pa.table(
        {
            "a": pa.array([1, 2, 10], type=pa.int64()),
            "b": pa.array([2, 3, 11], type=pa.int64()),
        }
    )
    # id universe includes edge-free ids 0 and 5
    ids = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2, 3, 5, 10, 11], pa.int64())})
    )
    out = component_labels_ds(ids, rd.from_arrow(pairs), "doc_id").to_pandas()
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 5: 5, 10: 10, 11: 10}
    assert list(out["doc_id"]) == sorted(out["doc_id"])


def test_component_labels_ds_no_edges():
    import pyarrow as _pa

    from lsearch_ray.functions.components import component_labels_ds

    ids = rd.from_arrow(
        _pa.table({"doc_id": _pa.array([3, 1, 2], _pa.int64())})
    )
    empty = rd.from_arrow(
        _pa.table(
            {"a": _pa.array([], _pa.int64()), "b": _pa.array([], _pa.int64())}
        )
    )
    out = component_labels_ds(ids, empty, "doc_id").to_pandas()
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["component"]) == [1, 2, 3]


def test_ngram_jaccard_pairs_matches_dedup_drop_set():
    """The exposed pair stage must induce exactly the dedup survivors."""
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs

    ds = rd.from_arrow(_docs_table())
    rows = ngram_jaccard_pairs(ds, threshold=0.6).take_all()
    assert rows, "fixture must contain near-dup pairs"
    survivors = sorted(
        r["doc_id"] for r in ngram_jaccard_dedup(ds, threshold=0.6).take_all()
    )
    # keep-min-per-component replay of the pair list via union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = _docs_table()["doc_id"].to_pylist()
    expect = sorted(i for i in all_ids if find(i) == i)
    assert survivors == expect


def test_bloom_anti_join_exact_with_forced_false_positives():
    """At m_bits=64 nearly every probe is a bloom candidate, so the
    exact verify stage decides everything — the result must equal the
    plain set difference; null keys survive (anti semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.bloom import bloom_anti_join

    fact_keys = list(range(0, 200, 2)) + [None]     # evens + a null
    base_keys = list(range(0, 100))                  # 0..99
    fact = rd.from_arrow(
        pa.table({"k": pa.array(fact_keys, pa.int64()),
                  "tag": pa.array(range(len(fact_keys)), pa.int64())})
    ).repartition(3)
    base = rd.from_arrow(
        pa.table({"k": pa.array(base_keys, pa.int64())})
    ).repartition(2)

    out = bloom_anti_join(fact, base, "k", m_bits=64, k_hashes=2).to_pandas()
    got = sorted(out["k"].dropna().astype("int64"))
    expect = sorted(k for k in fact_keys if k is not None and k >= 100)
    assert got == expect
    assert out["k"].isna().sum() == 1  # the null row survives


def test_bloom_anti_join_distributed_verify_branch():
    """broadcast_limit=0 forces the left_outer+null-marker branch; the
    result must match the broadcast branch exactly."""
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.bloom import bloom_anti_join

    fact = rd.from_arrow(
        pa.table({"k": pa.array(range(0, 300, 3), pa.int64())})
    ).repartition(2)
    base = rd.from_arrow(
        pa.table({"k": pa.array(range(0, 150), pa.int64())})
    )
    a = bloom_anti_join(fact, base, "k").to_pandas()
    b = bloom_anti_join(fact, base, "k", broadcast_limit=0).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"]) == list(range(150, 300, 3))


def test_cluster_split_keeps_dup_clusters_together():
    """Leakage-safe split invariant: every member of a near-dup
    component carries the same split label (the split hashes the
    component, never the doc id)."""
    import ray.data as rd

    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.minhash import ngram_jaccard_pairs
    from lsearch_ray.functions.sampling import hash_split_labels

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base, base + " x", base] + [
        f"unique document number {i} with entirely different words {i}"
        for i in range(12)
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    docs = rd.from_arrow(tab).repartition(3)
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    labels = component_labels_ds(docs, pairs, "doc_id", num_partitions=2)

    def split(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "component": b["component"].cast(pa.int64()),
                "split": hash_split_labels(b["component"]),
            }
        )

    out = labels.map_batches(split, batch_format="pyarrow").to_pandas()
    # docs 0..2 are one near-dup cluster; they share component AND split
    c = out.set_index("doc_id")
    assert len(set(c.loc[[0, 1, 2], "component"])) == 1
    assert len(set(c.loc[[0, 1, 2], "split"])) == 1
    # per-component split uniqueness holds globally
    assert (out.groupby("component")["split"].nunique() == 1).all()


def test_components_sixteen_partitions_sparse_graph():
    """Regression (round-5 directive): num_partitions=16 on a tiny sparse
    graph must work — empty hash-join PARTITIONS are fine; only a fully
    empty join SIDE (now short-circuited) ever crashed the aggregator.
    Also pins the cores-scaled default (None)."""
    from lsearch_ray.functions.components import (
        component_labels_ds,
        connected_components_ds,
    )

    pairs = pa.table(
        {
            "a": pa.array([1, 2, 3], type=pa.int64()),
            "b": pa.array([2, 3, 4], type=pa.int64()),
        }
    )
    ids = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(50), pa.int64())})
    )
    out = component_labels_ds(
        ids, rd.from_arrow(pairs), "doc_id", num_partitions=16
    ).to_pandas()
    got = dict(zip(out["doc_id"], out["component"]))
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert all(got[i] == i for i in range(50) if i not in (2, 3, 4))

    labels = {
        r["node"]: r["label"]
        for r in connected_components_ds(
            rd.from_arrow(pairs), num_partitions=16
        ).take_all()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}

    # empty edge set: short-circuit, no aggregator finalize crash
    empty = rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    assert connected_components_ds(empty, num_partitions=16).count() == 0


def test_exact_jaccard_pairs_complete_vs_bruteforce():
    """The shared-shingle truth stage equals brute-force all-pairs exact
    Jaccard (completeness: any J>0 pair shares a shingle)."""
    import itertools

    import ray.data as rd

    from lsearch_ray.functions.minhash import (
        ShingleSets,
        exact_jaccard_pairs_ds,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,
        base,  # exact dup of 0
        base + " lambda",  # very high overlap with 0/1
        "alpha beta gamma unrelated words here now okay fine yes",  # moderate
        "totally different content with no shared window at all",
        "x",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    thr = 0.6
    got = sorted(
        (int(r["a"]), int(r["b"]))
        for r in exact_jaccard_pairs_ds(
            rd.from_arrow(tbl), threshold=thr
        ).take_all()
    )

    sets = ShingleSets(3)(tbl)
    sh = [set(x) for x in sets["shingles"].to_pylist()]
    expected = sorted(
        (i, j)
        for i, j in itertools.combinations(range(len(texts)), 2)
        if sh[i] | sh[j]
        and len(sh[i] & sh[j]) / len(sh[i] | sh[j]) >= thr
    )
    assert got == expected
    assert (0, 1) in got and (0, 2) in got  # dup + near-dup found


def test_dedup_recall_harness_consistency():
    """Harness metrics are internally consistent and truth matches the
    brute-force count; borderline-overlap docs make precision < 1."""
    import itertools

    import ray.data as rd

    from lsearch_ray.functions.minhash import (
        ShingleSets,
        dedup_recall_table,
    )

    rng_words = [f"w{i}" for i in range(40)]
    base = " ".join(rng_words[:20])
    texts = [
        base,
        base,  # exact dup: truth pair
        " ".join(rng_words[:14] + rng_words[30:36]),  # J ~0.5 vs base
        " ".join(rng_words[10:30]),  # moderate overlap
        " ".join(rng_words[20:40]),
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    row = dedup_recall_table(rd.from_arrow(tbl)).take_all()[0]

    sets = ShingleSets(3)(tbl)
    sh = [set(x) for x in sets["shingles"].to_pylist()]
    n_true = sum(
        1
        for i, j in itertools.combinations(range(len(texts)), 2)
        if sh[i] | sh[j]
        and len(sh[i] & sh[j]) / len(sh[i] | sh[j]) >= 0.8
    )
    assert int(row["n_true"]) == n_true == 1
    assert int(row["n_hit"]) <= min(int(row["n_true"]), int(row["n_cand"]))
    assert int(row["recall_micro"]) == (
        int(row["n_hit"]) * 1_000_000 // n_true
    )
    assert int(row["precision_micro"]) == (
        int(row["n_hit"]) * 1_000_000 // int(row["n_cand"])
        if int(row["n_cand"])
        else 1_000_000
    )
    # the J~0.5 docs band together sometimes but never verify as truth:
    # candidates strictly exceed truth here, so precision < 1
    assert int(row["n_cand"]) >= int(row["n_true"])
