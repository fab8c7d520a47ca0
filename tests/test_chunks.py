import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.chunks import chunk_exact_dedup, doc_chunks


def test_doc_chunks_basic():
    texts = pa.array(
        [
            "a b c d e f g",  # width 3 -> "a b c", "d e f", "g"
            "one two",  # -> "one two"
            "",  # -> none
            "x",  # -> "x"
        ]
    )
    parents, idx, chunks = doc_chunks(texts, 3)
    assert parents.tolist() == [0, 0, 0, 1, 3]
    assert idx.tolist() == [0, 1, 2, 0, 0]
    assert chunks.to_pylist() == ["a b c", "d e f", "g", "one two", "x"]


def test_doc_chunks_tokenizes_and_folds():
    parents, idx, chunks = doc_chunks(pa.array(["Big-Data, ROCKS!  ok"]), 2)
    assert chunks.to_pylist() == ["big data", "rocks ok"]
    assert idx.tolist() == [0, 1]


def test_doc_chunks_matches_python_reference():
    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 25))))
        for _ in range(40)
    ]
    for w in (1, 3, 10):
        parents, idx, chunks = doc_chunks(pa.array(texts), w)
        got = list(zip(parents.tolist(), idx.tolist(), chunks.to_pylist()))
        exp = []
        for i, t in enumerate(texts):
            toks = t.split()
            for j in range(0, len(toks), w):
                exp.append((i, j // w, " ".join(toks[j : j + w])))
        assert got == exp, w


def test_chunk_exact_dedup_keeps_first_occurrence():
    texts = [
        "the quick brown fox jumps over",  # doc 0: chunks "the quick brown", "fox jumps over"
        "the quick brown cat sits here",  # doc 1: first chunk duplicates doc 0's
        "fox jumps over the quick brown",  # doc 2: both chunks are dups
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "text": texts})
    ).repartition(2)
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in chunk_exact_dedup(ds, width=3, num_partitions=4).take_all()
    )
    assert got == [
        (0, 0, "the quick brown"),
        (0, 1, "fox jumps over"),
        (1, 1, "cat sits here"),
    ]


def test_chunk_dedup_matches_duckdb():
    import __ray_entry__ as entry_mod

    rng = np.random.default_rng(11)
    vocab = ["data", "web", "page", "crawl", "boiler", "plate"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 35))))
        for _ in range(60)
    ]
    # inject shared boilerplate at chunk-aligned positions
    boiler = " ".join(["terms of service apply here now"] * 2)
    texts = [boiler + " " + t if i % 3 == 0 else t for i, t in enumerate(texts)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})

    got = [
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in chunk_exact_dedup(rd.from_arrow(t).repartition(3), width=10)
        .sort(["doc_id", "chunk_idx"])
        .take_all()
    ]
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(entry_mod.oracle_sql()["chunk_dedup"]).fetchall()
    assert got == [tuple(r) for r in exp]


def test_doc_chunks_overlap_reference():
    from lsearch_ray.functions.chunks import doc_chunks_overlap

    texts = ["a b c d e f g", "x y z", "", "solo"]
    p, idx, ch = doc_chunks_overlap(pa.array(texts), 4, 2)
    got = list(zip(p.tolist(), idx.tolist(), ch.to_pylist()))
    want = []
    for r, t in enumerate(texts):
        toks = t.split()
        for c, s in enumerate(range(0, len(toks), 2)):
            want.append((r, c, " ".join(toks[s : s + 4])))
    assert got == want


def test_doc_chunks_overlap_stride_eq_width_matches_fixed():
    from lsearch_ray.functions.chunks import doc_chunks, doc_chunks_overlap

    texts = pa.array(["a b c d e", "q w", ""])
    p1, i1, c1 = doc_chunks(texts, 3)
    p2, i2, c2 = doc_chunks_overlap(texts, 3, 3)
    assert p1.tolist() == p2.tolist()
    assert i1.tolist() == i2.tolist()
    assert c1.to_pylist() == c2.to_pylist()


def test_cdc_chunks_matches_python_reference():
    from lsearch_ray.functions.chunks import doc_chunks_cdc
    from lsearch_ray.functions.sampling import _key_hash63

    rng = np.random.RandomState(8)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(0, 60))) for _ in range(30)
    ]
    d = 4
    p, idx, nt, ch = doc_chunks_cdc(pa.array(texts), divisor=d)
    got = list(zip(p.tolist(), idx.tolist(), nt.tolist(), ch.to_pylist()))
    bnd = {
        v: int(_key_hash63(pa.array([v]))[0]) % d == 0 for v in vocab
    }
    want = []
    for r, t in enumerate(texts):
        toks = t.split()
        cur: list[str] = []
        cid = 0
        for tok in toks:
            cur.append(tok)
            if bnd[tok]:
                want.append((r, cid, len(cur), " ".join(cur)))
                cur, cid = [], cid + 1
        if cur:
            want.append((r, cid, len(cur), " ".join(cur)))
    assert got == want


def test_cdc_chunks_shift_robust():
    """The CDC property: prepending text to a document changes only the
    chunks up to the first boundary after the edit — every later chunk
    string is identical (a fixed-width grid would shift all of them)."""
    from lsearch_ray.functions.chunks import doc_chunks_cdc

    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(40)]
    base = " ".join(rng.choice(vocab, size=400))
    edited = "zzz yyy " + base
    _, _, _, c1 = doc_chunks_cdc(pa.array([base]), divisor=4)
    _, _, _, c2 = doc_chunks_cdc(pa.array([edited]), divisor=4)
    s1, s2 = set(c1.to_pylist()), set(c2.to_pylist())
    shared = s1 & s2
    # all but the first chunk (the edit region) survive the edit
    assert len(shared) >= len(s1) - 2
    assert len(s1) > 10  # real boundary structure, not one blob


def test_feature_hash_dense_consistent_with_relational_and_feeds_knn():
    """The dense hashing-trick vectors agree with the relational integer
    form, and the output plugs straight into knn_join (the text→vector
    bridge contract)."""
    from lsearch_ray.functions.ann import knn_join
    from lsearch_ray.functions.feathash import (
        feature_hash_relational,
        feature_hash_vectors,
    )

    rng = np.random.RandomState(12)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 40))) for _ in range(40)
    ]
    texts.append("")  # token-less doc keeps the zero vector
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(41), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    rel = feature_hash_relational(rd.from_arrow(t).repartition(3), dim=16)
    dense = feature_hash_vectors(
        rd.from_arrow(t).repartition(3), dim=16, normalize=False
    )
    by_doc = {}
    for r in rel.take_all():
        by_doc.setdefault(r["doc_id"], {})[r["dim"]] = r["v"]
    for r in dense.take_all():
        want = np.zeros(16)
        for d, v in by_doc.get(r["doc_id"], {}).items():
            want[d] = v
        assert np.asarray(r["embedding"], dtype=np.float64).tolist() == want.tolist()
    # normalized vectors feed knn_join directly
    emb = feature_hash_vectors(rd.from_arrow(t).repartition(3), dim=16)
    out = knn_join(emb, id_col="doc_id", k=2).take_all()
    assert len(out) == 41 * 2
