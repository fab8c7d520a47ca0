"""Edge-case hardening: empty/tiny/unicode corpora through the full
index + query path, IVF ANN recall sanity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.index.build import build_index
from lsearch_ray.index.golden import golden_index
from lsearch_ray.index.search import QueryEngine, search_index


def _docs(texts: list[str]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_empty_corpus(tmp_path):
    d = str(tmp_path / "idx")
    meta = build_index(_docs([]), d, num_shards=3)
    assert meta.n_docs == 0 and meta.avgdl == 0.0
    assert search_index(d, "anything").num_rows == 0


def test_single_doc(tmp_path):
    d = str(tmp_path / "idx")
    meta = build_index(_docs(["hello world hello"]), d, num_shards=4)
    assert meta.n_docs == 1
    got = search_index(d, "hello")
    golden = golden_index([0], ["hello world hello"])
    want = golden.bm25("hello")
    assert got["doc_id"].to_pylist() == [w[0] for w in want]
    assert got["score"].to_pylist() == [w[1] for w in want]


def test_docs_with_empty_text(tmp_path):
    texts = ["", "a b c", "", "a a"]
    d = str(tmp_path / "idx")
    meta = build_index(_docs(texts), d, num_shards=2)
    # token-less docs produce no postings but DO count toward n_docs/avgdl
    # (stage-A docstats sidecars) — idf/avgdl match golden exactly
    golden = golden_index(range(4), texts)
    got = search_index(d, "a", k=10)
    want = golden.bm25("a", k=10)
    assert got["doc_id"].to_pylist() == [w[0] for w in want]
    assert got["score"].to_pylist() == [w[1] for w in want]
    assert meta.n_docs == 4
    assert meta.avgdl == golden.avgdl


def test_unicode_corpus_end_to_end(tmp_path):
    texts = [
        "héllo wörld résumé naïve",
        "日本語のテキスト with ascii words",
        "Привет мир hello",
        "emoji 🎉 party time",
    ]
    d = str(tmp_path / "idx")
    build_index(_docs(texts), d, num_shards=2)
    golden = golden_index(range(4), texts)
    for q in ["hello", "ascii words", "party", "llo"]:
        got = search_index(d, q)
        want = golden.bm25(q)
        assert got["doc_id"].to_pylist() == [w[0] for w in want], q
        assert got["score"].to_pylist() == [w[1] for w in want], q


def test_query_engine_single_shard(tmp_path):
    d = str(tmp_path / "idx")
    build_index(_docs(["x y", "y z"]), d, num_shards=1)
    eng = QueryEngine(d, num_actors=4)  # more actors than shards
    out = eng.search("y")
    assert out.num_rows == 2


def test_ivf_recall():
    from lsearch_ray.functions.ann_ivf import ivf_cosine_topk, train_centroids

    rng = np.random.RandomState(8)
    vecs = rng.randn(400, 16).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(400), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    cents = train_centroids(ds, n_clusters=8, seed=5)
    assert cents.shape == (8, 16)
    q = vecs[123].astype(np.float64)
    got = ivf_cosine_topk(
        ds, q, k=5, centroids=cents, nprobe=3, round_to=None
    )
    # the query vector itself must be found (its own cluster is probed)
    assert got["vec_id"].to_pylist()[0] == 123
    assert abs(got["sim"][0].as_py() - 1.0) < 1e-12
    # recall vs exact top-5 with generous probing
    from lsearch_ray.functions import cosine_topk

    exact = cosine_topk(ds, q, k=5, round_to=None)["vec_id"].to_pylist()
    wide = ivf_cosine_topk(
        ds, q, k=5, centroids=cents, nprobe=8, round_to=None
    )["vec_id"].to_pylist()
    assert wide == exact  # probing all clusters == exact


def test_centroid_training_sample_is_deterministic():
    """Corpus above sample_limit: the training sample is a hash-rate
    filter (never a streaming limit, whose row subset races block
    completion) — trained centroids must be bit-identical across runs."""
    from lsearch_ray.functions.ann_ivf import train_centroids

    rng = np.random.RandomState(11)
    vecs = rng.randn(300, 8).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(300), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    runs = [
        train_centroids(
            rd.from_arrow(t), n_clusters=6, seed=3, sample_limit=80
        )
        for _ in range(2)
    ]
    assert (runs[0] == runs[1]).all()
    assert runs[0].shape == (6, 8)
