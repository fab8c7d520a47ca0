"""Flagship end-to-end: html pages → extract → dedup → index → query,
rank-identical to golden over the deduped corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.corpus import make_corpus, normalize_url_batch
from lsearch_ray.index.golden import golden_index
from lsearch_ray.pipelines.web import (
    index_web_corpus,
    prepare_web_docs,
    search_web_corpus,
)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    corpus = make_corpus(600, seed=3)
    index_dir = str(tmp_path_factory.mktemp("web") / "index")
    meta = index_web_corpus(rd.from_arrow(corpus), index_dir, num_shards=4)
    # golden over the expected dedup: first (by warc_ts) row per norm url
    t = normalize_url_batch(corpus)
    seen: dict[str, int] = {}
    keep_rows = []
    for i, u in enumerate(t["url_norm"].to_pylist()):
        if u not in seen:  # rows are in warc_ts order already
            seen[u] = i
            keep_rows.append(i)
    deduped = t.take(pa.array(keep_rows))
    from lsearch_ray.corpus import fnv1a64

    ids = fnv1a64(deduped["url_norm"])
    golden = golden_index(ids.tolist(), deduped["text"].to_pylist())
    return index_dir, meta, golden


def test_dedup_happened(built):
    index_dir, meta, golden = built
    assert meta.n_docs == golden.n_docs
    assert meta.n_docs < 600  # generator injects ~3% url dups


def test_prepare_drops_poisoned_rows():
    corpus = make_corpus(50, seed=4)
    # poison one row's html so extraction mismatches its text column
    htmls = corpus["html"].to_pylist()
    htmls[10] = b"<p>tampered</p>"
    poisoned = corpus.set_column(2, "html", pa.array(htmls, type=pa.binary()))
    docs = prepare_web_docs(rd.from_arrow(poisoned))
    n = docs.count()
    clean_n = prepare_web_docs(rd.from_arrow(corpus)).count()
    assert n == clean_n - 1


def test_query_rank_identical(built):
    index_dir, meta, golden = built
    queries = ["biology the", "word010 music", "zzz"]
    out = search_web_corpus(index_dir, queries, k=10)
    by_q: dict[int, list] = {}
    for r in out.to_pylist():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(queries):
        want = golden.bm25(q, k=10)
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q
        assert [r["score"] for r in got] == [s for _, s in want], q


def test_web_flagship_matches_committed_golden():
    """The driver query compares against tests/golden/web_flagship.json
    and raises on drift; running it green here pins the committed bytes."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __ray_entry__

    t = __ray_entry__.queries()["web_flagship"]("/root/testdata/sf0.001")
    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "web_flagship.json"
    )
    with open(golden_path) as f:
        golden = json.load(f)
    assert t.num_rows == len(golden["rows"]) == 30
