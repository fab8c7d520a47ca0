"""Pure-Dataset fulltext pipelines vs golden reference (rounded scores)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from lsearch_ray.index.golden import golden_index
from lsearch_ray.pipelines import bm25_topk_dataset, doc_stats, term_df

PATH = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(PATH, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def golden():
    t = pq.read_table(PATH, columns=["doc_id", "text"])
    return golden_index(t["doc_id"].to_pylist(), t["text"].to_pylist())


def test_doc_stats(docs, golden):
    s = doc_stats(docs)
    assert s["n_docs"] == golden.n_docs
    assert s["avgdl"] == pytest.approx(golden.avgdl, rel=1e-12)


def test_term_df(docs, golden):
    got = {r["term"]: r["df"] for r in term_df(docs).take_all()}
    want = {t: len(p) for t, p in golden.postings.items()}
    assert got == want


@pytest.mark.parametrize("mode", ["or", "and"])
def test_bm25_dataset_matches_golden(docs, golden, mode):
    for q in ["scan merge", "hash join order", "window", "absent zzz scan"]:
        want = golden.bm25(q, k=10, mode=mode)
        got = bm25_topk_dataset(docs, q, k=10, mode=mode)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], (q, mode)
        for gs, (_, ws) in zip(got["score"].to_pylist(), want):
            assert gs == pytest.approx(ws, abs=5e-5)
