"""Committed golden survivor sets for the APPROXIMATE dedup variants.

MinHash/SimHash survivors depend on seeded permutations / bit votes, so
no SQL oracle can re-derive them; the conformance contract is this
seeded artifact over the deterministic sf0.001 documents table
(regenerate: tools/make_dedup_golden.py). The exact variants
(ngram_jaccard, embedding, exact) are DuckDB-oracle-checked in
__ray_entry__ instead.
"""

from __future__ import annotations

import json
import os

import pytest
import ray.data as rd

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "golden", "dedup_survivors.json"
)
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def golden():
    with open(ARTIFACT) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def docs_ds():
    if not os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
        pytest.skip("driver testdata not present")
    return rd.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )


def test_minhash_survivors_match_golden(golden, docs_ds):
    from lsearch_ray.functions import minhash_dedup

    p = golden["minhash"]["params"]
    got = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            docs_ds,
            threshold=p["threshold"],
            num_perm=p["num_perm"],
            bands=p["bands"],
            ngram=p["ngram"],
            seed=p["seed"],
        ).take_all()
    )
    assert got == golden["minhash"]["survivors"]


def test_simhash_survivors_match_golden(golden, docs_ds):
    from lsearch_ray.functions import simhash_dedup

    p = golden["simhash"]["params"]
    got = sorted(
        r["doc_id"]
        for r in simhash_dedup(docs_ds, max_hamming=p["max_hamming"]).take_all()
    )
    assert got == golden["simhash"]["survivors"]
