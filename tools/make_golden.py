"""Generate the committed golden query-set artifact (FIXTURES.md §1).

Corpus: the deduped 5000-row deterministic synthetic web corpus
(seed=42). Queries: 50 deterministic mixes of 1-4 vocabulary terms
(head + tail + absent), alternating OR/AND. Golden results come from the
pure-Python reference implementation (index/golden.py); the engine must
reproduce them rank-identically (tests/test_golden_set.py).

Usage: PYTHONPATH=/root/repo python tools/make_golden.py
Writes tests/golden/golden_queries.json.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from lsearch_ray.corpus import _VOCAB, assign_doc_ids, make_corpus
from lsearch_ray.index.golden import golden_index

N_DOCS = 5000
SEED = 42
N_QUERIES = 50


def corpus_deduped() -> pa.Table:
    t = assign_doc_ids(make_corpus(N_DOCS, seed=SEED))
    first = np.sort(np.unique(t["doc_id"].to_numpy(), return_index=True)[1])
    return t.take(pa.array(first))


def query_set() -> list[dict]:
    rng = np.random.RandomState(777)
    vocab = list(_VOCAB) + ["absenttoken", "zzzqqq"]
    out = []
    for qid in range(N_QUERIES):
        k = int(rng.randint(1, 5))
        terms = rng.choice(vocab, size=k, replace=False).tolist()
        if qid % 7 == 6 and k > 1:
            # negation clause: exclude the last term (query-level Not)
            terms[-1] = "-" + terms[-1]
        out.append(
            {
                "query_id": qid,
                "query": " ".join(terms),
                "mode": "and" if qid % 3 == 2 else "or",
            }
        )
    return out


def main() -> None:
    t = corpus_deduped()
    golden = golden_index(t["doc_id"].to_pylist(), t["text"].to_pylist())
    queries = query_set()
    results = []
    for q in queries:
        for rank, (doc_id, score) in enumerate(
            golden.bm25(q["query"], k=10, mode=q["mode"]), start=1
        ):
            results.append(
                {
                    "query_id": q["query_id"],
                    "rank": rank,
                    "doc_id": int(doc_id),
                    # float64 hex round-trips exactly — the artifact pins
                    # bit-for-bit scores
                    "score_hex": float(score).hex(),
                    "score": score,
                }
            )
    artifact = {
        "corpus": {"n_docs": N_DOCS, "seed": SEED, "deduped_n": t.num_rows},
        "bm25": {"k1": 1.2, "b": 0.75, "k": 10},
        "queries": queries,
        "results": results,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden_queries.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}: {len(queries)} queries, {len(results)} result rows")


if __name__ == "__main__":
    main()
