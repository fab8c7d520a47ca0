"""Regenerate tests/golden/web_flagship.json — the committed
(query_id, rank, doc_id, score) contract of the flagship web pipeline
over the deterministic seed-42 synthetic corpus.

No SQL oracle can run the html→extract→dedup→index→BM25 pipeline, so
the conformance contract is this golden artifact (the reference's own
correctness philosophy: committed worked examples, SURVEY.md §5). The
driver query itself (queries()["web_flagship"]) compares its live
result against these bytes and raises on drift, so the per-round
rows-only check is gated on the committed contract, not only on
pytest internals.

Usage: PYTHONPATH=/root/repo python tools/make_web_golden.py
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "web_flagship.json"
)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__

    t = __ray_entry__._web_flagship_result("/root/testdata/sf0.001")
    artifact = {
        "corpus": {"n_pages": 800, "seed": 42},
        "queries": ["the data search", "biology music", "word042"],
        "k": 10,
        "rows": [
            {
                "query_id": int(r["query_id"]),
                "rank": int(r["rank"]),
                "doc_id": int(r["doc_id"]),
                "score": float(r["score"]),
            }
            for r in t.to_pylist()
        ],
    }
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", os.path.abspath(OUT), len(artifact["rows"]), "rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
