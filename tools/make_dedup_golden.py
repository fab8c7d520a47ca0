"""Regenerate tests/golden/dedup_survivors.json — the committed survivor
sets of the APPROXIMATE dedup variants (minhash, simhash) over the
deterministic sf0.001 documents table.

MinHash/SimHash outputs depend on seeded permutations/bit votes, so no
SQL oracle can re-derive them; the conformance contract is instead this
seeded golden artifact (the reference's own correctness philosophy:
committed worked examples, SURVEY.md §5). ngram_jaccard / embedding
dedup have exact DuckDB oracles in __ray_entry__ and need no golden.

Usage: PYTHONPATH=/root/repo python tools/make_dedup_golden.py
"""

from __future__ import annotations

import json
import os

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "dedup_survivors.json")


def main() -> None:
    import ray
    import ray.data as rd

    from lsearch_ray.functions import minhash_dedup, simhash_dedup

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    docs = rd.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    artifact = {
        "sf_dir": SF_DIR,
        "minhash": {
            "params": {"threshold": 0.8, "num_perm": 128, "bands": 32, "ngram": 3, "seed": 12345},
            "survivors": sorted(
                r["doc_id"] for r in minhash_dedup(docs, threshold=0.8).take_all()
            ),
        },
        "simhash": {
            "params": {"max_hamming": 2},
            "survivors": sorted(
                r["doc_id"] for r in simhash_dedup(docs, max_hamming=2).take_all()
            ),
        },
    }
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        "wrote",
        os.path.abspath(OUT),
        {k: len(v["survivors"]) for k, v in artifact.items() if isinstance(v, dict)},
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
