"""Measure the predicted win regime of route_queries_by_head_term
(judge r3 directive #8): a LARGE-vocab corpus where the query stream
repeatedly hits mid-tail terms.

Why this regime: without routing, every actor in the BatchSearcher pool
ends up loading (pushdown-reading) and contribution-caching nearly every
queried term — with A actors and T distinct queried tail terms the pool
performs up to A×T term loads. Routing sorts the query stream by head
term so each tail term's queries land in ONE actor: ~T loads total. The
bench corpus (600-term vocab) cannot show this — every actor's cache
covers the whole vocabulary after one batch (the round-3 negative
result). Here the corpus has a 100k-term vocabulary and the workload
draws 2-term queries from a 512-term mid-tail sample, so affinity is the
difference between 8×512 and 512 posting loads.

Usage: PYTHONPATH=/root/repo python tools/routed_regime_bench.py
Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import time

N_DOCS = 200_000
VOCAB = 100_000
N_QUERIES = 4_000
QUERY_TERMS = 512
INDEX_DIR = "/tmp/lsr_routed_regime_index"
POOL = 8


def _corpus():
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(99)
    # uniform mid-tail vocab: every term appears in ~n_docs*len/VOCAB docs
    doc_len = rng.randint(20, 40, size=N_DOCS)
    total = int(doc_len.sum())
    ids = rng.randint(0, VOCAB, size=total)
    words = np.char.add("t", ids.astype("U6"))
    offsets = np.concatenate(([0], np.cumsum(doc_len)))
    texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(N_DOCS)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )


def _queries():
    import numpy as np

    rng = np.random.RandomState(7)
    pool = rng.choice(VOCAB, size=QUERY_TERMS, replace=False)
    out = []
    for _ in range(N_QUERIES):
        pair = rng.choice(pool, size=2, replace=False)
        out.append(" ".join(f"t{int(v)}" for v in pair))
    return out


def _stream(queries, routed: bool) -> float:
    import pyarrow as pa
    import ray
    import ray.data as rd

    from lsearch_ray.index.search import (
        BatchSearcher,
        route_queries_by_head_term,
    )

    qt = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": queries,
        }
    )
    ds = rd.from_arrow(qt).repartition(32)
    if routed:
        ds = route_queries_by_head_term(
            ds, num_routes=32, index_dir=INDEX_DIR
        )
    t0 = time.monotonic()
    ds.map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": INDEX_DIR, "k": 10},
        batch_format="pyarrow",
        batch_size=125,
        compute=ray.data.ActorPoolStrategy(
            size=POOL, max_tasks_in_flight_per_actor=2
        ),
    ).count()
    return time.monotonic() - t0


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False
    from lsearch_ray.index.build import build_index

    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    build_index(rd.from_arrow(_corpus()), INDEX_DIR, num_shards=64, resume=False)
    queries = _queries()
    # warm-up (pool spin-up costs) then alternate 3 measured pairs
    _stream(queries, routed=False)
    plain, routed = [], []
    for _ in range(3):
        plain.append(_stream(queries, routed=False))
        routed.append(_stream(queries, routed=True))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        json.dumps(
            {
                "metric": "routed vs unrouted qps (large-vocab tail regime)",
                "n_docs": N_DOCS,
                "vocab": VOCAB,
                "n_queries": N_QUERIES,
                "distinct_query_terms": QUERY_TERMS,
                "unrouted_s": [round(x, 2) for x in plain],
                "routed_s": [round(x, 2) for x in routed],
                "qps_unrouted": round(N_QUERIES / med(plain), 1),
                "qps_routed": round(N_QUERIES / med(routed), 1),
                "routed_speedup": round(med(plain) / med(routed), 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
