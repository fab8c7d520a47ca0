"""``ray job submit`` entry points — the cluster-facing driver the
north rule names (`BASELINE.json`: "run via ray job submit on a
fixed-size multi-node Ray cluster").

    ray job submit --working-dir . -- \
        python -m lsearch_ray.job build  --input 'pages/*.parquet' \
            --index-dir /mnt/index --shards 128
    ray job submit --working-dir . -- \
        python -m lsearch_ray.job query  --index-dir /mnt/index \
            --query 'merge sort' --k 10
    ray job submit --working-dir . -- \
        python -m lsearch_ray.job curate --input 'docs/*.parquet' \
            --output /mnt/curated

Each subcommand attaches to the cluster Ray the job runner provides
(``ray.init(address="auto")`` semantics via the guarded init — inside a
job the session already exists and the guard is a no-op), streams its
pipeline, writes its result, and prints ONE JSON summary line. The
build is resumable: re-submitting after a failure skips complete
shards via the per-partition manifests (`index/build.py`), which is
the checkpoint contract the north rule requires.

Only this module (and bench.py / cli.py / the test fixture) owns a Ray
session; the library never calls ray.init (driver contract,
`__ray_entry__.py`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    return ray


def _read_docs(pattern: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(pattern, columns=columns)


def cmd_build(a) -> dict:
    from lsearch_ray.index.build import build_index

    t0 = time.monotonic()
    docs = _read_docs(a.input, columns=[a.id_col, a.text_col])
    meta = build_index(
        docs,
        a.index_dir,
        num_shards=a.shards,
        text_col=a.text_col,
        id_col=a.id_col,
        resume=not a.no_resume,
        positions=a.positions,
    )
    wall = time.monotonic() - t0
    return {
        "job": "build",
        "index_dir": a.index_dir,
        "num_shards": a.shards,
        "n_docs": int(meta.n_docs),
        "sec": round(wall, 3),
        "docs_per_sec": round(meta.n_docs / wall, 1) if wall else None,
    }


def cmd_query(a) -> dict:
    from lsearch_ray.index.search import search_index

    t0 = time.monotonic()
    t = search_index(a.index_dir, a.query, k=a.k, mode=a.mode)
    wall = time.monotonic() - t0
    rows = t.to_pylist()
    for r in rows:
        print(f"[{r['score']:.4f}] {r['doc_id']}")
    return {
        "job": "query",
        "query": a.query,
        "k": a.k,
        "n_hits": len(rows),
        "sec": round(wall, 3),
    }


def cmd_curate(a) -> dict:
    from lsearch_ray.pipelines.curation import curate_corpus_ds

    t0 = time.monotonic()
    docs = _read_docs(a.input)
    out = curate_corpus_ds(
        docs, pack_capacity=a.pack_capacity
    )
    out.write_parquet(a.output)
    wall = time.monotonic() - t0
    import ray.data as rd

    n = rd.read_parquet(a.output).count()
    return {
        "job": "curate",
        "output": a.output,
        "n_rows": int(n),
        "sec": round(wall, 3),
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lsearch_ray.job")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the sharded BM25 index")
    b.add_argument("--input", required=True)
    b.add_argument("--index-dir", required=True)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--positions", action="store_true")
    b.add_argument("--no-resume", action="store_true")

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="or", choices=["or", "and"])

    c = sub.add_parser("curate", help="quality→dedup→split→pack pipeline")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--pack-capacity", type=int, default=2048)

    a = p.parse_args(argv)
    ray = _ray()
    try:
        summary = {"build": cmd_build, "query": cmd_query, "curate": cmd_curate}[
            a.cmd
        ](a)
    finally:
        ray.shutdown()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
