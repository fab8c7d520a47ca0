"""``python -m lsearch_ray.job`` — the ray-job-submit driver surface.

Runs in a subprocess because the job entry owns its own Ray session
(init + shutdown), which must not touch the pytest session fixture.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys


def _run(args: list[str]) -> str:
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "lsearch_ray.job", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd="/tmp",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_job_build_then_query_roundtrip():
    idx = "/tmp/lsearch_job_test_idx"
    shutil.rmtree(idx, ignore_errors=True)
    built = json.loads(
        _run(
            [
                "build",
                "--input",
                "/root/testdata/sf0.001/documents.parquet",
                "--index-dir",
                idx,
                "--shards",
                "4",
            ]
        ).strip().splitlines()[-1]
    )
    assert built["job"] == "build" and built["n_docs"] == 500

    qout = _run(
        ["query", "--index-dir", idx, "--query", "merge sort", "--k", "5"]
    )
    lines = qout.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["n_hits"] == 5
    # score lines precede the summary, formatted "[score] doc_id"
    hits = [ln for ln in lines if ln.startswith("[")]
    assert len(hits) == 5

    # rank-identity vs the library one-shot path
    from lsearch_ray.index.search import search_index

    want = [
        f"[{r['score']:.4f}] {r['doc_id']}"
        for r in search_index(idx, "merge sort", k=5).to_pylist()
    ]
    assert hits == want
