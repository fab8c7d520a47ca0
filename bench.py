#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line per run.

Default: headline suite over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
at num_cpus=$RAY_GRAFT_CPUS (default 32):
  - index_build   — sharded inverted-index build over a deterministic
                    synthetic CC-style corpus (LSR_BENCH_DOCS rows,
                    default 200k, cached under /tmp) — the north metric,
                    reported as docs/sec
  - query_p95     — BM25 top-10 p95 latency over 100 queries via the
                    in-memory scatter-gather QueryEngine
  - query_stream  — 4000 queries streamed through the Dataset
                    BatchSearcher path (qps)
  - generic ops   — q1_agg, more_rank, bm25 dataset path, dedup, ANN over
                    the testdata tables

Every suite entry is the MEDIAN OF 3 in-session repetitions (host noise
on this box swings single runs ±2-4×; BASELINE.md "noise" notes), so the
one driver invocation is robust to landing in a bad window. The reported
``value`` is the sum of the per-entry medians. The Zipf routed/unrouted
affinity-routing pair is NOT part of the suite (opt in with
LSR_BENCH_ZIPF=1); its measurements live in BASELINE.md.

--index-only: index build only (used by --scaling subprocesses; keeps the
scaling protocol's best-of-LSR_BENCH_REPS aggregation).
--scaling: run index build at num_cpus=8 and 32 in fresh processes on the
same (pre-generated, page-cache-warmed) input; report both throughputs and
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("LSR_BENCH_DOCS", "200000"))
CORPUS_DIR = f"/tmp/lsr_bench_corpus_{BENCH_DOCS}"
CHUNK_DOCS = 25000  # docs per corpus parquet file (ensure_corpus)
INDEX_DIR = "/tmp/lsr_bench_index"
# 64 shards measured best for stage B on this box (2M docs: encode
# 5.9→3.3 s at 8 cpus and 6.5→2.5 s at 32 vs 32 shards, same sessions —
# smaller per-task working sets + better wave packing; 128 overshoots
# on per-task fixed costs). Rule of thumb: ~2× total cores.
NUM_SHARDS = int(os.environ.get("LSR_BENCH_SHARDS", "64"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NCPU,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False


def ensure_corpus() -> None:
    """Generate the bench corpus once (parallel deterministic chunks),
    cache under /tmp, and warm the page cache with one untimed read."""
    import pyarrow.parquet as pq
    import ray

    marker = os.path.join(CORPUS_DIR, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil

        from lsearch_ray.corpus import assign_doc_ids, make_corpus

        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        os.makedirs(CORPUS_DIR, exist_ok=True)
        chunk = CHUNK_DOCS
        n_chunks = (BENCH_DOCS + chunk - 1) // chunk

        @ray.remote
        def gen(i: int) -> int:
            n = min(chunk, BENCH_DOCS - i * chunk)
            t = assign_doc_ids(make_corpus(n, seed=42 + i, start=i * chunk))
            t = t.select(["doc_id", "url", "warc_ts", "text", "lang"])
            pq.write_table(t, os.path.join(CORPUS_DIR, f"part-{i:05d}.parquet"))
            return n

        total = sum(ray.get([gen.remote(i) for i in range(n_chunks)]))
        with open(marker, "w") as f:
            f.write(str(total))
    # warm page cache AND the Ray worker pool (untimed): parquet count()
    # alone is metadata-only, so run a real pass over the bytes
    import pyarrow as pa
    import ray.data as rd

    rd.read_parquet(CORPUS_DIR, columns=["doc_id", "text"]).map_batches(
        lambda b: pa.table({"n": [b.num_rows]}), batch_format="pyarrow"
    ).count()


def _corpus_slice(n_docs: int):
    """The first ``n_docs`` of the bench corpus as a DETERMINISTIC
    file-aligned slice. A streaming ``.limit(n)`` over the multi-file
    read takes whichever read blocks complete first — measured here
    returning a DIFFERENT doc subset run to run (e2e survivor counts
    wobbled 73.0k–96.5k on identical code) — so bench inputs are pinned
    by FILES. ``n_docs`` is rounded down to the 25k-doc chunk boundary
    (the env default and BENCH_DOCS are both aligned)."""
    import ray.data as rd

    k = max(1, n_docs // CHUNK_DOCS)
    files = sorted(
        os.path.join(CORPUS_DIR, f)
        for f in os.listdir(CORPUS_DIR)
        if f.startswith("part-") and f.endswith(".parquet")
    )[:k]
    return rd.read_parquet(files, columns=["doc_id", "text"])


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2


def bench_index_build(agg: str = "median") -> dict:
    """Timed index builds after an untimed warm-up. ``agg``:
    'median' (headline suite — robust to a single bad host window) or
    'best' (the --scaling protocol's documented best-of-reps)."""
    import ray.data as rd

    from lsearch_ray.index.build import build_index

    import shutil

    # untimed warm-up build on a slice: first-build costs (worker imports,
    # codec/parquet jit paths, Ray worker pool spin-up) are one-time and
    # irrelevant at production scale — the criterion is steady-state
    # throughput scaling
    warm_idx = INDEX_DIR + "_warm"
    shutil.rmtree(warm_idx, ignore_errors=True)
    warm_docs = _corpus_slice(min(100_000, BENCH_DOCS))
    build_index(warm_docs, warm_idx, num_shards=NUM_SHARDS, resume=False)
    shutil.rmtree(warm_idx, ignore_errors=True)

    import json as _json

    reps = int(os.environ.get("LSR_BENCH_REPS", "3" if agg == "median" else "1"))
    runs: list[tuple[float, dict]] = []
    n_docs = 0
    for _ in range(reps):
        shutil.rmtree(INDEX_DIR, ignore_errors=True)
        docs = rd.read_parquet(CORPUS_DIR, columns=["doc_id", "text"])
        t0 = time.monotonic()
        meta = build_index(docs, INDEX_DIR, num_shards=NUM_SHARDS, resume=False)
        dt = time.monotonic() - t0
        n_docs = meta.n_docs
        try:
            with open(os.path.join(INDEX_DIR, "metrics.json")) as f:
                stages = _json.load(f)["stages"]
        except Exception:
            stages = {}
        runs.append((dt, stages))
    runs.sort(key=lambda r: r[0])
    pick = runs[len(runs) // 2] if agg == "median" else runs[0]
    return {
        "sec": pick[0],
        "docs": n_docs,
        "docs_per_sec": n_docs / pick[0],
        "stages": pick[1],
        "reps": reps,
        "agg": agg,
        # best-of-reps alongside the median: r02/r03 reference numbers
        # were single (best-case-window) runs, so this is the comparable
        "best_sec": runs[0][0],
        "best_docs_per_sec": n_docs / runs[0][0],
    }


def _bench_queries_list(n: int) -> list[str]:
    from lsearch_ray.corpus import _VOCAB

    import numpy as np

    rng = np.random.RandomState(7)
    out = []
    for _ in range(n):
        k = rng.randint(1, 4)
        out.append(" ".join(rng.choice(_VOCAB, size=k, replace=False)))
    return out


def bench_query_serving() -> dict:
    """Median-of-3 latency loops over the same engine: the middle loop
    reflects steady state; a single loop can land in a host-noise spike
    (r03's p95 13.8 ms vs the same-day builder's 7.3 ms)."""
    import numpy as np

    from lsearch_ray.index.search import QueryEngine

    # 4 shard-group actors, not 8: per-query latency is dominated by the
    # scatter round's per-actor RPC cost at this index size (A/B warm:
    # p95 7.4-7.9 ms at 2-4 actors vs 9.1 ms at 8; p50 4.8-5.9 vs 6.8) —
    # wider pools only pay off when per-shard scoring work dominates
    eng = QueryEngine(INDEX_DIR, num_actors=min(4, NUM_SHARDS))
    queries = _bench_queries_list(100)
    eng.search("warm up please")  # actor init + warm
    loops = []
    for _ in range(3):
        lat = []
        for q in queries:
            t0 = time.monotonic()
            eng.search(q, k=10)
            lat.append(time.monotonic() - t0)
        lat = np.array(lat)
        loops.append(
            {
                "sec": float(lat.sum()),
                "p50_ms": float(np.percentile(lat, 50) * 1e3),
                "p95_ms": float(np.percentile(lat, 95) * 1e3),
            }
        )
    return {k: _median([r[k] for r in loops]) for k in loops[0]}


def _zipf_queries_list(n: int) -> list[str]:
    """Zipf-distributed query terms — the web-search workload shape
    (uniform _bench_queries_list can't show cache-affinity effects)."""
    import numpy as np

    from lsearch_ray.corpus import _VOCAB

    rng = np.random.RandomState(13)
    ranks = np.arange(1, len(_VOCAB) + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    out = []
    for _ in range(n):
        k = rng.randint(1, 4)
        out.append(" ".join(rng.choice(_VOCAB, size=k, replace=False, p=p)))
    return out


def _stream_queries(queries: list[str], *, routed: bool) -> tuple[float, int]:
    import pyarrow as pa
    import ray
    import ray.data as rd

    from lsearch_ray.index.search import BatchSearcher, route_queries_by_head_term

    qt = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": queries,
        }
    )
    # 32 blocks over 8 actors with a per-actor in-flight cap: without the
    # cap the executor piles queued batches onto the first actors that
    # report ready (measured: 3 actors get all the work while 5 idle —
    # wall 12s vs 6s), and more blocks than actors smooths stragglers;
    # see BASELINE.md "actor-pool dispatch skew"
    ds = rd.from_arrow(qt).repartition(32)
    if routed:
        ds = route_queries_by_head_term(
            ds, num_routes=32, index_dir=INDEX_DIR
        )
    t0 = time.monotonic()
    n = ds.map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": INDEX_DIR, "k": 10},
        batch_format="pyarrow",
        batch_size=125,  # one batch per block
        compute=ray.data.ActorPoolStrategy(
            size=8, max_tasks_in_flight_per_actor=2
        ),
    ).count()
    return time.monotonic() - t0, n


def bench_query_stream() -> dict:
    """Median-of-3 streaming runs (the actor pool is re-created per
    map_batches call, so single runs swing 6.7-10.3 s at sf0.1 —
    BASELINE.md noise notes). The Zipf routed/unrouted affinity pair is
    NOT part of the headline suite (its regime analysis lives in
    BASELINE.md); opt in with LSR_BENCH_ZIPF=1."""
    queries = _bench_queries_list(4000)
    runs = []
    n = 0
    for _ in range(3):
        dt, n = _stream_queries(queries, routed=False)
        runs.append(dt)
    dt = _median(runs)
    out = {"sec": dt, "result_rows": n, "qps": len(queries) / dt}
    if os.environ.get("LSR_BENCH_ZIPF"):
        zq = _zipf_queries_list(4000)
        dt_plain, _ = _stream_queries(zq, routed=False)
        dt_routed, _ = _stream_queries(zq, routed=True)
        out["zipf_qps_unrouted"] = len(zq) / dt_plain
        out["zipf_qps_routed"] = len(zq) / dt_routed
    return out


def bench_generic() -> dict:
    """Median-of-3 per generic op (each rep re-runs the full lazy
    pipeline including the parquet read)."""
    import __ray_entry__ as entry_mod

    out = {}
    qs = entry_mod.queries()
    for name in ["q1_agg", "more_rank", "bm25_or_topk", "dedup_events", "ann_cosine", "term_df"]:
        reps = []
        for _ in range(3):
            t0 = time.monotonic()
            res = qs[name](SF_DIR)
            # consume lazily-built datasets
            if hasattr(res, "count") and not hasattr(res, "num_rows"):
                res.count()
            reps.append(time.monotonic() - t0)
        out[name] = _median(reps)
    return out


def bench_e2e_curation() -> dict:
    """One streamed run of the composed training-data pipeline (quality
    gate → exact content dedup → ngram-Jaccard components →
    keep-min-per-cluster → cluster split → per-split packing) over the
    bench corpus — the composition is where accidental materializations
    between operator families would hide, so it is timed as a whole.
    Median-of-3; reports docs/s over the INPUT corpus and the survivor
    count (work scales with input, not survivors)."""
    import ray.data as rd

    from lsearch_ray.pipelines.curation import curate_corpus_ds

    n_docs = min(BENCH_DOCS, int(os.environ.get("LSR_E2E_DOCS", "100000")))
    n_docs = max(CHUNK_DOCS, (n_docs // CHUNK_DOCS) * CHUNK_DOCS)
    reps, survivors = [], 0
    for _ in range(3):
        t0 = time.monotonic()
        # gate thresholds tuned to the synthetic corpus's shape (it is
        # digit-heavy and stopword-poor by construction) so the later
        # stages — dedup, components, packing — see real volume; the
        # default thresholds would drop ~89% at the gate and turn the
        # composition bench into a gate bench
        out = curate_corpus_ds(
            _corpus_slice(n_docs),
            num_partitions=max(8, NCPU),
            quality_kwargs={"max_digit": 1.0, "min_stop": 0.0},
        )
        survivors = out.count()
        reps.append(time.monotonic() - t0)
    sec = _median(reps)
    return {
        "sec": sec,
        "docs": n_docs,
        "docs_per_sec": n_docs / sec,
        "survivors": survivors,
    }


def bench_line_dedup() -> dict:
    """CCNet-style per-line boilerplate removal over a pinned bench
    slice (reflow to 5-word lines → df count shuffle → blob join →
    vectorized rebuild). Side field like e2e_curation — NOT summed into
    ``value``. Median-of-3; removed_lines doubles as the determinism
    canary (file-pinned input → must be identical run to run)."""
    from lsearch_ray.functions import line_dedup_ds, reflow_lines_ds

    n_docs = min(BENCH_DOCS, 100_000)
    reps, removed = [], 0
    for _ in range(3):
        t0 = time.monotonic()
        out = line_dedup_ds(
            reflow_lines_ds(_corpus_slice(n_docs), words_per_line=5),
            min_docs=2,
            num_partitions=max(8, NCPU),
            # the sum consumer is order-independent — skip the terminal
            # range sort (the oracle contract, ~half the wall at sf0.1)
            sort=False,
        )
        removed = int(out.sum("removed_lines") or 0)
        reps.append(time.monotonic() - t0)
    sec = _median(reps)
    return {
        "sec": sec,
        "docs_per_sec": n_docs / sec,
        "removed_lines": removed,
    }


def _host_calibration() -> dict:
    """Quick in-invocation spin probe (single-thread + all-cores): the
    host's compute capacity DURING this bench run. Identical code
    measured 19.0 s vs 30.5 s suite walls 40 minutes apart on this box
    (BASELINE.md noise notes) — this field lets a reader normalize a
    single run against the window it landed in."""
    import multiprocessing as mp

    n = 6_000_000
    t1 = _spin(n)
    with mp.Pool(NCPU) as p:
        t0 = time.perf_counter()
        p.map(_spin, [n] * NCPU)
        tp = time.perf_counter() - t0
    return {
        "spin_1thread_mops": round(n / t1 / 1e6, 1),
        "spin_allcores_mops": round(NCPU * n / tp / 1e6, 1),
    }


def run_default(index_only: bool = False) -> dict:
    _init_ray()
    ensure_corpus()
    queries: dict[str, float] = {}
    # --index-only (scaling subprocess) keeps best-of-reps; the headline
    # suite is median-of-3 per entry
    ib = bench_index_build(agg="best" if index_only else "median")
    queries["index_build"] = round(ib["sec"], 3)
    result = {
        "metric": "headline suite wall time (median-of-3 per entry)"
        if not index_only
        else "headline suite wall time",
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "bench_docs": ib["docs"],
        "index_build_docs_per_sec": round(ib["docs_per_sec"], 1),
        "index_build_best_docs_per_sec": round(ib["best_docs_per_sec"], 1),
        "index_build_stages": ib.get("stages", {}),
        "index_build_agg": f"{ib['agg']}-of-{ib['reps']}",
    }
    if not index_only:
        qs = bench_query_serving()
        queries["query_serving"] = round(qs["sec"], 3)
        result["query_p50_ms"] = round(qs["p50_ms"], 2)
        result["query_p95_ms"] = round(qs["p95_ms"], 2)
        st = bench_query_stream()
        queries["query_stream"] = round(st["sec"], 3)
        result["query_stream_qps"] = round(st["qps"], 1)
        if "zipf_qps_unrouted" in st:
            result["zipf_qps_unrouted"] = round(st["zipf_qps_unrouted"], 1)
            result["zipf_qps_routed"] = round(st["zipf_qps_routed"], 1)
        for k, v in bench_generic().items():
            queries[k] = round(v, 3)
        # e2e composition: reported as side fields, NOT summed into
        # ``value`` — keeps the headline comparable with rounds 1-4
        e2e = bench_e2e_curation()
        result["e2e_curation_sec"] = round(e2e["sec"], 3)
        result["e2e_curation_docs"] = e2e["docs"]
        result["e2e_curation_docs_per_sec"] = round(e2e["docs_per_sec"], 1)
        result["e2e_curation_survivors"] = e2e["survivors"]
        ld = bench_line_dedup()
        result["line_dedup_sec"] = round(ld["sec"], 3)
        result["line_dedup_docs_per_sec"] = round(ld["docs_per_sec"], 1)
        result["line_dedup_removed_lines"] = ld["removed_lines"]
    result["queries"] = queries
    result["value"] = round(sum(queries.values()), 3)
    if not index_only:
        result["host_calibration"] = _host_calibration()
    return result


def _spin(n: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i * i
    return time.perf_counter() - t0


def measure_host_ceiling(lo: int = 8, hi: int = 32, reps: int = 2) -> dict:
    """Pure-CPU multiprocessing spin test: the maximum parallel speedup
    THIS host can give ANY job going lo→hi processes (no Ray, no IO).

    The box advertises 32 cpus but per-core throughput drops under full
    load (shared/throttled cores), so a perfectly parallel job cannot
    reach hi/lo; the scaling efficiency of the build is judged against
    this measured ceiling, not the nominal core count.
    """
    import multiprocessing as mp

    n = 12_000_000

    def thr(procs: int) -> float:
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_spin, [n] * procs * 3)
            return procs * 3 * n / (time.perf_counter() - t0)

    best_lo = max(thr(lo) for _ in range(reps))
    best_hi = max(thr(hi) for _ in range(reps))
    return {
        "ops_per_sec": {str(lo): round(best_lo), str(hi): round(best_hi)},
        "speedup": round(best_hi / best_lo, 3),
        "ceiling_efficiency": round((best_hi / best_lo) / (hi / lo), 3),
    }


def _stream(args) -> float:
    import numpy as np

    n_mb, reps = args
    arr = np.frombuffer(
        np.random.RandomState(0).bytes(n_mb << 20), dtype=np.uint8
    )
    t0 = time.perf_counter()
    s = 0
    for _ in range(reps):
        s += int(arr.astype(np.int64).sum())
    return time.perf_counter() - t0


def measure_memory_ceiling(lo: int = 8, hi: int = 32, reps: int = 2) -> dict:
    """Memory-streaming counterpart of :func:`measure_host_ceiling`: the
    parallel speedup available to BANDWIDTH-bound work. On this host the
    memory bus saturates near lo procs (hi can measure BELOW lo), which
    bounds what the encode stage can gain from extra local cores — on a
    real multi-node cluster each node brings its own memory bus, so this
    bound does not apply across nodes."""
    import multiprocessing as mp

    args = (96, 6)

    def thr(procs: int) -> float:
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_stream, [args] * procs)
            return procs * args[0] * args[1] / (time.perf_counter() - t0)

    best_lo = max(thr(lo) for _ in range(reps))
    best_hi = max(thr(hi) for _ in range(reps))
    return {
        "mb_per_sec": {str(lo): round(best_lo), str(hi): round(best_hi)},
        "speedup": round(best_hi / best_lo, 3),
        "ceiling_efficiency": round((best_hi / best_lo) / (hi / lo), 3),
    }


def run_scaling() -> dict:
    """Index build scaling at TWO parallelism pairs — 8→32 (the historic
    protocol) and 4→16 — fresh processes, same input. At 16 workers the
    measured ~6 GB/s memory-bandwidth wall is not yet binding (stage-B
    per-task inflation starts between 8 and 32 procs on this box), so
    the 4→16 raw efficiency is the honest multi-node predictor; the
    8→32 pair stays for continuity with rounds 1-4 and is additionally
    reported relative to the in-session CPU-ceiling probe. Headline
    ``value`` = the 4→16 raw efficiency (the north rule's N→4N form on
    the sub-bandwidth-wall range); set LSR_SCALING_PAIRS=8:32 to run a
    single pair.

    Protocol: 2 alternating-order rounds; each level runs in a fresh
    process that does an untimed warm-up build then takes the best of
    LSR_BENCH_REPS (default 4) timed in-session builds, with cooldowns
    between levels. Single-run wall times on this box vary ±2-4× with
    background host load on minute scales, so dense in-session sampling
    beats more cold sessions. The scaling corpus defaults to 2M docs
    (larger than the default bench corpus) so per-level work dominates
    fixed startup costs. A pure-CPU spin test and a memory-streaming test
    measured in the same session provide the host's parallel ceilings;
    `value_vs_ceiling` is the build's efficiency relative to the CPU
    ceiling (1.0 = the build scales as well as ANY compute-bound parallel
    job can on this box).
    """
    global BENCH_DOCS, CORPUS_DIR
    if "LSR_BENCH_DOCS" not in os.environ:
        BENCH_DOCS = 2_000_000
        CORPUS_DIR = f"/tmp/lsr_bench_corpus_{BENCH_DOCS}"
    # pre-generate the corpus so subprocesses measure compute, not gen
    _init_ray()
    ensure_corpus()
    import ray

    ray.shutdown()

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            LSR_BENCH_DOCS=str(BENCH_DOCS),
            LSR_BENCH_REPS=os.environ.get("LSR_BENCH_REPS", "4"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--index-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def scale_pair(lo: int, hi: int) -> dict:
        ceiling = measure_host_ceiling(lo, hi)
        mem_ceiling = measure_memory_ceiling(lo, hi)
        best: dict[int, dict] = {}
        for round_i in range(2):
            # alternate order so slow host drift doesn't bias one level;
            # each subprocess takes best-of-LSR_BENCH_REPS (default 4)
            # builds in one warm session — host noise swings ±3× on
            # minute scales, so dense sampling inside a session beats
            # more cold sessions
            order = (lo, hi) if round_i % 2 == 0 else (hi, lo)
            for ncpu in order:
                r = run(ncpu)
                if ncpu not in best or r["queries"]["index_build"] < best[
                    ncpu
                ]["queries"]["index_build"]:
                    best[ncpu] = r
                time.sleep(15)  # cooldown: consecutive heavy runs degrade
                                # 2-4x on this host (BASELINE.md noise)
        thr_lo = best[lo]["index_build_docs_per_sec"]
        thr_hi = best[hi]["index_build_docs_per_sec"]
        eff = (thr_hi / thr_lo) / (hi / lo)
        return {
            "efficiency": round(eff, 3),
            "efficiency_vs_ceiling": round(
                eff / ceiling["ceiling_efficiency"], 3
            )
            if ceiling["ceiling_efficiency"]
            else None,
            "host_ceiling_cpu": ceiling,
            "host_ceiling_memory": mem_ceiling,
            "num_cpus": [lo, hi],
            "docs_per_sec": {str(lo): thr_lo, str(hi): thr_hi},
            "sec": {
                str(lo): best[lo]["queries"]["index_build"],
                str(hi): best[hi]["queries"]["index_build"],
            },
            "stages": {
                str(lo): best[lo].get("index_build_stages", {}),
                str(hi): best[hi].get("index_build_stages", {}),
            },
        }

    pair_spec = os.environ.get("LSR_SCALING_PAIRS", "4:16,8:32")
    pairs: dict[str, dict] = {}
    for spec in pair_spec.split(","):
        lo_s, hi_s = spec.split(":")
        pairs[f"{lo_s}->{hi_s}"] = scale_pair(int(lo_s), int(hi_s))
    headline_key = "4->16" if "4->16" in pairs else next(iter(pairs))
    headline = pairs[headline_key]
    return {
        "metric": (
            f"index-build scaling efficiency (headline: {headline_key} raw)"
        ),
        "unit": "ratio",
        "value": headline["efficiency"],
        "pairs": pairs,
        "sf": SF_DIR,
        "bench_docs": BENCH_DOCS,
    }


def main():
    if "--scaling" in sys.argv:
        result = run_scaling()
    else:
        result = run_default(index_only="--index-only" in sys.argv)
        import ray

        ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
