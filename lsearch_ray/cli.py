"""CLI mirroring the reference's surface over parquet corpora.

The reference is a file-search CLI (``lsearch PATTERN -th needle -Ee rs``,
README.md:17-22); here the same token-stream grammar drives the Ray
engine over parquet tables of documents/pages.

Reference parity:
- C1 custom token parser (cli.rs:209-257): ``--long``/``-x`` flags,
  bundled short flags (``-th``), positional values attaching to the last
  flag (cli.rs:251-253);
- C2 plan builder (cli.rs:259-319): a loader token flushes the current
  run if valid, scorer tokens append (op, target) pairs; default run is
  ``{title, [pass]}``; the first-run-insensitive default (cli.rs:150,261)
  and ``--insensitive`` flip (cli.rs:286-288);
- P6 ``--strats`` plan summary (cli.rs:326-341), P7 ``--echo``
  (cli.rs:434-437), M3 ``--stats`` (cli.rs:510-512);
- S1-S7 source flags (``--recursive``, ``--hidden``), K1-K5 output modes
  (``--score``, ``--long``).

Loaders map to the web table: ``content-text``→``text`` column,
``content-title``→derived title, ``content-path``→``url``/id,
``content-ext``→derived extension; plus any column name directly.

Usage:
    python -m lsearch_ray.cli 'corpus/*.parquet' --content-text -h biology -m biology --score
"""

from __future__ import annotations

import os
import sys

from lsearch_ray.stages.ops import ContentRun, ScoreOp, explain


def _load_spec() -> dict:
    """Parse the declarative flag spec (cli.yaml, the clap-yaml
    counterpart of the reference's src/cli.yaml — C3) into the parser
    tables. The spec file is the single source of truth for the CLI
    surface; code below only interprets token streams against it."""
    import yaml

    with open(os.path.join(os.path.dirname(__file__), "cli.yaml")) as f:
        spec = yaml.safe_load(f)
    scorers: dict[str, str] = {}
    loaders: dict[str, str] = {}
    bools: set[str] = set()
    shorts: dict[str, str] = {}
    for entry in spec["args"]:
        (name, cfg), = entry.items()
        kind = cfg["kind"]
        if kind == "scorer":
            scorers[name] = name
        elif kind == "loader":
            loaders[name] = cfg["maps_to"]
        elif kind == "bool":
            bools.add(name)
        # kind == "exec" (content-exec) is handled structurally below
        if "short" in cfg:
            shorts[str(cfg["short"])] = name
    shorts.update(spec.get("extra_shorts", {}))
    return {
        "spec": spec,
        "scorers": scorers,
        "loaders": loaders,
        "bools": bools,
        "shorts": shorts,
    }


_TABLES = _load_spec()
_SCORER_FLAGS = _TABLES["scorers"]
_SHORT = _TABLES["shorts"]
_LOADER_FLAGS = _TABLES["loaders"]
_BOOL_FLAGS = _TABLES["bools"]


def parse_tokens(argv: list[str]):
    """C1: re-parse the raw token stream preserving order.

    Returns (patterns, ordered tokens, bool flags, k).
    """
    patterns: list[str] = []
    tokens: list[tuple[str, str | None]] = []  # (name, pending_target)
    flags: set[str] = set()
    k: int | None = None
    i = 0
    expecting_target_for: str | None = None
    while i < len(argv):
        a = argv[i]
        if a == "--top":
            i += 1
            k = int(argv[i])
        elif a.startswith("--"):
            name = a[2:]
            if name in _BOOL_FLAGS:
                flags.add(name)
            elif name in _LOADER_FLAGS or name in _SCORER_FLAGS:
                tokens.append((name, None))
                expecting_target_for = name if name in _SCORER_FLAGS else None
            elif name == "content-exec":
                # the reference's extension point (search.rs:125-154: run a
                # command per record, stdout becomes content) in batch
                # shape: the next token names a python callable module:fn
                # mapping an Arrow batch -> content array
                tokens.append((name, None))
                expecting_target_for = name
            else:
                raise SystemExit(f"unknown flag {a}")
        elif a.startswith("-") and len(a) > 1:
            # bundled short flags: -th == --content-text --has (cli.rs:242-250)
            for ch in a[1:]:
                if ch not in _SHORT:
                    raise SystemExit(f"unknown short flag -{ch}")
                name = _SHORT[ch]
                if name in _BOOL_FLAGS:
                    flags.add(name)
                else:
                    tokens.append((name, None))
                    expecting_target_for = (
                        name
                        if name in _SCORER_FLAGS or name == "content-exec"
                        else None
                    )
        else:
            # positional: attaches to the last scorer flag (cli.rs:251-253),
            # else it's a pattern
            if expecting_target_for is not None and tokens and tokens[-1][1] is None and (tokens[-1][0] in _SCORER_FLAGS or tokens[-1][0] == "content-exec"):
                tokens[-1] = (tokens[-1][0], a)
                expecting_target_for = None
            else:
                patterns.append(a)
        i += 1
    return patterns, tokens, flags, k


class _ExecLoader:
    """Worker-side re-resolving wrapper for a ``module:function`` UDF.

    A module-level function cloudpickles by REFERENCE, so map_batches
    workers must import the user's module themselves; this wrapper carries
    the spec plus the module's directory (workers don't inherit the
    driver's sys.path/cwd) and resolves once per worker process.
    """

    def __init__(self, spec: str, search_path: str | None):
        self.spec = spec
        self.search_path = search_path
        self._fn = None

    def __call__(self, batch):
        if self._fn is None:
            import importlib
            import sys as _sys

            if self.search_path and self.search_path not in _sys.path:
                _sys.path.insert(0, self.search_path)
            mod_name, fn_name = self.spec.split(":", 1)
            self._fn = getattr(importlib.import_module(mod_name), fn_name)
        return self._fn(batch)


def _load_callable(spec: str):
    """Resolve a ``module:function`` spec to the user's content UDF.

    The callable receives each Arrow batch (pa.Table) and returns the
    content column (pa.Array / list of str) — the batch-shaped equivalent
    of the reference's per-record exec loader (search.rs:125-154).
    Validated eagerly on the driver; workers re-resolve via _ExecLoader.
    """
    import importlib
    import os

    if ":" not in spec:
        raise SystemExit(
            f"--content-exec expects module:function, got {spec!r}"
        )
    mod_name, fn_name = spec.split(":", 1)
    try:
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, fn_name)
    except (ImportError, AttributeError) as e:
        raise SystemExit(f"--content-exec cannot load {spec!r}: {e}")
    if not callable(fn):
        raise SystemExit(f"--content-exec target {spec!r} is not callable")
    search_path = None
    mod_file = getattr(mod, "__file__", None)
    if mod_file:
        search_path = os.path.dirname(os.path.abspath(mod_file))
    return _ExecLoader(spec, search_path)


def build_runs(tokens, flags) -> list[ContentRun]:
    """C2: token stream → list of ContentRuns (cli.rs:259-319)."""
    runs: list[ContentRun] = []
    cur_loader = "title"
    cur_ops: list[ScoreOp] = []
    # default run: insensitive; explicitly-started runs: sensitive unless
    # --insensitive (cli.rs:150,261,264,273,283,286-288)
    cur_insensitive = True
    explicit = "insensitive" in flags

    def flush():
        nonlocal cur_ops
        if cur_ops:
            runs.append(ContentRun(cur_loader, tuple(cur_ops), cur_insensitive))
            cur_ops = []

    for name, target in tokens:
        if name in _LOADER_FLAGS:
            flush()
            cur_loader = _LOADER_FLAGS[name]
            cur_insensitive = explicit
        elif name == "content-exec":
            flush()
            cur_loader = _load_callable(target or "")
            cur_insensitive = explicit
        elif name in _SCORER_FLAGS:
            kind = _SCORER_FLAGS[name]
            if kind == "less":
                # parity quirk: declared but never implemented in the
                # reference → silently ignored (SURVEY.md §2.5 R2)
                continue
            cur_ops.append(ScoreOp(kind, target or ""))
    flush()
    if not runs:
        runs.append(ContentRun(cur_loader, (ScoreOp("pass"),), True))
    return runs


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    patterns, tokens, flags, k = parse_tokens(argv)
    if not patterns:
        patterns = ["./*.parquet"]
    if "echo" in flags:
        print("lsearch-ray " + " ".join(argv))
    runs = build_runs(tokens, flags)
    if "strats" in flags:
        # pure EXPLAIN: print the compiled plan and exit (the reference
        # prints then also executes, cli.rs:439-441; an execution-free
        # EXPLAIN is the useful form for a distributed engine)
        print(explain(runs))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from lsearch_ray.sources import read_pages
    from lsearch_ray.stages.ops import run_pipeline
    from lsearch_ray.stages.sinks import print_results

    stats_actor = None
    if "stats" in flags:
        from lsearch_ray.state.metrics import StatsCollector

        stats_actor = ray.remote(StatsCollector).remote()

    for pattern in patterns:  # S7: each pattern an independent query
        ds = read_pages(
            pattern,
            recursive="recursive" in flags,
            hidden="hidden" in flags,
        )
        id_col = "doc_id" if "doc_id" in ds.schema().names else None
        label_col = "url" if "url" in ds.schema().names else (
            id_col or ds.schema().names[0]
        )
        out = run_pipeline(
            ds, runs, id_col=id_col, k=k, stats_actor=stats_actor
        )
        table = out.limit(k or 1000).to_pandas()
        import pyarrow as pa

        table = pa.Table.from_pandas(table, preserve_index=False)
        mode = "score" if "score" in flags else ("long" if "long" in flags else "grid")
        if "snippet" in flags and "text" in table.column_names:
            from lsearch_ray.stages.sinks import make_snippets

            # highlight the scorer targets of every run (has/is/more)
            targets = [
                op.target for run in runs for op in run.ops if op.target
            ]
            table = make_snippets(table, targets)
            for lbl, snip in zip(
                table[label_col].to_pylist(), table["snippet"].to_pylist()
            ):
                print(f"{lbl}: {snip}")
            continue
        cols = [label_col] + (["score"] if "score" in table.column_names else [])
        print(
            print_results(
                table.select([c for c in cols if c in table.column_names])
                if mode != "long"
                else table,
                label_col=label_col,
                mode=mode,
            )
        )
    if stats_actor is not None:
        app = ray.get(stats_actor.snapshot.remote())
        print(app.summary())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
