"""The reference's scalar operators, re-expressed as Arrow batch transforms.

Operator semantics (SURVEY.md §2, with reference file:line):

- ``is`` / ``not``   — exact (in)equality      (search.rs:199-214 / 216-231)
- ``has`` / ``hasnt`` — substring containment  (search.rs:233-248 / 250-265)
- ``more``           — ``1 + count(non-overlapping matches)`` (search.rs:267-283)
- ``pass``           — constant 1.0            (search.rs:285-296)
- case-insensitive runs lowercase BOTH content and target
  (cli.rs:384-386, cli.rs:397); the fold is ASCII-only, matching the
  reference's ``to_ascii_lowercase``.
- conjunctive accumulation (cli.rs:391-412): per row the run's op scores
  are summed; any individual score < 1.0 drops the row (cli.rs:405-408).
- run chaining (cli.rs:465-500): each run consumes the survivors of the
  previous one; only the final run's score survives.
- ranking (cli.rs:495-496): sort score descending. The reference's
  reversed tie order is an artifact; we use the documented total order
  (score desc, id asc) — SURVEY.md §7 "hard parts" (e).

Content "loaders" (search.rs:27-154) become column projections:
an existing column by name, or derived ``title`` / ``ext`` from ``url``
(basename / suffix — L1/L3). ``content-exec`` (arbitrary subprocess per
record, search.rs:125-154) maps to arbitrary-callable projection — any
Python function ``batch -> string array`` — not a per-row shell-out.

Every op is a pyarrow.compute kernel over the batch; no Python row loops.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import ascii_lower

OP_KINDS = ("is", "not", "has", "hasnt", "more", "pass")


@dataclass(frozen=True)
class ScoreOp:
    """One (operator, target) pair of a run (reference ``ContentScorer``)."""

    kind: str
    target: str = ""

    def __post_init__(self):
        if self.kind not in OP_KINDS:
            raise ValueError(f"unknown op kind {self.kind!r}; one of {OP_KINDS}")


@dataclass(frozen=True)
class ContentRun:
    """One pipeline step: a content projection + conjunction of scored ops
    (reference ``ContentRun``, cli.rs:141-169)."""

    loader: str | Callable[[pa.Table], pa.Array]
    ops: tuple[ScoreOp, ...] = ()
    insensitive: bool = True


def _escape_regex(s: str) -> str:
    return "".join("\\" + c if c in r"\.^$*+?()[]{}|" else c for c in s)


def resolve_content(batch: pa.Table, loader) -> pa.Array:
    """Project the run's content column (the reference's ContentLoader)."""
    if callable(loader):
        out = loader(batch)
    elif loader in batch.column_names:
        out = batch[loader]
        if not pa.types.is_string(out.type) and not pa.types.is_large_string(
            out.type
        ):
            out = out.cast(pa.string())
    elif loader == "title":
        # basename: text after the last '/' (L1, search.rs:42-60)
        out = pc.replace_substring_regex(batch["url"], r"^.*/", "")
    elif loader == "ext":
        # suffix after the last '.', '' if none (L3, search.rs:79-97)
        ext = pc.extract_regex(batch["url"], r"\.(?P<ext>[^./]*)$")
        out = pc.fill_null(pc.struct_field(ext, "ext"), "")
    else:
        raise KeyError(f"no content loader/column {loader!r}")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def op_scores(content: pa.Array, op: ScoreOp, insensitive: bool) -> np.ndarray:
    """Vectorized per-row score of one op. Filters return 1.0/0.0; ``more``
    returns 1 + non-overlapping match count; ``pass`` returns 1.0."""
    target = ascii_lower(op.target) if insensitive else op.target
    if insensitive:
        content = pc.ascii_lower(content)
    n = len(content)
    if op.kind == "pass":
        return np.ones(n, dtype=np.float64)
    if op.kind == "is":
        mask = pc.equal(content, target)
    elif op.kind == "not":
        mask = pc.not_equal(content, target)
    elif op.kind == "has":
        mask = pc.match_substring(content, target)
    elif op.kind == "hasnt":
        mask = pc.invert(pc.match_substring(content, target))
    elif op.kind == "more":
        counts = pc.count_substring_regex(content, _escape_regex(target))
        return 1.0 + counts.to_numpy(zero_copy_only=False).astype(np.float64)
    else:  # pragma: no cover
        raise ValueError(op.kind)
    return (
        pc.fill_null(mask, False).to_numpy(zero_copy_only=False).astype(np.float64)
    )


def compile_run(
    run: ContentRun, stats_actor=None, run_idx: int = 0
) -> Callable[[pa.Table], pa.Table]:
    """Compile one run to a map_batches function: score + conjunctive
    filter, appending/replacing the ``score`` column.

    ``stats_actor`` (a ``ray.remote(StatsCollector)`` handle) receives one
    fire-and-forget per-(batch, op) metrics record — the distributed form
    of the reference's ``--stats`` running means (M1, cli.rs:14-44)."""
    loader_name = run.loader if isinstance(run.loader, str) else "<callable>"

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            if "score" not in batch.column_names:
                batch = batch.append_column(
                    "score", pa.array([], type=pa.float64())
                )
            return batch
        content = resolve_content(batch, run.loader)
        total = np.zeros(batch.num_rows, dtype=np.float64)
        keep = np.ones(batch.num_rows, dtype=bool)
        ops = run.ops if run.ops else (ScoreOp("pass"),)
        avg_size = None
        for op in ops:
            t0 = time.perf_counter_ns() if stats_actor is not None else 0
            s = op_scores(content, op, run.insensitive)
            keep &= s >= 1.0
            total += s
            if stats_actor is not None:
                if avg_size is None:
                    avg_size = float(
                        pc.mean(pc.utf8_length(content)).as_py() or 0.0
                    )
                stats_actor.record.remote(
                    run_idx,
                    loader_name,
                    f"{op.kind}({op.target})",
                    batch.num_rows,
                    (time.perf_counter_ns() - t0) / batch.num_rows,
                    avg_size,
                )
        if "score" in batch.column_names:
            batch = batch.drop_columns(["score"])
        batch = batch.append_column("score", pa.array(total, type=pa.float64()))
        return batch.filter(pa.array(keep))

    apply.__name__ = f"run_{loader_name}"
    return apply


def run_pipeline(
    ds,
    runs: list[ContentRun],
    *,
    id_col: str | None = None,
    k: int | None = None,
    sort: bool = True,
    stats_actor=None,
):
    """Chain runs over a Dataset (reference executor loop, cli.rs:465-500).

    Each run is a fused lazy ``map_batches``; the final sort (score desc,
    ``id_col`` asc for deterministic ties) is the only wide op and only
    runs when requested (mid-pipeline per-run sorts — cli.rs:495-496 —
    are presentation-only in the reference and would be pointless
    all-to-alls at scale).
    """
    for i, run in enumerate(runs):
        ds = ds.map_batches(
            compile_run(run, stats_actor, i), batch_format="pyarrow"
        )
    if sort:
        keys = ["score"] + ([id_col] if id_col else [])
        ds = ds.sort(keys, descending=[True] + [False] * (len(keys) - 1))
    if k is not None:
        ds = ds.limit(k)
    return ds


def explain(runs: list[ContentRun]) -> str:
    """Plan summary (reference ``--strats``, cli.rs:326-341)."""
    lines = []
    for i, run in enumerate(runs):
        loader = run.loader if isinstance(run.loader, str) else "<callable>"
        sens = "insensitive" if run.insensitive else "sensitive"
        ops = ", ".join(f"{o.kind}({o.target})" for o in (run.ops or (ScoreOp("pass"),)))
        lines.append(f"run {i}: load[{loader}] ({sens}) -> [{ops}]")
    return "\n".join(lines)
