"""Per-operation metrics: the reference's observability layer, distributed.

Reference parity (SURVEY.md §2.7): M1 ``OperationStats`` (cli.rs:14-44 —
per (op, target): count, running-average latency ns, running-average
content size), M2 ``RunStats`` (cli.rs:46-113 — per run: loader, wall
time, ordered op stats, keys formatted ``"{Name}({target})"``,
search.rs:158-163), M3 ``AppStats`` (cli.rs:115-138 — the printed
collection).

Distribution model: batch functions run in Ray workers, so running means
can't live in driver locals like the reference's. A tiny ``StatsCollector``
actor receives fire-and-forget ``record`` calls from workers (one per
(batch, op) — amortized over the batch's rows, not per row) and merges
them with the same running-mean update the reference uses (cli.rs:34-43).
Ray Data's own ``ds.stats()`` complements this with per-stage wall/cpu
breakdowns; the index build additionally persists per-partition metrics
in shard manifests (build.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class OpStats:
    n: int = 0
    avg_t_ns: float = 0.0
    avg_size: float = 0.0

    def record(self, n: int, t_ns: float, size: float) -> None:
        """Merge a batch observation (running means, cli.rs:34-43)."""
        if n <= 0:
            return
        total = self.n + n
        # weighted running means
        self.avg_t_ns = (self.avg_t_ns * self.n + t_ns * n) / total
        self.avg_size = (self.avg_size * self.n + size * n) / total
        self.n = total


@dataclass
class RunStats:
    loader: str
    wall_us: float = 0.0
    ops: dict[str, OpStats] = field(default_factory=dict)

    def op(self, key: str) -> OpStats:
        return self.ops.setdefault(key, OpStats())

    def summary(self) -> str:
        lines = [f"run[{self.loader}] t={self.wall_us:.0f}us"]
        for key, s in self.ops.items():
            lines.append(
                f"  {key}: n={s.n} avg_t={s.avg_t_ns:.0f}ns avg_s={s.avg_size:.1f}"
            )
        return "\n".join(lines)


@dataclass
class AppStats:
    runs: list[RunStats] = field(default_factory=list)

    def summary(self) -> str:
        return "\n".join(r.summary() for r in self.runs)

    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "loader": r.loader,
                    "wall_us": r.wall_us,
                    "ops": {
                        k: {"n": s.n, "avg_t_ns": s.avg_t_ns, "avg_size": s.avg_size}
                        for k, s in r.ops.items()
                    },
                }
                for r in self.runs
            ],
            indent=1,
        )


class StatsCollector:
    """Aggregation actor: workers fire-and-forget per-batch op metrics.

    Wrap with ``ray.remote`` at use site (keeps this module import-safe
    without an initialized Ray):

        collector = ray.remote(StatsCollector).remote()
        ... batch fns call collector.record.remote(run_idx, loader, key, n, t_ns, sz)
        stats = ray.get(collector.snapshot.remote())
    """

    def __init__(self):
        self.app = AppStats()

    def record(
        self, run_idx: int, loader: str, key: str, n: int, t_ns: float, size: float
    ) -> None:
        while len(self.app.runs) <= run_idx:
            self.app.runs.append(RunStats(loader=loader))
        self.app.runs[run_idx].op(key).record(n, t_ns, size)

    def record_wall(self, run_idx: int, loader: str, wall_us: float) -> None:
        while len(self.app.runs) <= run_idx:
            self.app.runs.append(RunStats(loader=loader))
        self.app.runs[run_idx].wall_us += wall_us

    def snapshot(self) -> AppStats:
        return self.app
