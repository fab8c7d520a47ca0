"""Reference scalar operators as vectorized Ray Data batch transforms."""

from lsearch_ray.stages.ops import (  # noqa: F401
    ContentRun,
    ScoreOp,
    explain,
    op_scores,
    resolve_content,
    run_pipeline,
)
