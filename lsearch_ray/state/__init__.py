"""Run state: metrics aggregation (M1-M3) and checkpoint manifests.

Manifest read/write lives with the index build (index/build.py); this
package holds the cross-stage observability layer.
"""

from lsearch_ray.state.metrics import AppStats, OpStats, RunStats, StatsCollector  # noqa: F401
