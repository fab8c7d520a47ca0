"""Regenerate tests/golden/video_embed_knn.json — the committed
(vid_id, neighbor_id, rn, sim_micro) contract of the video
frame-sample → embed → mean-pool → knn_join pipeline over the
deterministic Y4M fixture.

No SQL oracle can run the Y4M frame split, so the conformance contract
is this golden artifact (same philosophy as image/audio). The driver
query (queries()["video_embed_knn"]) compares its live result against
these bytes and raises on drift. A pytest additionally verifies the
pipeline against an independent byte-level Y4M reference, so the golden
pins determinism while the test pins correctness.

Usage: PYTHONPATH=/root/repo python tools/make_video_golden.py
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "video_embed_knn.json"
)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__

    t = __ray_entry__._video_embed_knn_result()
    artifact = {
        "fixture": {"n_videos": 48, "frames": 6, "w": 16, "h": 16, "seed": 55},
        "feature": {"grid": 4, "bins": 8, "dim": 24, "every_n": 2},
        "k": 3,
        "rows": [
            {
                "vid_id": int(r["vid_id"]),
                "neighbor_id": int(r["neighbor_id"]),
                "rn": int(r["rn"]),
                "sim_micro": int(r["sim_micro"]),
            }
            for r in t.to_pylist()
        ],
    }
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", os.path.abspath(OUT), len(artifact["rows"]), "rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
