"""Regenerate tests/golden/audio_embed_knn.json — the committed
(clip_id, neighbor_id, rn, sim_micro) contract of the audio
decode → embed → knn_join pipeline over the deterministic WAV fixture.

No SQL oracle can run the WAV decode, so the conformance contract is
this golden artifact (same philosophy as image_embed_knn). The driver
query (queries()["audio_embed_knn"]) compares its live result against
these bytes and raises on drift. A pytest additionally verifies the
pipeline against an independent stdlib-``wave`` + numpy reference, so
the golden pins determinism while the test pins correctness.

Usage: PYTHONPATH=/root/repo python tools/make_audio_golden.py
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "audio_embed_knn.json"
)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__

    t = __ray_entry__._audio_embed_knn_result()
    artifact = {
        "fixture": {"n_clips": 48, "n_samples": 256, "rate": 8000, "seed": 99},
        "feature": {"segments": 8, "bins": 8, "dim": 24},
        "k": 3,
        "rows": [
            {
                "clip_id": int(r["clip_id"]),
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
