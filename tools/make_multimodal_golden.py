"""Regenerate the committed multimodal golden contracts —
tests/golden/{image,audio,video}_embed_knn.json, the
(id, neighbor_id, rn, sim_micro) contracts of the three
decode → embed → knn_join pipelines over their deterministic fixtures.

No SQL oracle can run the PPM/WAV/Y4M decodes, so the conformance
contract is the golden artifact (same philosophy as web_flagship). Each
driver query (queries()["<name>_embed_knn"]) compares its live result
against these bytes and raises on drift. A pytest per modality
additionally verifies the pipeline against an independent reference
(in-process numpy / stdlib ``wave`` / byte-level Y4M), so the golden
pins determinism while the test pins correctness.

Usage: PYTHONPATH=/root/repo python tools/make_multimodal_golden.py [image|audio|video|all]
"""

from __future__ import annotations

import json
import os
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

# name -> (result fn attr on __ray_entry__, id column, fixture/feature meta)
SPECS = {
    "image": (
        "_image_embed_knn_result",
        "img_id",
        {
            "fixture": {"n_images": 48, "h": 16, "w": 16, "seed": 77},
            "feature": {"grid": 4, "bins": 8, "dim": 72},
        },
    ),
    "audio": (
        "_audio_embed_knn_result",
        "clip_id",
        {
            "fixture": {
                "n_clips": 48, "n_samples": 256, "rate": 8000, "seed": 99,
            },
            "feature": {"segments": 8, "bins": 8, "dim": 24},
        },
    ),
    "video": (
        "_video_embed_knn_result",
        "vid_id",
        {
            "fixture": {
                "n_videos": 48, "frames": 6, "w": 16, "h": 16, "seed": 55,
            },
            "feature": {"grid": 4, "bins": 8, "dim": 24, "every_n": 2},
        },
    ),
}


def write_golden(modality: str) -> None:
    import __ray_entry__

    fn_name, id_col, meta = SPECS[modality]
    t = getattr(__ray_entry__, fn_name)()
    artifact = {
        **meta,
        "k": 3,
        "rows": [
            {
                id_col: int(r[id_col]),
                "neighbor_id": int(r["neighbor_id"]),
                "rn": int(r["rn"]),
                "sim_micro": int(r["sim_micro"]),
            }
            for r in t.to_pylist()
        ],
    }
    out = os.path.abspath(
        os.path.join(GOLDEN_DIR, f"{modality}_embed_knn.json")
    )
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", out, len(artifact["rows"]), "rows")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SPECS) if which == "all" else [which]
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    for name in names:
        write_golden(name)
    ray.shutdown()


if __name__ == "__main__":
    main()
