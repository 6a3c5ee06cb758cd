"""Extraction cost of multi-octave scale space on the chip (VERDICT r4
item 5: flip the production default if the cost is < 30%).

Times the production `_extract_raw` program at n_octaves = 1, 2, 3 on a
16-frame QVGA batch (warm), plus keypoint-yield stats.

Usage: python bench_scripts/octave_cost.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SFMX_JAX_CACHE", "/root/repo/.jax_cache")

import jax
import numpy as np

if os.environ["SFMX_JAX_CACHE"].lower() != "off":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SFMX_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _force(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    from examples.room import RoomTexture, render_room, walk_poses
    from sfmx.cli.config import FeatureConfig, PipelineConfig
    from sfmx.cli.pipeline import _extract_raw

    tex = RoomTexture(seed=7)
    poses = walk_poses(16)
    imgs = np.stack([render_room(tex, R, eye, 320, 240, 280.0)
                     for (R, t, eye) in poses]).astype(np.float32)
    out = {}
    base = None
    for n_oct in (1, 2, 3):
        cfg = PipelineConfig(features=FeatureConfig(max_keypoints=512,
                                                    n_octaves=n_oct))
        t0 = time.time()
        f = _extract_raw(imgs, cfg)
        _force(f.kp.response)
        compile_s = time.time() - t0
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            f = _extract_raw(imgs, cfg)
        _force(f.kp.response)
        dt = (time.time() - t0) / reps
        mask = np.asarray(f.kp.mask)
        sig = np.asarray(f.kp.sigma)[mask]
        fps = 16 / dt
        if base is None:
            base = fps
        out[f"octaves_{n_oct}"] = {
            "fps": round(fps, 1),
            "cost_vs_1oct": round(base / fps - 1.0, 3),
            "compile_s": round(compile_s, 1),
            "kp_per_img": round(float(mask.sum()) / 16, 1),
            "sigma_p50": float(np.percentile(sig, 50)),
            "sigma_p90": float(np.percentile(sig, 90)),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
