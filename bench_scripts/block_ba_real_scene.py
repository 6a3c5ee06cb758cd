"""Point-sharded block BA on a RECONSTRUCTED scene (VERDICT r3 item 1).

Loads a scene produced by `sfmx build-map`, partitions its REAL
covisibility structure over an 8-virtual-device mesh, and runs the
point-sharded distributed solve (dist/block_ba.py) — the partitioner and
halo sizing have only ever been fed synthetic sliding-window tables before
this.  Prints one JSON line: halo fraction, per-block load balance, LM
cost trajectory.

Run in its OWN process (CPU backend + 8 virtual devices cannot coexist
with the TPU tunnel in one process):

  python bench_scripts/block_ba_real_scene.py /path/to/map [--iters 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("map_path")
p.add_argument("--iters", type=int, default=4)
p.add_argument("--cg-iters", type=int, default=15)
args = p.parse_args()

from sfmx.dist import block_ba, mesh as meshlib
from sfmx.mapstore import load_scene

scene = load_scene(args.map_path)
alive = np.asarray(scene.obs_alive)
cam_id = np.asarray(scene.obs_cam)[alive]
pt_id = np.asarray(scene.obs_pt)[alive]
uv = np.asarray(scene.obs_uv)[alive]
C = int(np.asarray(scene.cam_R).shape[0])
P = int(np.asarray(scene.X).shape[0])
w = np.ones(len(cam_id), np.float32)
registered = np.asarray(scene.cam_alive)
fixed = ~registered
fixed[np.flatnonzero(registered)[0]] = True

mesh = meshlib.make_mesh(block_ba.AXIS)
t0 = time.time()
R2, t2, X2, costs, stats = block_ba.ba_solve_blocked(
    np.asarray(scene.intr), np.asarray(scene.cam_k),
    np.asarray(scene.cam_R), np.asarray(scene.cam_t), np.asarray(scene.X),
    cam_id, pt_id, uv, w, fixed, mesh,
    iters=args.iters, cg_iters=args.cg_iters)
wall = time.time() - t0
costs = np.asarray(costs)
print(json.dumps({
    "map": args.map_path, "n_cams": int(registered.sum()), "n_pts": P,
    "n_obs": int(len(cam_id)), "n_blocks": int(np.prod(mesh.devices.shape)),
    "halo_fraction": stats.get("halo_fraction"),
    **{k: v for k, v in stats.items() if k != "halo_fraction"},
    "cost0": float(costs[0]), "cost_final": float(costs[-1]),
    "cost_monotone_ok": bool(costs[-1] <= costs[0]),
    "wall_s": round(wall, 1),
}))
