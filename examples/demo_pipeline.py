"""End-to-end demo drive: rendered images -> map -> localization -> ATE.

Renders a textured room interior from a walkthrough camera arc (real images, not
mocked descriptors), then runs the full public pipeline:
  detect_and_describe -> match_pairs_float -> geometric verify -> build_tracks
  -> reconstruct -> save/load map -> localize a held-out query -> ATE report.

Usage: python examples/demo_pipeline.py [--platform cpu]
"""
import argparse
import os
import sys
import time

# make `python examples/demo_pipeline.py` work from any cwd (Python 3.12
# puts the SCRIPT dir, not the cwd, on sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
p.add_argument("--cams", type=int, default=12)
p.add_argument("--queries", type=int, default=2)
args = p.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp

from sfmx.kernels import features, matching
from sfmx.localize import build_localization_map, localize_query
from sfmx.mapstore import save_scene, load_scene
from sfmx.recon import tracks
from sfmx.recon.incremental import ReconConfig, reconstruct
from sfmx.cli.evaluate import evaluate_trajectory, scene_stats
from sfmx.solvers import umeyama

from examples.room import RoomTexture, render_room, walk_poses, look_at

H, W = 240, 320
FOCAL = 280.0


def main():
    tex = RoomTexture(seed=3)
    C = args.cams
    t0 = time.time()
    poses = walk_poses(C)
    images = [render_room(tex, R, eye, W, H, FOCAL) for (R, t, eye) in poses]
    print(f"[render] {C} room images {W}x{H} in {time.time()-t0:.1f}s")

    batch = jnp.asarray(np.stack(images), jnp.float32)
    t0 = time.time()
    feats = features.detect_and_describe(batch, max_keypoints=512, threshold=1e-7)
    n_kp = np.asarray(feats.kp.mask.sum(axis=1))
    print(f"[features] keypoints/image: {n_kp} in {time.time()-t0:.1f}s")

    pairs = np.array([(a, b) for a in range(C) for b in range(a + 1, C)], np.int32)
    t0 = time.time()
    res = matching.match_pairs_float(feats.desc, feats.kp.mask, jnp.asarray(pairs), ratio=0.85)
    print(f"[match] {int(np.asarray(res.valid).sum())} raw matches over {len(pairs)} pairs "
          f"in {time.time()-t0:.1f}s")

    intr = np.array([[FOCAL, FOCAL, W / 2, H / 2, 0, 0, 0]], np.float32)
    t0 = time.time()
    from sfmx.cli.config import PipelineConfig
    from sfmx.cli.pipeline import verify_matches

    res, _ = verify_matches(feats, pairs, res, intr, np.zeros(C, np.int32),
                            PipelineConfig())
    print(f"[verify] {int(np.asarray(res.valid).sum())} geometric inliers "
          f"in {time.time()-t0:.1f}s")
    tt = tracks.build_tracks(pairs, np.asarray(res.idx), np.asarray(res.valid),
                             C, 512)
    print(f"[tracks] {tt.n_tracks} tracks, {len(tt.obs_cam)} observations")

    kp_uv = np.asarray(feats.kp.uv)
    kp_mask = np.asarray(feats.kp.mask)
    t0 = time.time()
    scene, stats = reconstruct(kp_uv, kp_mask, tt, intr, np.zeros(C, np.int32),
                               ReconConfig(px_thresh=4.0, min_init_inliers=20),
                               pair_counts=(pairs, np.asarray(res.valid).sum(1)))
    print(f"[recon] registered {stats['n_registered']}/{C} cams, "
          f"{stats['n_points']} points in {time.time()-t0:.1f}s")
    print("[recon] stats:", scene_stats(scene))

    save_scene("/tmp/demo_scene.npz", scene)
    scene = load_scene("/tmp/demo_scene.npz")
    print("[mapstore] save/load roundtrip ok")

    ref_centers = np.stack([eye for (_, _, eye) in poses])
    report = evaluate_trajectory(np.asarray(scene.centers), ref_centers,
                                 np.asarray(scene.cam_alive))
    print("[evaluate]", report)

    # Held-out query: new pose between cams, rendered + extracted for real.
    lmap = build_localization_map(scene, np.asarray(feats.desc), tt.obs_feat)
    ok = 0
    for qi in range(args.queries):
        si = 0.3 + 0.35 * qi
        eye = np.array([-3.0 + 6.0 * si + 0.15, 0.2 * np.sin(6 * si) + 0.05, -3.0 + 2.0 * si])
        yaw = np.deg2rad(25.0 + 20.0 * si + 4.0)
        d = np.array([np.sin(yaw), 0.12 * np.sin(4 * si), np.cos(yaw)])
        Rq, tq = look_at(eye, eye + 5.0 * d)
        qimg = render_room(tex, Rq, eye, W, H, FOCAL)
        qf = features.detect_and_describe(jnp.asarray(qimg[None], jnp.float32),
                                          max_keypoints=512, threshold=1e-7)
        t0 = time.time()
        resq = localize_query(
            lmap, qf.desc[0], qf.kp.uv[0], qf.kp.mask[0],
            jnp.asarray(intr[0]), jax.random.PRNGKey(qi), sim_thresh=0.7,
        )
        # express estimated center in world frame via trajectory alignment
        s, R, t = umeyama.umeyama(
            scene.centers, jnp.asarray(ref_centers, jnp.float32), scene.cam_alive
        )
        cw = np.asarray(umeyama.apply_sim3(s, R, t, resq.center))
        err = np.linalg.norm(cw - eye)
        print(f"[localize] query {qi}: inliers={int(resq.n_inliers)} "
              f"conf={float(resq.confidence):.2f} pos_err={err:.3f}m "
              f"({(time.time()-t0):.2f}s)")
        ok += err < 0.2 and int(resq.n_inliers) >= 12
    print(f"[localize] {ok}/{args.queries} queries within 0.2m")
    # tail frames may genuinely lack two-view coverage; tolerate one dropout
    if stats["n_registered"] < C - 1 or report["ate_rmse"] > 0.1 or ok < args.queries:
        print("DEMO: FAIL")
        return 1
    print("DEMO: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
