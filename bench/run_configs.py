"""Evaluation-config harnesses (BASELINE.md configs 1-5).

Usage: python bench/run_configs.py --config N [--platform cpu]

Each config prints one JSON line of metrics.  Scales are chosen so every
config runs in minutes; the geometry/comms patterns match the BASELINE
descriptions (real datasets are unavailable in this environment — rendered
room walkthroughs and synthetic corridor maps stand in; see SURVEY §6).

  1  small indoor set: build map from 12 rendered frames + localize queries (ATE)
  2  longer sequence: 32-frame walkthrough, per-frame PnP localization
  3  global BA at 512 cameras / 20k points / 200k observations (LM iters/s)
  4  partitioned map: 2048-camera corridor, POINT-SHARDED block BA
     (dist/block_ba.py: 1/n cameras+points+obs per device, halo all_gather
     + ring reduce-scatter) on an 8-device mesh (halo fraction, LM iters/s)
  5  multi-session merge: 3 overlapping sessions -> joint BA (ATE)
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os

# share the repo's persistent compile cache with bench.py (the CLI reads
# SFMX_JAX_CACHE; without it every harness run pays multi-minute cold
# compiles — BASELINE.md round 4)
os.environ.setdefault("SFMX_JAX_CACHE", "/root/repo/.jax_cache")

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--config", type=int, required=True)
p.add_argument("--platform", default=None)
p.add_argument("--frames", type=int, default=32,
               help="config 2: walkthrough length (>=64 switches to the "
                    "streaming CLI path with retrieval pair selection)")
p.add_argument("--scene", default="room", choices=["room", "corridor"],
               help="rendered environment: single box room, or a 4-room "
                    "corridor (distributed structure -> real partition "
                    "locality for the config-4 block-BA proof)")
p.add_argument("--seed", type=int, default=0,
               help="reconstruction PRNG seed (seed-robustness proofs)")
p.add_argument("--final-ba-iters", type=int, default=0,
               help="override final BA iterations (0 = stage default)")
p.add_argument("--rooms", type=int, default=4,
               help="corridor room count (config-4 5k-frame scale uses more)")
args = p.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)
if os.environ["SFMX_JAX_CACHE"].lower() != "off":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SFMX_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp


def config1():
    from examples.demo_pipeline import main as demo_main

    t0 = time.time()
    rc = demo_main()
    return {"config": 1, "pass": rc == 0, "wall_s": round(time.time() - t0, 1)}


def config2_scale(frames: int):
    """Config-2-plus scale proof (VERDICT r1 item 10): a 100-200-frame
    rendered walkthrough through the REAL CLI streaming path
    (`build-map --stream`: threaded decode ‖ device extract, retrieval-
    limited pair selection, geometric verification, stage cache), with ATE
    asserted against ground truth and the per-stage wall-time breakdown
    reported so the host-side round loop's share is visible.
    """
    import io
    import tempfile
    from pathlib import Path

    from PIL import Image

    from examples.room import RoomTexture, render_room, walk_poses
    from sfmx.cli import main as climain
    from sfmx.mapstore import load_scene
    from sfmx.solvers import umeyama
    from sfmx.utils.logging import LOGGER

    if args.scene == "corridor":
        from examples.room import Corridor, corridor_walk_poses, render_corridor

        cor = Corridor(n_rooms=args.rooms, seed=7)
        poses = corridor_walk_poses(cor, frames)
        render = lambda R, eye: render_corridor(cor, R, eye, 320, 240, 280.0)
    else:
        tex = RoomTexture(seed=7)
        poses = walk_poses(frames)
        render = lambda R, eye: render_room(tex, R, eye, 320, 240, 280.0)
    tmp = Path(tempfile.mkdtemp(prefix="sfmx_c2_"))
    (tmp / "imgs").mkdir()
    if frames >= 256:
        from examples.room import render_walk_parallel

        render_walk_parallel(args.scene, args.rooms, poses, tmp / "imgs")
    else:
        for i, (R, t, eye) in enumerate(poses):
            img = render(R, eye)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                tmp / "imgs" / f"{i:04d}.png")

    # capture stage JSON-lines so the breakdown lands in this report
    # The walk covers a FIXED path, so per-frame baseline shrinks ~1/frames;
    # the temporal match window must widen proportionally or every proposed
    # pair is below the triangulation parallax gate (measured at 512 frames:
    # 1.2 cm/frame steps, a 16-frame window maxed out at 1.14 deg median
    # triangulation angle vs the 1.5 deg gate — frames//8 reaches ~5 deg).
    # corridor walks cover ~5x the path length per frame; keep the pair
    # window spanning ~2.5 m of path so doorway transitions stay bridged
    # (path length ~= 7.75 m per room, so the window must scale with
    # frames/rooms — the old frames//13 was tuned at 4 rooms and overshoots
    # 3x at the 5k-frame/12-room config-4 scale)
    if args.scene == "room":
        window = max(6, frames // 8)
    else:
        window = max(12, int(frames * 2.5 / (7.75 * args.rooms)))
    buf = io.StringIO()
    old_stream = LOGGER._stream
    LOGGER._stream = buf
    t0 = time.time()
    try:
        climain.main([
            "build-map", str(tmp / "imgs"), "-o", str(tmp / "map"),
            "--stream", "--chunk", "16", "--workdir", str(tmp / "work"),
            "-D", "match.pair_mode=retrieval", "-D", "match.retrieval_k=6",
            "-D", f"match.window={window}",
            "-D", "features.max_keypoints=512",
            "-D", "resize_to=320,240", "-D", "focal_factor=0.875",
            "-D", f"recon.seed={args.seed}",
            # long loop-free walks accumulate drift that only the global
            # final BA corrects; with the fused dense path at the 20+
            # iters/s class the extra iterations cost seconds
            "-D", ("recon.final_ba_iters="
                   f"{args.final_ba_iters or (50 if frames >= 512 else 25)}"),
        ])
    finally:
        LOGGER._stream = old_stream
    wall = time.time() - t0
    stage_s = {}
    recon_detail = {}
    for line in buf.getvalue().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "wall_s" in rec:
            stage_s[rec["stage"]] = round(
                stage_s.get(rec["stage"], 0.0) + rec["wall_s"], 1)
        if rec.get("stage") == "reconstruct":
            recon_detail = {k: rec.get(k) for k in
                            ("ba_path", "components", "phase_s",
                             "ba_iters_per_s", "ba_total_s", "n_rounds",
                             "final_med_px", "ba_call_s", "ba_fallbacks")
                            if rec.get(k) is not None}

    scene = load_scene(str(tmp / "map"))
    ref = np.stack([eye for (_, _, eye) in poses]).astype(np.float32)
    rmse, (s_al, R_al, t_al) = umeyama.ate_rmse(scene.centers,
                                                jnp.asarray(ref),
                                                scene.cam_alive)
    n_reg = int(np.asarray(scene.cam_alive).sum())
    # ATE gate scales with trajectory length (the corridor path is ~32 m
    # of loop-free forward motion vs the room's 6 m): 1.5% of path length,
    # floored at the original 0.1 m room gate
    path_len = float(np.linalg.norm(np.diff(ref, axis=0), axis=1).sum())
    ate_gate = max(0.1, 0.015 * path_len)
    ok = n_reg >= int(0.95 * frames) and float(rmse) < ate_gate

    # retrieval quality at this map scale (VERDICT r3 item 7): held-out
    # views (perturbed map poses) must retrieve their true nearest keyframe
    recall8 = None
    try:
        from examples.room import look_at
        from sfmx.cli.config import FeatureConfig, PipelineConfig
        from sfmx.cli.pipeline import extract_features
        from sfmx.localize import retrieve
        from sfmx.mapstore import load_localization_map

        lmap = load_localization_map(str(tmp / "map") + ".lmap")
        rngq = np.random.default_rng(11)
        q_ids = np.linspace(2, frames - 3, 16).astype(int)
        q_imgs, q_eyes = [], []
        for qi in q_ids:
            Rq, tq, eye = poses[qi]
            eye2 = eye + rngq.uniform(-0.05, 0.05, 3)
            fwd = Rq[2]
            Rq2, _ = look_at(eye2, eye2 + 5.0 * fwd)
            q_imgs.append(render(Rq2, eye2))
            q_eyes.append(eye2)
        qcfg = PipelineConfig(features=FeatureConfig(max_keypoints=512),
                              resize_to=(320, 240), focal_factor=0.875)
        qf = extract_features(np.stack(q_imgs), qcfg)
        qg = np.asarray(retrieve.vlad_encode_b(qf.desc, qf.kp.mask,
                                               lmap.vocab))
        kfc_world = np.asarray(umeyama.apply_sim3(s_al, R_al, t_al,
                                                  lmap.kf_centers))
        q_eyes_np = np.stack(q_eyes).astype(np.float32)
        recall8 = round(retrieve.recall_at_k(
            lmap.kf_gdesc, kfc_world, lmap.kf_alive, qg, q_eyes_np, k=8), 3)
        strict8 = round(retrieve.strict_recall_at_k(
            lmap.kf_gdesc, kfc_world, lmap.kf_alive, qg, q_eyes_np, k=8), 3)
    except Exception as e:  # keep the scale report even if recall fails
        recall8 = f"error: {e}"
        strict8 = None

    return {"config": "2+", "scene": args.scene, "n_frames": frames,
            "seed": args.seed, "n_registered": n_reg,
            "ate_m": round(float(rmse), 4),
            "ate_gate_m": round(ate_gate, 3),
            "path_len_m": round(path_len, 1), "wall_s": round(wall, 1),
            "stage_s": stage_s, "recon_detail": recon_detail,
            "recall_at_8": recall8, "strict_recall_at_8": strict8,
            "pass": bool(ok), "map_path": str(tmp / "map")}


def config2():
    if args.frames > 32:
        return config2_scale(args.frames)
    from examples.room import RoomTexture, render_room, walk_poses
    from sfmx.cli.config import PipelineConfig, FeatureConfig
    from sfmx.cli.pipeline import build_map
    from sfmx.localize import build_localization_map, localize_query
    from sfmx.solvers import umeyama

    tex = RoomTexture(seed=7)
    C = 32
    poses = walk_poses(C)
    imgs = np.stack([render_room(tex, R, eye, 320, 240, 280.0)
                     for (R, t, eye) in poses])
    intr = np.array([[280.0, 280.0, 160.0, 120.0, 0, 0, 0]], np.float32)
    cfg = PipelineConfig(features=FeatureConfig(max_keypoints=512))
    t0 = time.time()
    scene, feats, tt, stats = build_map(imgs, intr, np.zeros(C, np.int32), cfg)
    build_s = time.time() - t0
    ref = np.stack([eye for (_, _, eye) in poses])
    rmse, _ = umeyama.ate_rmse(scene.centers, jnp.asarray(ref, jnp.float32),
                               scene.cam_alive)
    # per-frame localization of every frame against the map (self-consistency)
    lmap = build_localization_map(scene, np.asarray(feats.desc), tt.obs_feat,
                                  kp_mask=np.asarray(feats.kp.mask))
    t0 = time.time()
    inl = []
    for i in range(C):
        r = localize_query(lmap, feats.desc[i], feats.kp.uv[i], feats.kp.mask[i],
                           jnp.asarray(intr[0]), jax.random.PRNGKey(i))
        inl.append(int(r.n_inliers))
    loc_s = time.time() - t0
    return {"config": 2, "n_registered": stats["n_registered"], "n_frames": C,
            "ate_m": round(float(rmse), 4), "build_s": round(build_s, 1),
            "localize_fps": round(C / loc_s, 2),
            "median_inliers": int(np.median(inl))}


def _synthetic_ba(C, P, O, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    t = np.concatenate([rng.uniform(-5, 5, (C, 2)), np.full((C, 1), 20.0)], 1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    cam_id = rng.integers(0, C, O).astype(np.int32)
    pt_id = rng.integers(0, P, O).astype(np.int32)
    Xc = X[pt_id] + t[cam_id]
    uv = (Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.asarray([320.0, 240.0])
    uv = (uv + 0.5 * rng.standard_normal((O, 2))).astype(np.float32)
    intr = np.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0]], np.float32)
    return intr, R, t, X, cam_id, pt_id, uv


def config3():
    from sfmx.solvers import lm

    C, P, O = 512, 20000, 200000
    intr, R, t, X, cam_id, pt_id, uv = _synthetic_ba(C, P, O)
    w = jnp.ones(O, jnp.float32)
    fixed = jnp.zeros(C, bool).at[0].set(True)
    iters = 20
    argsba = (jnp.asarray(intr), jnp.zeros(C, jnp.int32), jnp.asarray(R),
              jnp.asarray(t), jnp.asarray(X), jnp.asarray(cam_id),
              jnp.asarray(pt_id), jnp.asarray(uv), w, fixed)
    out = lm.ba_solve(*argsba, iters=iters, cg_iters=30)
    jax.block_until_ready(out)
    t0 = time.time()
    out = lm.ba_solve(*argsba, iters=iters, cg_iters=30)
    jax.block_until_ready(out)
    dt = time.time() - t0
    return {"config": 3, "cams": C, "points": P, "obs": O,
            "lm_iters_per_s": round(iters / dt, 2),
            "final_cost": float(out[3][-1])}


def config4():
    """Point-sharded distributed BA (dist.block_ba): each device owns 1/n of
    the cameras, points, and observations; only the covisibility halo rides
    the links (ring reduce-scatter + all_gather of the boundary set)."""
    from sfmx.dist import block_ba, mesh as meshlib
    from sfmx.dist.block_layout import build_block_layout, scatter_cams, scatter_pts

    n_dev = len(jax.devices())
    C, P = 2048, 200000
    O = (800000 // C) * C
    rng = np.random.default_rng(1)
    # corridor covisibility: camera c sees a window of points
    cam_id = np.repeat(np.arange(C, dtype=np.int32), O // C)
    lo = (cam_id.astype(np.int64) * (P - 300) // C).astype(np.int32)
    pt_id = (lo + rng.integers(0, 300, O)).astype(np.int32)
    X = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    t = np.concatenate([rng.uniform(-5, 5, (C, 2)), np.full((C, 1), 20.0)], 1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    Xc = X[pt_id] + t[cam_id]
    uv = ((Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.asarray([320.0, 240.0])
          + 0.5 * rng.standard_normal((O, 2))).astype(np.float32)
    w = np.ones(O, np.float32)
    fixed = np.zeros(C, bool)
    fixed[0] = True
    intr = np.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0]], np.float32)
    iters = 8

    mesh = meshlib.make_mesh(block_ba.AXIS)
    layout = build_block_layout(cam_id, pt_id, uv, w, C, P, n_dev)
    k_l, R_l, t_l, fixed_l = scatter_cams(layout, np.zeros(C, np.int32), R, t, fixed)
    fixed_l = fixed_l | (layout.cam_global < 0)
    (X_l,) = scatter_pts(layout, X)
    step = block_ba.make_block_ba_step(mesh, n_blocks=n_dev, hcap=layout.hcap,
                                       iters=iters, cg_iters=25)
    argsba = (jnp.asarray(intr), jnp.asarray(1e-4, jnp.float32),
              jnp.asarray(k_l), jnp.asarray(R_l),
              jnp.asarray(t_l), jnp.asarray(X_l), jnp.asarray(fixed_l),
              jnp.asarray(layout.obs_cam_l), jnp.asarray(layout.obs_pt_ext),
              jnp.asarray(layout.obs_uv), jnp.asarray(layout.obs_w),
              jnp.asarray(layout.halo_idx), jnp.asarray(layout.halo_mask))
    out = step(*argsba)
    jax.block_until_ready(out)
    t0 = time.time()
    out = step(*argsba)
    jax.block_until_ready(out)
    dt = time.time() - t0
    return {"config": 4, "cams": C, "points": P, "obs": O, "devices": n_dev,
            **layout.stats(),
            "lm_iters_per_s": round(iters / dt, 2),
            "final_cost": float(out[3][-1])}


def config4_build(frames: int):
    """Config-4 SCALE PROOF (VERDICT r3 item 1): a real 2048+-frame map
    built end-to-end on the chip through the streaming CLI, then the
    RECONSTRUCTED scene (not a synthetic table) partitioned and solved by
    the point-sharded block BA on an 8-virtual-device mesh in a subprocess
    (the TPU tunnel and virtual CPU devices cannot share a process).
    Reports the real scene's measured halo fraction + load balance.
    """
    import subprocess

    rep = config2_scale(frames)
    rep["config"] = "4-build"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench_scripts/block_ba_real_scene.py",
         rep["map_path"], "--iters", "4"],
        capture_output=True, text=True, env=env, timeout=3600)
    for line in proc.stdout.splitlines():
        try:
            rep["block_ba"] = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    if "block_ba" not in rep:
        rep["block_ba_error"] = proc.stderr[-500:]
        rep["pass"] = False
    else:
        rep["pass"] = bool(rep["pass"]
                           and rep["block_ba"]["cost_monotone_ok"])
    return rep


def config5_serve(fps: int):
    """Config-5 SERVING proof (VERDICT r3 item 8): 3 overlapping rendered
    sessions built through the real pipeline -> cross-session merge + joint
    BA -> serving map persisted and RELOADED via lmap_store -> served with
    --shards 4 through the HTTP app -> real image queries with accuracy
    asserted in world units, retrieval recall@8 and p95 latency recorded.
    """
    import asyncio
    import base64
    import io
    import tempfile
    from pathlib import Path

    from PIL import Image

    from examples.room import RoomTexture, look_at, render_room, walk_poses
    from sfmx.cli.config import FeatureConfig, MatchConfig, PipelineConfig
    from sfmx.cli.pipeline import build_map
    from sfmx.localize import retrieve
    from sfmx.localize.localize import build_localization_map
    from sfmx.mapstore import lmap_store
    from sfmx.recon.merge import merge_scenes
    from sfmx.serve import LocalizationService, make_app
    from sfmx.solvers import umeyama

    tex = RoomTexture(seed=7)
    total = int(fps * 2.2)
    poses = walk_poses(total)
    spans = [(0, fps), (int(0.6 * fps), int(1.6 * fps)),
             (int(1.2 * fps), total)]
    intr = np.array([[280.0, 280.0, 160.0, 120.0, 0, 0, 0]], np.float32)
    cfg = PipelineConfig(
        features=FeatureConfig(max_keypoints=512),
        match=MatchConfig(pair_mode="window", window=max(8, fps // 6)),
        resize_to=(320, 240), focal_factor=0.875)
    t0 = time.time()
    sessions = []
    for lo, hi in spans:
        imgs = np.stack([render_room(tex, R, eye, 320, 240, 280.0)
                         for (R, t, eye) in poses[lo:hi]])
        scene, feats, tt, _ = build_map(imgs, intr,
                                        np.zeros(hi - lo, np.int32), cfg)
        sessions.append((scene, np.asarray(feats.desc),
                         np.asarray(feats.kp.uv), np.asarray(feats.kp.mask),
                         tt.obs_feat))
    merged, mstats = merge_scenes(sessions)
    build_s = time.time() - t0

    # serving map from the merged scene (sessions concatenate in order, so
    # per-camera features and per-obs feature ids concatenate too)
    feat_desc = np.concatenate([s[1] for s in sessions])
    kp_mask = np.concatenate([s[3] for s in sessions])
    obs_feat = np.concatenate([np.asarray(s[4]) for s in sessions])
    lmap = build_localization_map(merged, feat_desc, obs_feat,
                                  kp_mask=kp_mask)
    tmp = Path(tempfile.mkdtemp(prefix="sfmx_c5_"))
    lmap_store.save_localization_map(tmp / "lmap", lmap)
    lmap = lmap_store.load_localization_map(tmp / "lmap")

    # ground-truth alignment of the merged frame (session 0's SfM frame)
    gt = np.concatenate([
        np.stack([eye for (_, _, eye) in poses[lo:hi]]) for lo, hi in spans
    ]).astype(np.float32)
    ate, (s_al, R_al, t_al) = umeyama.ate_rmse(
        merged.centers, jnp.asarray(gt), merged.cam_alive)

    # retrieval quality on the merged map: held-out views between frames
    q_ids = np.linspace(3, total - 4, 12).astype(int)
    q_imgs = []
    for qi in q_ids:
        Rq, tq, eye = poses[qi]
        q_imgs.append(render_room(tex, Rq, eye, 320, 240, 280.0))
    from sfmx.cli.pipeline import extract_features
    qf = extract_features(np.stack(q_imgs), cfg)
    qg = np.asarray(retrieve.vlad_encode_b(
        qf.desc, qf.kp.mask, lmap.vocab))
    # gt keyframe centers in WORLD frame for the distance ground truth
    kfc_world = np.asarray(umeyama.apply_sim3(
        s_al, R_al, t_al, lmap.kf_centers))
    q_eyes_np = np.stack([poses[qi][2] for qi in q_ids])
    recall8 = retrieve.recall_at_k(
        lmap.kf_gdesc, kfc_world, lmap.kf_alive, qg, q_eyes_np, k=8)
    strict8 = retrieve.strict_recall_at_k(
        lmap.kf_gdesc, kfc_world, lmap.kf_alive, qg, q_eyes_np, k=8)

    # serve with 4 map shards; POST the real images
    svc = LocalizationService(batch_window_ms=10.0, max_batch=8)
    svc.load_map("merged", lmap, jnp.asarray(intr[0]), cfg=cfg, shards=4)
    # compile every batch bucket up front: the timed burst must measure
    # serving, not whichever bucket the warm burst happened to miss
    svc.warmup("merged")
    app = make_app(svc)
    payloads = []
    for img in q_imgs:
        buf = io.BytesIO()
        Image.fromarray((img * 255).astype(np.uint8)).save(buf, format="PNG")
        payloads.append(base64.b64encode(buf.getvalue()).decode())

    async def run():
        from aiohttp.test_utils import TestClient, TestServer

        from sfmx.serve.server import ServiceStats

        async with TestClient(TestServer(app)) as client:
            # warm with the SAME concurrent pattern as the timed pass:
            # the router compiles per-shard programs per batch-size
            # bucket, so a single warmup request leaves the gathered
            # batch's bucket cold and p95 measures compile, not serving
            await asyncio.gather(*[
                client.post("/localize",
                            json={"map_id": "merged", "image": pl})
                for pl in payloads])
            svc.stats = ServiceStats()
            rs = await asyncio.gather(*[
                client.post("/localize",
                            json={"map_id": "merged", "image": pl})
                for pl in payloads])
            outs = [await r.json() for r in rs]
            st = await (await client.get("/stats")).json()
            return outs, st

    outs, st = asyncio.run(run())
    errs = []
    for qi, out in zip(q_ids, outs):
        c = np.asarray(umeyama.apply_sim3(
            s_al, R_al, t_al, jnp.asarray(out["center"], jnp.float32)))
        errs.append(float(np.linalg.norm(c - poses[qi][2])))
    errs = np.asarray(errs)
    n_ok = int((errs < 0.25).sum())
    ok = (n_ok >= int(0.8 * len(errs)) and float(ate) < 0.1
          and recall8 >= 0.9)
    return {"config": "5-serve", "sessions": 3, "frames_per_session": fps,
            "cams": mstats["n_cameras"], "points": mstats["n_points"],
            "merge_pair_inliers": mstats.get("pair_inliers"),
            "joint_ba_cost": mstats.get("joint_ba_cost"),
            "merged_ate_m": round(float(ate), 4),
            "recall_at_8": round(recall8, 3),
            "strict_recall_at_8": round(strict8, 3),
            "query_err_median_m": round(float(np.median(errs)), 4),
            "queries_ok": f"{n_ok}/{len(errs)}",
            "latency_p95_ms": st.get("p95_latency_ms"),
            "shards": 4, "build_s": round(build_s, 1), "pass": bool(ok)}


def config5():
    # reuse the merge test harness at 3 sessions
    import tests.test_merge as tmm
    from sfmx.recon.merge import merge_scenes
    from sfmx.solvers import umeyama
    from tests.synthetic import make_scene

    sc = make_scene(n_cams=18, n_points=400, noise_px=0.3, seed=5, arc_deg=200.0)
    rng = np.random.default_rng(0)
    t0 = time.time()
    sessions = [tmm._session(sc, (0, 8), rng), tmm._session(sc, (6, 14), rng),
                tmm._session(sc, (12, 18), rng)]
    merged, stats = merge_scenes(sessions)
    wall = time.time() - t0
    gt = np.concatenate([sc.centers[0:8], sc.centers[6:14], sc.centers[12:18]])
    rmse, _ = umeyama.ate_rmse(merged.centers, jnp.asarray(gt, jnp.float32),
                               merged.cam_alive)
    return {"config": 5, "sessions": 3, "cams": stats["n_cameras"],
            "ate_m": round(float(rmse), 4), "wall_s": round(wall, 1)}


def config4_dispatch():
    # --frames >= 256 runs the REAL-scene build + partition + block-BA
    # proof; the default stays the synthetic 2048-camera corridor harness
    return config4_build(args.frames) if args.frames >= 256 else config4()


def config5_dispatch():
    # --frames >= 48 runs the real 3-session build+merge+serve proof; the
    # default stays the quick synthetic merge harness
    return config5_serve(args.frames) if args.frames >= 48 else config5()


if __name__ == "__main__":
    # guarded: the parallel renderer's spawn workers re-import this module
    # as __mp_main__ and must not re-run the dispatch
    out = {1: config1, 2: config2, 3: config3, 4: config4_dispatch,
           5: config5_dispatch}[args.config]()
    print(json.dumps(out))
