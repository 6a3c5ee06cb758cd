"""Strict recall@k vs vocabulary size on a visually-diverse corridor map
(VERDICT r4 item 7: the strict nearest-keyframe number was poor on some
corridor builds — decide n_words with a measurement, not a default).

Loads a built corridor map's cached features (map.feats.npz) + lmap,
re-renders perturbed-pose queries, and for each n_words rebuilds the
vocabulary, re-encodes the keyframe pool, and reports BOTH recall
definitions (radius-based and strict nearest-in-top-k).

Usage: python bench_scripts/recall_vocab.py --map /tmp/sfmx_c2_X/map \
           [--frames 1024] [--rooms 4] [--words 16,32,64]
CPU-only (jax.config platform cpu) so it can run beside a chip job.
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from examples.room import Corridor, corridor_walk_poses, look_at, render_corridor
from sfmx.cli.config import FeatureConfig, PipelineConfig
from sfmx.cli.pipeline import extract_features
from sfmx.localize import retrieve
from sfmx.mapstore import load_scene
from sfmx.solvers import umeyama


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", required=True)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--rooms", type=int, default=4)
    ap.add_argument("--words", default="16,32,64")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    z = np.load(args.map + ".feats.npz")
    desc, mask = z["desc"], z["kp_mask"]
    scene = load_scene(args.map)

    cor = Corridor(n_rooms=args.rooms, seed=7)
    poses = corridor_walk_poses(cor, args.frames)
    ref = np.stack([eye for (_, _, eye) in poses]).astype(np.float32)
    _, (s_al, R_al, t_al) = umeyama.ate_rmse(
        scene.centers, jnp.asarray(ref), scene.cam_alive)
    kfc_world = np.asarray(umeyama.apply_sim3(
        s_al, R_al, t_al, scene.centers))
    kf_alive = np.asarray(scene.cam_alive)

    rngq = np.random.default_rng(11)
    q_ids = np.linspace(2, args.frames - 3, 16).astype(int)
    q_imgs, q_eyes = [], []
    for qi in q_ids:
        Rq, tq, eye = poses[qi]
        eye2 = eye + rngq.uniform(-0.05, 0.05, 3)
        fwd = Rq[2]
        Rq2, _ = look_at(eye2, eye2 + 5.0 * fwd)
        q_imgs.append(render_corridor(cor, Rq2, eye2, 320, 240, 280.0))
        q_eyes.append(eye2)
    qcfg = PipelineConfig(features=FeatureConfig(max_keypoints=512),
                          resize_to=(320, 240), focal_factor=0.875)
    qf = extract_features(np.stack(q_imgs), qcfg)
    q_eyes_np = np.stack(q_eyes).astype(np.float32)

    flat = jnp.reshape(jnp.asarray(desc), (-1, desc.shape[-1]))
    fmask = jnp.reshape(jnp.asarray(mask), (-1,))
    stride = max(1, flat.shape[0] // 32768)

    out = {"map": args.map, "k": args.k, "per_words": {}}
    for w in [int(x) for x in args.words.split(",")]:
        vocab = retrieve.build_vocabulary(
            flat[::stride], fmask[::stride], jax.random.PRNGKey(0),
            n_words=w)
        g_kf = np.asarray(retrieve.vlad_encode_b(
            jnp.asarray(desc), jnp.asarray(mask), vocab))
        g_q = np.asarray(retrieve.vlad_encode_b(qf.desc, qf.kp.mask, vocab))
        r = retrieve.recall_at_k(g_kf, kfc_world, kf_alive, g_q, q_eyes_np,
                                 k=args.k)
        s = retrieve.strict_recall_at_k(g_kf, kfc_world, kf_alive, g_q,
                                        q_eyes_np, k=args.k)
        out["per_words"][w] = {"recall": round(float(r), 3),
                               "strict": round(float(s), 3)}
        print(f"# n_words={w}: recall@{args.k}={r:.3f} strict={s:.3f}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
