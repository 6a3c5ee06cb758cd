"""Intrinsics self-calibration: recover focal + k1 from a wrong initial guess."""
import jax.numpy as jnp
import numpy as np

from sfmx.solvers import intrinsics as intr_mod
from sfmx.solvers import lm

from .synthetic import make_scene
from .test_ba import build_obs_table


def test_refine_recovers_focal_and_k1():
    sc = make_scene(n_cams=8, n_points=150, noise_px=0.2, k1=-0.15)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    # ground truth geometry, WRONG intrinsics guess: focal +15%, k1=0
    guess = sc.intrinsics.copy()
    guess[0] *= 1.15
    guess[1] *= 1.15
    guess[4] = 0.0
    intr = jnp.asarray(guess, jnp.float32)[None]
    k_idx = jnp.zeros(8, jnp.int32)
    out = intr_mod.refine_intrinsics_gn(
        intr, k_idx,
        jnp.asarray(sc.Rs, jnp.float32), jnp.asarray(sc.ts, jnp.float32),
        jnp.asarray(sc.points, jnp.float32),
        cam_id, pt_id, jnp.asarray(uv), jnp.asarray(w),
        params=("f", "k1"), iters=8,
    )
    out = np.asarray(out)[0]
    assert abs(out[0] - sc.intrinsics[0]) / sc.intrinsics[0] < 0.01, out[0]
    assert abs(out[4] - (-0.15)) < 0.02, out[4]


def test_joint_ba_with_intrinsics():
    """Wrong focal: JOINT pose+point+intrinsics LM recovers it (alternation
    cannot — focal trades off against scene depth almost exactly)."""
    sc = make_scene(n_cams=8, n_points=150, noise_px=0.2)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    guess = sc.intrinsics.copy()
    guess[0] *= 1.10
    guess[1] *= 1.10
    intr = jnp.asarray(guess, jnp.float32)[None]
    k_idx = jnp.zeros(8, jnp.int32)
    fixed = jnp.zeros(8, bool).at[0].set(True)
    R = jnp.asarray(sc.Rs, jnp.float32)
    t = jnp.asarray(sc.ts, jnp.float32)
    X = jnp.asarray(sc.points, jnp.float32)
    wj = jnp.asarray(w)
    R, t, X, intr, costs = lm.ba_solve_intrinsics(
        intr, k_idx, R, t, X, cam_id, pt_id, jnp.asarray(uv), wj, fixed,
        params=("f",), iters=25, cg_iters=40)
    rmse = lm.reprojection_rmse(intr, k_idx, R, t, X, cam_id, pt_id,
                                jnp.asarray(uv), wj)
    focal_err = abs(float(intr[0, 0]) - sc.intrinsics[0]) / sc.intrinsics[0]
    assert float(rmse) < 0.3, float(rmse)
    assert focal_err < 0.02, focal_err


def test_reconstruct_with_intrinsics_refinement():
    """End-to-end: map built with a 10%-wrong focal guess self-calibrates."""
    from sfmx.kernels import matching
    from sfmx.recon import tracks
    from sfmx.recon.incremental import ReconConfig, reconstruct
    from sfmx.solvers import umeyama
    from .test_matching_tracks import scene_features

    rng = np.random.default_rng(3)
    sc = make_scene(n_cams=10, n_points=250, noise_px=0.3, seed=11)
    uv, desc, mask, feat_pt = scene_features(sc, rng, noise=0.05)
    C = uv.shape[0]
    pairs = np.array([(a, b) for a in range(C) for b in range(a + 1, C)], np.int32)
    res = matching.match_pairs_float(jnp.asarray(desc), jnp.asarray(mask),
                                     jnp.asarray(pairs))
    tt = tracks.build_tracks(pairs, np.asarray(res.idx), np.asarray(res.valid),
                             C, uv.shape[1])
    guess = sc.intrinsics.copy()
    guess[0] *= 1.10
    guess[1] *= 1.10
    scene, stats = reconstruct(
        uv, mask, tt, guess[None].astype(np.float32), np.zeros(C, np.int32),
        ReconConfig(refine_intrinsics=("f",)),
    )
    f_est = float(np.asarray(scene.intr)[0, 0])
    assert abs(f_est - sc.intrinsics[0]) / sc.intrinsics[0] < 0.03, f_est
    rmse, _ = umeyama.ate_rmse(scene.centers,
                               jnp.asarray(sc.centers.astype(np.float32)),
                               scene.cam_alive)
    assert float(rmse) < 0.1
