"""Multi-session merge (C12): two overlapping reconstructions → one map."""
import jax.numpy as jnp
import numpy as np
import pytest

from sfmx.kernels import matching
from sfmx.recon import tracks
from sfmx.recon.incremental import ReconConfig, reconstruct
from sfmx.recon.merge import merge_scenes, register_pair
from sfmx.solvers import umeyama

from .synthetic import make_scene
from .test_matching_tracks import scene_features


def _session(sc, cam_range, rng, base_desc_seed=99):
    """Reconstruct a sub-trajectory 'session' from the shared synthetic world."""
    # shared descriptor universe so sessions can be cross-matched
    uv, desc, mask, feat_pt = scene_features(sc, np.random.default_rng(base_desc_seed),
                                             noise=0.04)
    lo, hi = cam_range
    uv, desc, mask = uv[lo:hi], desc[lo:hi], mask[lo:hi]
    C = hi - lo
    pairs = np.array([(a, b) for a in range(C) for b in range(a + 1, C)], np.int32)
    res = matching.match_pairs_float(jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pairs))
    tt = tracks.build_tracks(pairs, np.asarray(res.idx), np.asarray(res.valid), C, uv.shape[1])
    scene, stats = reconstruct(uv, mask, tt, sc.intrinsics[None].astype(np.float32),
                               np.zeros(C, np.int32), ReconConfig())
    return scene, desc, uv, mask, tt.obs_feat


@pytest.fixture(scope="module")
def two_sessions():
    sc = make_scene(n_cams=12, n_points=300, noise_px=0.3, seed=5, arc_deg=150.0)
    rng = np.random.default_rng(0)
    s1 = _session(sc, (0, 7), rng)
    s2 = _session(sc, (5, 12), rng)
    return sc, s1, s2


def test_register_pair_recovers_transform(two_sessions):
    sc, s1, s2 = two_sessions
    from sfmx.recon.merge import landmark_descriptors

    d1 = landmark_descriptors(s1[0], s1[1], s1[4])
    d2 = landmark_descriptors(s2[0], s2[1], s2[4])
    s, R, t, pairs, inl = register_pair(
        np.array(s1[0].X), d1, np.array(s1[0].X_alive),
        np.array(s2[0].X), d2, np.array(s2[0].X_alive),
    )
    assert inl.sum() >= 20
    # transformed session-2 points should land on session-1 points
    X2t = s * (np.array(s2[0].X) @ np.asarray(R).T) + np.asarray(t)
    err = np.linalg.norm(X2t[pairs[inl, 1]] - np.array(s1[0].X)[pairs[inl, 0]], axis=1)
    assert np.median(err) < 0.05


def test_merge_scenes_end_to_end(two_sessions):
    sc, s1, s2 = two_sessions
    merged, stats = merge_scenes([s1, s2])
    # all 14 session-cameras (7+7, overlapping views duplicated) registered
    assert stats["n_cameras"] == 14
    assert stats["joint_ba_cost"][1] <= stats["joint_ba_cost"][0]
    # merged trajectory matches ground truth: first 7 cams = sc cams 0-6,
    # last 7 = sc cams 5-11
    centers = np.asarray(merged.centers)
    gt = np.concatenate([sc.centers[0:7], sc.centers[5:12]]).astype(np.float32)
    alive = np.asarray(merged.cam_alive)
    rmse, _ = umeyama.ate_rmse(jnp.asarray(centers), jnp.asarray(gt), jnp.asarray(alive))
    assert float(rmse) < 0.1, f"merged ATE {float(rmse)}"
