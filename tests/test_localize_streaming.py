"""Map-scale streaming localization (VERDICT r1 item 6).

The streaming path matches a query against the WHOLE landmark pool via the
Pallas top-2 kernel (no retrieval gather, no m_cap) and must agree with the
retrieval-gather path on maps small enough that both see every landmark.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmx.localize import (build_localization_map, localize_query,
                           localize_query_streaming)
from sfmx.localize.localize import LocalizationMap, use_streaming

from .test_recon_e2e import pipeline_result  # noqa: F401  (fixture reuse)


@pytest.fixture()
def lmap_and_query(pipeline_result):  # noqa: F811
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    c = int(np.flatnonzero(np.asarray(scene.cam_alive))[2])
    return sc, scene, lmap, c, (uv, desc, mask)


def test_streaming_matches_gather_path(lmap_and_query):
    sc, scene, lmap, c, (uv, desc, mask) = lmap_and_query
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    key = jax.random.PRNGKey(0)
    q_desc, q_uv, q_mask = (jnp.asarray(desc[c]), jnp.asarray(uv[c]),
                            jnp.asarray(mask[c]))

    res_g = localize_query(lmap, q_desc, q_uv, q_mask, intr, key)
    res_s = localize_query_streaming(lmap, q_desc, q_uv, q_mask, intr, key)

    # both paths localize the held-in view to its reconstructed pose
    for res, name in [(res_g, "gather"), (res_s, "streaming")]:
        assert int(res.n_inliers) > 20, name
        assert float(res.confidence) > 0.3, name
    c_rec = np.asarray(scene.centers[c])
    assert np.linalg.norm(np.asarray(res_s.center) - c_rec) < 0.05
    # and agree with each other (same model, same inlier geometry)
    assert np.allclose(np.asarray(res_s.center), np.asarray(res_g.center),
                       atol=2e-2)
    assert np.allclose(np.asarray(res_s.R), np.asarray(res_g.R), atol=2e-2)


def test_streaming_beacon_prior_gates_landmarks(lmap_and_query):
    sc, scene, lmap, c, (uv, desc, mask) = lmap_and_query
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    key = jax.random.PRNGKey(1)
    q = (jnp.asarray(desc[c]), jnp.asarray(uv[c]), jnp.asarray(mask[c]))

    # prior centered far away with a tiny radius excludes every landmark
    far = jnp.asarray(np.asarray(scene.centers[c]) + 1e3)
    res = localize_query_streaming(lmap, *q, intr, key,
                                   prior_center=far, prior_radius=0.1)
    assert float(res.confidence) == 0.0

    # generous prior around the true position keeps the solve intact
    near = jnp.asarray(np.asarray(scene.centers[c]))
    res2 = localize_query_streaming(lmap, *q, intr, key,
                                    prior_center=near, prior_radius=100.0)
    assert int(res2.n_inliers) > 20


def test_use_streaming_policy():
    from sfmx.cli.config import LocalizeConfig

    small = LocalizationMap(
        X=jnp.zeros((100, 3)), lm_desc=jnp.zeros((100, 8)),
        lm_alive=jnp.ones(100, bool), kf_gdesc=jnp.zeros((4, 8)),
        kf_alive=jnp.ones(4, bool), kf_centers=jnp.zeros((4, 3)),
        kf_lm=jnp.zeros((4, 16), jnp.int32), kf_lm_mask=jnp.zeros((4, 16), bool))
    big = small._replace(X=jnp.zeros((70000, 3)))

    auto = LocalizeConfig()
    assert not use_streaming(auto, small, binary=False)
    assert use_streaming(auto, big, binary=False)
    assert not use_streaming(auto, big, binary=True)  # binary keeps gather
    assert use_streaming(LocalizeConfig(streaming="on"), small, binary=False)
    assert not use_streaming(LocalizeConfig(streaming="off"), big, binary=False)
