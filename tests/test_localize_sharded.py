"""Map-sharded localization (SURVEY §2.3 TP row): landmark pool split over
the mesh; exact-global-top-2 merge must reproduce the single-device paths."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmx.dist import mesh as meshlib
from sfmx.localize import (build_localization_map, localize_batch_sharded,
                           localize_query_streaming, shard_localization_map)
from sfmx.localize.sharded import AXIS

from .test_recon_e2e import pipeline_result  # noqa: F401  (fixture reuse)


@pytest.fixture()
def sharded_setup(pipeline_result):  # noqa: F811
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    mesh = meshlib.make_mesh(AXIS)
    slmap = shard_localization_map(lmap, mesh)
    return sc, scene, lmap, slmap, mesh, (uv, desc, mask)


def test_sharded_matches_streaming_path(sharded_setup):
    sc, scene, lmap, slmap, mesh, (uv, desc, mask) = sharded_setup
    n_dev = mesh.shape[AXIS]
    assert n_dev == 8  # conftest forces 8 virtual devices
    # landmark columns really are sharded 1/n per device
    assert slmap.lm_desc.sharding.spec == jax.sharding.PartitionSpec(AXIS)

    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    key = jax.random.PRNGKey(0)
    cams = np.flatnonzero(np.asarray(scene.cam_alive))[1:4]
    q_desc = jnp.asarray(desc[cams])
    q_uv = jnp.asarray(uv[cams])
    q_mask = jnp.asarray(mask[cams])

    res_s = localize_batch_sharded(slmap, q_desc, q_uv, q_mask, intr, key,
                                   mesh=mesh)
    for b, c in enumerate(cams):
        assert int(res_s.n_inliers[b]) > 20, c
        err = np.linalg.norm(np.asarray(res_s.center[b])
                             - np.asarray(scene.centers[c]))
        assert err < 0.05, (c, err)

    # parity with the single-device streaming path (same acceptance rule)
    for b, c in enumerate(cams):
        r1 = localize_query_streaming(lmap, q_desc[b], q_uv[b], q_mask[b],
                                      intr, jax.random.PRNGKey(0))
        assert np.allclose(np.asarray(res_s.center[b]), np.asarray(r1.center),
                           atol=2e-2)


def test_sharded_pool_padding(pipeline_result):  # noqa: F811
    """P not divisible by the mesh: pad rows are dead and never matched."""
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    P0 = lmap.X.shape[0]
    mesh = meshlib.make_mesh(AXIS)
    slmap = shard_localization_map(lmap, mesh)
    assert slmap.X.shape[0] % 8 == 0
    assert int(np.asarray(slmap.lm_alive).sum()) == int(np.asarray(lmap.lm_alive).sum())
    assert slmap.X.shape[0] >= P0
