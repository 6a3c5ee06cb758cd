"""Retrieval-routed map shards (SURVEY §2.3 EP row): split a map across
devices, route queries by retrieval, localize on the owning shard."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmx.localize import build_localization_map
from sfmx.serve import MapShardRouter, split_localization_map

from .test_recon_e2e import pipeline_result  # noqa: F401  (fixture reuse)


@pytest.fixture()
def router_setup(pipeline_result):  # noqa: F811
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    shards = split_localization_map(lmap, 3)
    router = MapShardRouter.build(shards)
    return sc, scene, lmap, router, (uv, desc, mask)


def test_split_covers_map(router_setup):
    sc, scene, lmap, router, _ = router_setup
    assert len(router.shards) == 3
    # every keyframe lands in exactly one shard, in order
    assert sum(s.kf_gdesc.shape[0] for s in router.shards) == lmap.kf_gdesc.shape[0]
    # shards live on distinct devices
    assert len({d.id for d in router.devices}) == 3
    for s, d in zip(router.shards, router.devices):
        assert next(iter(s.X.devices())) == d
    # every shard pool is a (not necessarily strict: on a tiny arc scene
    # every camera sees every landmark) subset covering the whole map
    for s in router.shards:
        assert s.X.shape[0] <= lmap.X.shape[0]
    assert sum(s.X.shape[0] for s in router.shards) >= lmap.X.shape[0]


def test_routes_to_owning_shard_and_localizes(router_setup):
    sc, scene, lmap, router, (uv, desc, mask) = router_setup
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    cams = np.flatnonzero(np.asarray(scene.cam_alive))[[1, 4, 6]]
    q_desc = jnp.asarray(desc[cams])
    q_uv = jnp.asarray(uv[cams])
    q_mask = jnp.asarray(mask[cams])

    shard_of = router.route(q_desc, q_mask)
    # a mapped view's own features retrieve its own keyframe -> its shard
    expect = router.router_shard[cams]
    np.testing.assert_array_equal(shard_of, expect)

    res, shard_of2 = router.localize_batch(q_desc, q_uv, q_mask, intr,
                                           jax.random.PRNGKey(0))
    np.testing.assert_array_equal(shard_of, shard_of2)
    for b, c in enumerate(cams):
        assert int(res.n_inliers[b]) > 20
        err = np.linalg.norm(np.asarray(res.center[b])
                             - np.asarray(scene.centers[c]))
        assert err < 0.05, (c, err)


def test_batch_is_one_device_call_per_shard_group(router_setup, monkeypatch):
    """The router must vmap each shard's query group into ONE localize
    dispatch (not one per query), and dispatch every group before syncing."""
    import sfmx.serve.router as router_mod

    sc, scene, lmap, router, (uv, desc, mask) = router_setup
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    cams = np.flatnonzero(np.asarray(scene.cam_alive))[:8]
    q_desc, q_uv, q_mask = (jnp.asarray(desc[cams]), jnp.asarray(uv[cams]),
                            jnp.asarray(mask[cams]))

    calls = []
    real = router_mod.localize_query

    def counting(lmap_, d, *a, **kw):
        calls.append(d.shape)  # (K,D) per vmap lane; traced ONCE per group
        return real(lmap_, d, *a, **kw)

    monkeypatch.setattr(router_mod, "localize_query", counting)
    res, shard_of = router.localize_batch(q_desc, q_uv, q_mask, intr,
                                          jax.random.PRNGKey(1))
    n_groups = len(np.unique(shard_of))
    # vmap traces the inner fn once per group -> exactly n_groups records,
    # NOT one per query
    assert len(calls) == n_groups, (len(calls), n_groups)
    assert res.center.shape == (8, 3)
    # results still per-query accurate
    for b, c in enumerate(cams):
        err = np.linalg.norm(np.asarray(res.center[b])
                             - np.asarray(scene.centers[c]))
        assert err < 0.05, (c, err)
