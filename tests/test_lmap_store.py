"""Persisted serving map (C7/C14): build once, mmap-load with no k-means."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmx.localize import build_localization_map, localize_query
from sfmx.mapstore import (has_localization_map, load_localization_map,
                           save_localization_map)

from .test_recon_e2e import pipeline_result  # noqa: F401  (fixture reuse)


@pytest.fixture()
def built_lmap(pipeline_result):  # noqa: F811
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    return sc, scene, lmap, (uv, desc, mask)


def test_roundtrip_bit_identical(built_lmap, tmp_path):
    sc, scene, lmap, _ = built_lmap
    path = tmp_path / "map.lmap"
    save_localization_map(path, lmap, extra={"note": "test"})
    assert has_localization_map(path)
    loaded = load_localization_map(path)
    for name in lmap._fields:
        a, b = getattr(lmap, name), getattr(loaded, name)
        if a is None:
            assert b is None, name
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_load_never_rebuilds_vocabulary(built_lmap, tmp_path, monkeypatch):
    """The whole point of the store: serve start = mmap + device_put.  Any
    call into k-means / descriptor aggregation on load is a regression."""
    import sfmx.localize.retrieve as retrieve
    import sfmx.localize.localize as loc

    sc, scene, lmap, (uv, desc, mask) = built_lmap
    path = tmp_path / "map.lmap"
    save_localization_map(path, lmap)

    def boom(*a, **kw):
        raise AssertionError("vocabulary rebuilt on load")

    monkeypatch.setattr(retrieve, "build_vocabulary", boom)
    monkeypatch.setattr(loc, "build_localization_map", boom)
    loaded = load_localization_map(path)

    # and the loaded map localizes identically to the in-memory one
    cam = int(np.flatnonzero(np.asarray(scene.cam_alive))[2])
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    key = jax.random.PRNGKey(7)
    r0 = localize_query(lmap, jnp.asarray(desc[cam]), jnp.asarray(uv[cam]),
                        jnp.asarray(mask[cam]), intr, key)
    r1 = localize_query(loaded, jnp.asarray(desc[cam]), jnp.asarray(uv[cam]),
                        jnp.asarray(mask[cam]), intr, key)
    np.testing.assert_allclose(np.asarray(r0.center), np.asarray(r1.center),
                               atol=1e-6)
    assert int(r1.n_inliers) == int(r0.n_inliers)


def test_missing_store_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_localization_map(tmp_path / "nope.lmap")
