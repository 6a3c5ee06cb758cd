"""Distributed (8 virtual CPU devices) tests: sharded BA parity & convergence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfmx.dist import dist_ba, mesh as meshlib
from sfmx.solvers import lm

from .synthetic import make_scene
from .test_ba import build_obs_table


@pytest.fixture(scope="module")
def eight_device_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshlib.make_mesh("obs")


def test_sharded_ba_matches_single_device(eight_device_mesh):
    sc = make_scene(n_cams=6, n_points=80, noise_px=0.4)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    n_dev = len(jax.devices())
    cam_id = meshlib.pad_to_multiple(cam_id, n_dev)
    pt_id = meshlib.pad_to_multiple(pt_id, n_dev)
    uv = meshlib.pad_to_multiple(uv, n_dev)
    w = meshlib.pad_to_multiple(w, n_dev)
    C, P = 6, 80
    intr = jnp.asarray(sc.intrinsics, jnp.float32)[None]
    k_idx = jnp.zeros(C, jnp.int32)
    key = jax.random.PRNGKey(0)
    from sfmx.core import se3
    dR = se3.so3_exp_b(0.01 * jax.random.normal(key, (C, 3)))
    R0 = jnp.einsum("cij,cjk->cik", dR, jnp.asarray(sc.Rs, jnp.float32))
    t0 = jnp.asarray(sc.ts, jnp.float32) + 0.02 * jax.random.normal(key, (C, 3))
    X0 = jnp.asarray(sc.points, jnp.float32) + 0.03 * jax.random.normal(key, (P, 3))
    fixed = jnp.zeros(C, bool).at[0].set(True)

    step = dist_ba.make_ba_step(eight_device_mesh, iters=12, cg_iters=40)
    R1, t1, X1, costs = step(
        intr, k_idx, R0, t0, X0,
        jnp.asarray(cam_id), jnp.asarray(pt_id), jnp.asarray(uv), jnp.asarray(w), fixed,
    )
    # single-device reference
    R2, t2, X2, costs_ref = lm.ba_solve(
        intr, k_idx, R0, t0, X0,
        jnp.asarray(cam_id), jnp.asarray(pt_id), jnp.asarray(uv), jnp.asarray(w), fixed,
        iters=12, cg_iters=40,
    )
    # Both must converge to the same cost basin (identical math up to
    # reduction order).
    assert float(costs[-1]) < float(costs[0]) * 1e-2
    np.testing.assert_allclose(float(costs[-1]), float(costs_ref[-1]), rtol=0.05)
    rmse_sharded = lm.reprojection_rmse(
        intr, k_idx, R1, t1, X1, jnp.asarray(cam_id), jnp.asarray(pt_id),
        jnp.asarray(uv), jnp.asarray(w),
    )
    assert float(rmse_sharded) < 0.6  # at noise floor (0.4px noise)


def test_data_parallel_extraction(eight_device_mesh):
    """Feature extraction shards trivially over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sfmx.kernels import features

    rng = np.random.default_rng(0)
    imgs = rng.random((8, 64, 96)).astype(np.float32)
    mesh = meshlib.make_mesh("data")
    sharded = jax.device_put(imgs, NamedSharding(mesh, P("data")))
    feats = features.detect_and_describe(sharded, max_keypoints=32, threshold=1e-9)
    assert feats.desc.shape == (8, 32, features.N_FLOAT_DIM)
    assert not np.any(np.isnan(np.asarray(feats.desc)))
