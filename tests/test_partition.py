"""Map partitioning: balance + halo properties, and block-layout BA parity."""
import jax.numpy as jnp
import numpy as np

from sfmx.mapstore.partition import partition_trajectory, reorder_obs_by_block

from .synthetic import make_scene
from .test_ba import build_obs_table


def test_partition_balances_observations():
    sc = make_scene(n_cams=16, n_points=200, arc_deg=200.0)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    part = partition_trajectory(cam_id, pt_id, w > 0, 16, 200, 4)
    counts = part.block_obs_counts()
    assert counts.min() > 0.6 * counts.mean()
    assert counts.max() < 1.4 * counts.mean()
    # every camera assigned, blocks contiguous in trajectory order
    assert set(part.cam_block.tolist()) == {0, 1, 2, 3}
    assert np.all(np.diff(part.cam_block) >= 0)


def test_halo_is_moderate_and_correct():
    # Corridor-style locality: camera c observes points in a sliding window —
    # the geometry class partitioning exists for (configs 4-5). The orbit
    # scene (all-see-all) is the degenerate worst case and not partitionable.
    rng = np.random.default_rng(0)
    C, P = 32, 400
    cam_id, pt_id = [], []
    for c in range(C):
        lo = min(int(c / C * P), P - 60)
        pts = rng.choice(np.arange(lo, lo + 60), size=40, replace=False)
        cam_id.append(np.full(40, c))
        pt_id.append(pts)
    cam_id = np.concatenate(cam_id).astype(np.int32)
    pt_id = np.concatenate(pt_id).astype(np.int32)
    alive = np.ones(len(cam_id), bool)
    part = partition_trajectory(cam_id, pt_id, alive, C, P, 4)
    # halo obs really do reference points owned by a different block
    assert np.all(part.pt_block[pt_id[part.halo_obs]] !=
                  part.obs_block[part.halo_obs])
    # with windowed covisibility, halo is a small minority of observations
    assert 0.0 < part.halo_fraction() < 0.2


def test_block_reorder_preserves_ba_solution():
    from sfmx.solvers import lm

    sc = make_scene(n_cams=8, n_points=100, noise_px=0.4)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    part = partition_trajectory(cam_id, pt_id, w > 0, 8, 100, 4)
    order, cam_id2, pt_id2, uv2, w2 = reorder_obs_by_block(part, cam_id, pt_id, uv, w)
    intr = jnp.asarray(sc.intrinsics, jnp.float32)[None]
    k_idx = jnp.zeros(8, jnp.int32)
    fixed = jnp.zeros(8, bool).at[0].set(True)
    args = dict(iters=8, cg_iters=30)
    R1, t1, X1, c1 = lm.ba_solve(intr, k_idx,
        jnp.asarray(sc.Rs, jnp.float32), jnp.asarray(sc.ts, jnp.float32),
        jnp.asarray(sc.points, jnp.float32), cam_id, pt_id,
        jnp.asarray(uv), jnp.asarray(w), fixed, **args)
    R2, t2, X2, c2 = lm.ba_solve(intr, k_idx,
        jnp.asarray(sc.Rs, jnp.float32), jnp.asarray(sc.ts, jnp.float32),
        jnp.asarray(sc.points, jnp.float32), cam_id2, pt_id2,
        jnp.asarray(uv2), jnp.asarray(w2), fixed, **args)
    # observation order must not change the optimization (up to f32 reorder noise)
    np.testing.assert_allclose(float(c1[-1]), float(c2[-1]), rtol=1e-3)
