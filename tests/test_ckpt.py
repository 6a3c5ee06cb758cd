"""BA checkpoint/resume + fault injection (SURVEY §5.3)."""
import numpy as np
import jax.numpy as jnp

from sfmx.solvers import ba_ckpt, lm

from .synthetic import make_scene
from .test_ba import build_obs_table


def _problem():
    sc = make_scene(n_cams=6, n_points=60, noise_px=0.3)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    intr = jnp.asarray(sc.intrinsics, jnp.float32)[None]
    k_idx = jnp.zeros(6, jnp.int32)
    fixed = jnp.zeros(6, bool).at[0].set(True)
    # perturb
    R0 = jnp.asarray(sc.Rs, jnp.float32)
    t0 = jnp.asarray(sc.ts, jnp.float32) + 0.05
    X0 = jnp.asarray(sc.points, jnp.float32) + 0.05
    return (intr, k_idx, R0, t0, X0, cam_id, pt_id, jnp.asarray(uv),
            jnp.asarray(w), fixed)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    args = _problem()
    p1 = tmp_path / "a.ckpt.npz"
    R_a, t_a, X_a, costs_a, ran_a = ba_ckpt.ba_solve_checkpointed(
        *args, total_iters=12, ckpt_every=4, ckpt_path=p1, cg_iters=20)
    assert ran_a == 12

    # simulate a crash: run only the first chunk, then "resume" from disk
    p2 = tmp_path / "b.ckpt.npz"
    ba_ckpt.ba_solve_checkpointed(*args, total_iters=4, ckpt_every=4,
                                  ckpt_path=p2, cg_iters=20)
    # process dies here; a new run resumes from p2
    R_b, t_b, X_b, costs_b, ran_b = ba_ckpt.ba_solve_checkpointed(
        *args, total_iters=12, ckpt_every=4, ckpt_path=p2, cg_iters=20)
    assert ran_b == 8  # only the remaining iterations ran

    # resumed and uninterrupted solves agree (same chunking => same math;
    # lambda restart at chunk boundaries makes them bitwise-comparable)
    final_a = lm.reprojection_rmse(args[0], args[1], R_a, t_a, X_a,
                                   args[5], args[6], args[7], args[8])
    final_b = lm.reprojection_rmse(args[0], args[1], R_b, t_b, X_b,
                                   args[5], args[6], args[7], args[8])
    np.testing.assert_allclose(float(final_a), float(final_b), rtol=1e-3)


def test_ckpt_roundtrip(tmp_path):
    p = tmp_path / "c.npz"
    R = np.random.default_rng(0).standard_normal((4, 3, 3)).astype(np.float32)
    ba_ckpt.save_ckpt(p, R, R[:, 0], R[:, :, 0], 3e-4, 7)
    R2, t2, X2, lam, it = ba_ckpt.load_ckpt(p)
    np.testing.assert_array_equal(np.asarray(R2), R)
    assert lam == np.float32(3e-4) and it == 7
