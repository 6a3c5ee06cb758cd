"""P3P minimal solver: quartic roots, exact pose recovery, low-inlier RANSAC.

Oracle strategy (SURVEY.md §4.2.1): the branch-free Ferrari+Newton quartic
is checked against numpy's companion-matrix roots; the full P3P against
synthetic exact instances where the true pose must appear among the 4
candidates; and the robustness claim (3-pt samples survive inlier ratios
that break 6-pt DLT sampling) is asserted end-to-end through the shared
RANSAC machinery.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfmx.core import se3
from sfmx.solvers import p3p, pnp, ransac


def _random_pose(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    R = np.asarray(se3.quat_to_rot(jnp.asarray(q, jnp.float32)))
    t = rng.standard_normal(3).astype(np.float32)
    return R, t


def _exact_instance(rng, n=3):
    """Random pose + world points, all in front of the camera: draw the
    points in the CAMERA frame with positive depth, map back to world."""
    R, t = _random_pose(rng)
    Xc = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                   rng.uniform(1.0, 6.0, n)], 1).astype(np.float32)
    X = ((Xc - t) @ R).astype(np.float32)
    xn = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    return R, t, X, xn


def test_quartic_roots_match_numpy(rng):
    solve = jax.jit(p3p.quartic_roots)
    checked = 0
    for _ in range(50):
        # build quartics with 4 real roots (the P3P-relevant regime)
        r = np.sort(rng.uniform(-3, 3, 4))
        if np.min(np.diff(r)) < 1e-2:
            continue  # Newton polish is slow near near-double roots
        c = np.poly(r).astype(np.float32) * rng.uniform(0.2, 5.0)
        got = np.sort(np.asarray(solve(jnp.asarray(c))))
        assert np.allclose(got, r, atol=5e-3), (got, r)
        checked += 1
    assert checked >= 30


def test_quartic_complex_pairs_are_finite(rng):
    """Quartics with 0 or 2 real roots must still return finite values."""
    solve = jax.jit(p3p.quartic_roots)
    for _ in range(20):
        c = rng.standard_normal(5).astype(np.float32)
        got = np.asarray(solve(jnp.asarray(c)))
        assert np.all(np.isfinite(got))
        # any real root of the input must be represented
        rts = np.roots(c)
        real = rts[np.abs(rts.imag) < 1e-6].real
        for rr in real:
            assert np.min(np.abs(got - rr)) < 1e-2, (got, rts)


def test_p3p_exact_recovery(rng):
    solve = jax.jit(p3p.p3p_minimal)
    for _ in range(30):
        R, t, X, xn = _exact_instance(rng)
        Rs, ts = solve(jnp.asarray(xn), jnp.asarray(X))
        errs = [np.linalg.norm(np.asarray(Rs[i]) - R)
                + np.linalg.norm(np.asarray(ts[i]) - t) for i in range(4)]
        assert min(errs) < 5e-3, (min(errs), R, t)


def test_p3p_ransac_low_inlier_ratio(rng):
    """At 25% inliers, 3-pt sampling succeeds where 6-pt sampling is near
    hopeless (0.25^3 = 1.6% vs 0.25^6 = 0.02% per-hypothesis success)."""
    R, t, X_in, xn_in = _exact_instance(rng, n=64)
    n_out = 192
    X_out = rng.uniform(-2, 2, (n_out, 3)).astype(np.float32)
    xn_out = rng.uniform(-0.8, 0.8, (n_out, 2)).astype(np.float32)
    xn = jnp.asarray(np.concatenate([xn_in, xn_out]))
    X = jnp.asarray(np.concatenate([X_in, X_out]))
    mask = jnp.ones(len(xn), bool)

    def residual_fn(model, xn_d, X_d):
        r = pnp.pnp_residual(model[0], model[1], xn_d, X_d)
        return jnp.sum(r * r, axis=-1)

    (Re, te), inl, cnt = jax.jit(lambda k: ransac.ransac(
        k, p3p.p3p_minimal, residual_fn, (xn, X), mask,
        k_hypotheses=512, sample_size=3, inlier_threshold=(4.0 / 500.0) ** 2,
        n_candidates=4))(jax.random.PRNGKey(0))
    assert int(cnt) >= 48  # found (most of) the 64 inliers
    assert np.linalg.norm(np.asarray(Re) - R) < 2e-2
    assert np.linalg.norm(np.asarray(te) - t) < 2e-2


def test_localize_query_p3p_path(rng):
    """End-to-end localize_query with pnp_solver="p3p" on a synthetic map."""
    from sfmx.localize.localize import LocalizationMap, localize_query

    P, C, D, K = 512, 16, 32, 128
    X = rng.uniform(-3, 3, (P, 3)).astype(np.float32)
    lm_desc = rng.standard_normal((P, D)).astype(np.float32)
    lm_desc /= np.linalg.norm(lm_desc, axis=1, keepdims=True)
    kf_lm = rng.integers(0, P, (C, 256)).astype(np.int32)
    R, t = _random_pose(rng)
    t = t + np.asarray([0, 0, 8.0], np.float32)  # map in front of camera
    Xc = X @ R.T + t
    vis = Xc[:, 2] > 1.0
    vis_idx = np.flatnonzero(vis)[:K]
    f = 500.0
    intr = jnp.asarray([f, f, 320.0, 240.0, 0, 0, 0], jnp.float32)
    uv = Xc[vis_idx, :2] / Xc[vis_idx, 2:3] * f + np.asarray([320.0, 240.0])
    q_desc = np.zeros((K, D), np.float32)
    q_uv = np.zeros((K, 2), np.float32)
    q_mask = np.zeros(K, bool)
    n = len(vis_idx)
    q_desc[:n] = lm_desc[vis_idx]
    q_uv[:n] = uv
    q_mask[:n] = True
    kf_lm[0, :n] = vis_idx  # ensure retrieval can reach the right landmarks

    gd = rng.standard_normal((C, D)).astype(np.float32)
    gd[0] = q_desc.sum(0)
    gd /= np.linalg.norm(gd, axis=1, keepdims=True)
    lmap = LocalizationMap(
        X=jnp.asarray(X), lm_desc=jnp.asarray(lm_desc),
        lm_alive=jnp.ones(P, bool), kf_gdesc=jnp.asarray(gd),
        kf_alive=jnp.ones(C, bool), kf_centers=jnp.zeros((C, 3)),
        kf_lm=jnp.asarray(kf_lm), kf_lm_mask=jnp.ones((C, 256), bool),
        vocab=None)
    res = localize_query(lmap, jnp.asarray(q_desc), jnp.asarray(q_uv),
                         jnp.asarray(q_mask), intr, jax.random.PRNGKey(1),
                         k_hypotheses=256, pnp_solver="p3p")
    assert int(res.n_inliers) >= n // 2
    assert np.linalg.norm(np.asarray(res.R) - R) < 5e-2
    assert np.linalg.norm(np.asarray(res.t) - t) < 5e-2
