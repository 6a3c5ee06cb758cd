"""Fused dense-layout Schur matvec (kernels/segsum.py): kernel parity vs
the planes matvec, and full-BA parity of the dense_cg path (SURVEY §4.2.3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmx.kernels import segsum
from sfmx.solvers import lm, schur

from .synthetic import make_scene
from .test_ba import build_obs_table


def _planes_system(C=24, P=600, O=4000, tp_cap=32, seed=0):
    """Random consistent BA normal system in planes layout, pt-sorted."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    t = np.concatenate([rng.uniform(-2, 2, (C, 2)), np.full((C, 1), 25.0)],
                       1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    cam_id = rng.integers(0, C, O).astype(np.int32)
    pt_id = np.sort(rng.integers(0, P, O).astype(np.int32))
    Xc = X[pt_id] + t[cam_id]
    uv = ((Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.asarray([320.0, 240.0])
          + 0.3 * rng.standard_normal((O, 2))).astype(np.float32)
    intr = jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0]], np.float32)
    k_idx = jnp.zeros(C, jnp.int32)
    w = jnp.ones(O, jnp.float32)
    cam_id, pt_id, uv = map(jnp.asarray, (cam_id, pt_id, uv))
    r, Jc, Jp = lm._jacobians_planes(intr, k_idx, jnp.asarray(R),
                                     jnp.asarray(t), jnp.asarray(X),
                                     cam_id, pt_id, uv)
    nbp = schur.assemble_planes(Jc, Jp, r, w, cam_id, pt_id, C, P,
                                pt_sorted=True)
    sysp = schur.reduce_system_planes(nbp, 1e-4, pt_sorted=True)
    dense = segsum.build_dense_obs(pt_id, cam_id, P, C, tp_cap)
    return sysp, dense, (cam_id, pt_id), nbp


def test_dense_layout_roundtrip():
    """Every obs lands in exactly one slot of its own point column."""
    sysp, dense, (cam_id, pt_id), _ = _planes_system()
    rows = np.asarray(dense.rows)
    O = cam_id.shape[0]
    filled = rows[rows < O]
    assert len(filled) == O and len(np.unique(filled)) == O
    tp, pp = rows.shape
    slot, col = np.nonzero(rows < O)
    np.testing.assert_array_equal(np.asarray(pt_id)[rows[slot, col]], col)
    np.testing.assert_array_equal(np.asarray(dense.camp)[slot, col],
                                  np.asarray(cam_id)[rows[slot, col]])


def test_cross_matvec_kernel_matches_planes():
    """Kernel (interpret on CPU) == jnp oracle == planes matvec; the bias
    input reproduces the Schur rhs and back-substitution."""
    sysp, dense, _, nbp = _planes_system()
    C = sysp.n_cams
    P = sysp.n_pts
    cp = -(-C // 128) * 128
    tp, pp = dense.camp.shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((C, 6)), jnp.float32)

    Wp = segsum.pack_rows(dense, sysp.blocks.W18)
    vinv16 = jnp.zeros((16, pp), jnp.float32).at[:9, :P].set(sysp.Vinv9.T)
    x8 = jnp.zeros((8, cp), jnp.float32).at[:6, :C].set(x.T)

    z_ref, vy_ref = segsum.schur_cross_matvec_ref(Wp, dense.camp, vinv16, x8)
    z_ker, vy_ker = segsum.schur_cross_matvec(Wp, dense.camp, vinv16, x8,
                                              tp=tp, interpret=True)
    scale = np.abs(np.asarray(z_ref)).max()
    np.testing.assert_allclose(np.asarray(z_ker), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(vy_ker), np.asarray(vy_ref),
                               rtol=1e-4,
                               atol=1e-4 * np.abs(np.asarray(vy_ref)).max())

    # vs the planes matvec: S x = Ud x - cross  ->  cross = Ud x - S x
    Sx = schur.schur_matvec_planes(sysp, x, pt_sorted=True)
    Ux = jnp.einsum("cij,cj->ci", sysp.Ud, x)
    cross_planes = np.asarray(Ux - Sx)
    np.testing.assert_allclose(np.asarray(z_ref)[:6, :C].T, cross_planes,
                               rtol=2e-4, atol=2e-4 * np.abs(cross_planes).max())

    # reduce + backsub through the kernel == planes versions
    sysd = schur.reduce_system_dense(nbp, dense, 1e-4, use_kernel=True,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(sysd.b_red), np.asarray(sysp.b_red),
                               rtol=2e-4,
                               atol=2e-4 * np.abs(np.asarray(sysp.b_red)).max())
    dxp_planes = schur.solve_points_planes(sysp, x, pt_sorted=True)
    dxp_dense = schur.solve_points_dense(sysd, x, use_kernel=True,
                                         interpret=True)[:P]
    np.testing.assert_allclose(
        np.asarray(dxp_dense), np.asarray(dxp_planes), rtol=2e-4,
        atol=2e-4 * np.abs(np.asarray(dxp_planes)).max())


def test_pcg_dense_matches_pcg_planes():
    sysp, dense, _, nbp = _planes_system()
    fixed = jnp.zeros(sysp.n_cams, bool).at[0].set(True)
    dx_p, _ = schur.pcg_planes(sysp, iters=25, fixed_cam_mask=fixed,
                               pt_sorted=True)
    for use_kernel in (False, True):
        sysd = schur.reduce_system_dense(nbp, dense, 1e-4,
                                         use_kernel=use_kernel,
                                         interpret=True)
        dx_d, _ = schur.pcg_dense(sysd, iters=25, fixed_cam_mask=fixed,
                                  use_kernel=use_kernel, interpret=True)
        err = np.abs(np.asarray(dx_d) - np.asarray(dx_p)).max()
        scale = np.abs(np.asarray(dx_p)).max() + 1e-12
        assert err / scale < 1e-3, (use_kernel, err / scale)


def _local_system(C=300, P=2048, O=6000, tp_cap=16, seed=3):
    """Planes system with CAMERA-LOCAL visibility: each point is seen only
    by a sliding window of cameras (what incremental SfM produces)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    t = np.concatenate([rng.uniform(-2, 2, (C, 2)), np.full((C, 1), 25.0)],
                       1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    pt_id = np.sort(rng.integers(0, P, O).astype(np.int32))
    base_cam = (pt_id.astype(np.float64) / P * (C - 6)).astype(np.int32)
    cam_id = (base_cam + rng.integers(0, 6, O)).astype(np.int32)
    Xc = X[pt_id] + t[cam_id]
    uv = ((Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.asarray([320.0, 240.0])
          + 0.3 * rng.standard_normal((O, 2))).astype(np.float32)
    intr = jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0]], np.float32)
    k_idx = jnp.zeros(C, jnp.int32)
    w = jnp.ones(O, jnp.float32)
    wc = segsum.compute_cam_window(pt_id, cam_id, P, C, tp_cap)
    cam_idj, pt_idj, uvj = map(jnp.asarray, (cam_id, pt_id, uv))
    r, Jc, Jp = lm._jacobians_planes(intr, k_idx, jnp.asarray(R),
                                     jnp.asarray(t), jnp.asarray(X),
                                     cam_idj, pt_idj, uvj)
    nbp = schur.assemble_planes(Jc, Jp, r, w, cam_idj, pt_idj, C, P,
                                pt_sorted=True)
    sysp = schur.reduce_system_planes(nbp, 1e-4, pt_sorted=True)
    dense = segsum.build_dense_obs(pt_idj, cam_idj, P, C, tp_cap,
                                   cam_window=wc)
    return sysp, dense, nbp, wc


def test_cam_window_bound_is_true_bound():
    """compute_cam_window covers every tile's span, incl. pad-slot fill."""
    _, dense, _, wc = _local_system()
    camp = np.asarray(dense.camp)
    bases = np.asarray(dense.bases)
    tp, pp = camp.shape
    tiles = camp.reshape(tp, -1, 512)
    for t in range(tiles.shape[1]):
        assert tiles[:, t].min() >= bases[t]
        assert tiles[:, t].max() < bases[t] + wc, (t, wc)


def test_windowed_kernel_matches_oracle():
    """Camera-windowed one-hot kernel == absolute-index oracle."""
    sysp, dense, nbp, wc = _local_system()
    C, P = sysp.n_cams, sysp.n_pts
    cp = -(-C // 128) * 128
    assert wc < cp, "scene must exercise a real window"
    tp, pp = dense.camp.shape
    rng = np.random.default_rng(4)
    x8 = jnp.zeros((8, cp), jnp.float32).at[:6, :C].set(
        jnp.asarray(rng.standard_normal((C, 6)), jnp.float32).T)
    Wp = segsum.pack_rows(dense, sysp.blocks.W18)
    vinv16 = jnp.zeros((16, pp), jnp.float32).at[:9, :P].set(sysp.Vinv9.T)
    bias = jnp.zeros((8, pp), jnp.float32).at[:3, :P].set(
        jnp.asarray(rng.standard_normal((P, 3)), jnp.float32).T)
    z_ref, vy_ref = segsum.schur_cross_matvec_ref(Wp, dense.camp, vinv16,
                                                  x8, bias)
    z_ker, vy_ker = segsum.schur_cross_matvec(
        Wp, dense.camp, vinv16, x8, bias, tp=tp, bases=dense.bases,
        cam_window=wc, interpret=True)
    scale = np.abs(np.asarray(z_ref)).max()
    np.testing.assert_allclose(np.asarray(z_ker), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(vy_ker), np.asarray(vy_ref), rtol=1e-4,
        atol=1e-4 * np.abs(np.asarray(vy_ref)).max())


def test_pcg_dense_windowed_matches_planes():
    """Windowed-kernel PCG solves the SAME reduced system as well as the
    planes PCG.  The 300-camera local scene has flat directions, so
    iterate-space comparison is meaningless (even the jnp oracle differs
    0.3% from planes there); the correct check is residual quality of each
    solution under the planes matvec."""
    sysp, dense, nbp, wc = _local_system()
    fixed = jnp.zeros(sysp.n_cams, bool).at[0].set(True)

    def resid(dx):
        r = sysp.b_red - schur.schur_matvec_planes(sysp, dx, pt_sorted=True)
        r = jnp.where(fixed[:, None], 0.0, r)
        return float(jnp.sqrt(jnp.sum(r * r)))

    dx_p, _ = schur.pcg_planes(sysp, iters=25, fixed_cam_mask=fixed,
                               pt_sorted=True)
    sysd = schur.reduce_system_dense(nbp, dense, 1e-4, use_kernel=True,
                                     interpret=True, cam_window=wc)
    np.testing.assert_allclose(
        np.asarray(sysd.b_red), np.asarray(sysp.b_red), rtol=2e-4,
        atol=2e-4 * np.abs(np.asarray(sysp.b_red)).max())
    dx_d, _ = schur.pcg_dense(sysd, iters=25, fixed_cam_mask=fixed,
                              use_kernel=True, interpret=True, cam_window=wc)
    assert resid(dx_d) <= resid(dx_p) * 1.5, (resid(dx_d), resid(dx_p))


def _raw_local_scene(C=300, P=2048, O=6000, tp_cap=16, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    t = np.concatenate([rng.uniform(-2, 2, (C, 2)), np.full((C, 1), 25.0)],
                       1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    pt_id = np.sort(rng.integers(0, P, O).astype(np.int32))
    base_cam = (pt_id.astype(np.float64) / P * (C - 6)).astype(np.int32)
    cam_id = (base_cam + rng.integers(0, 6, O)).astype(np.int32)
    Xc = X[pt_id] + t[cam_id]
    uv = ((Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.asarray([320.0, 240.0])
          + 0.3 * rng.standard_normal((O, 2))).astype(np.float32)
    intr = jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0.01, 0]],
                       np.float32)
    return (intr, jnp.zeros(C, jnp.int32), jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(X), jnp.asarray(cam_id), jnp.asarray(pt_id),
            jnp.asarray(uv), jnp.ones(O, jnp.float32), tp_cap)


def test_fused_assembly_matches_planes():
    """ba_assemble_fused (interpret) reproduces the planes pipeline's
    U/V/W/b blocks and robust cost, including Huber weights and radial
    distortion, through the windowed camera gather."""
    (intr, k_idx, R, t, X, cam_id, pt_id, uv, w, tp_cap) = _raw_local_scene()
    C, P = R.shape[0], X.shape[0]
    delta = 4.0 / 500.0
    wc = segsum.compute_cam_window(np.asarray(pt_id), np.asarray(cam_id),
                                   P, C, tp_cap)
    r, Jc, Jp = lm._jacobians_planes(intr, k_idx, R, t, X, cam_id, pt_id, uv)
    r2 = jnp.sum(r * r, -1)
    wh = w * lm.huber_weight(r2, delta)
    nbp = schur.assemble_planes(Jc, Jp, r, wh, cam_id, pt_id, C, P,
                                pt_sorted=True)
    cost_ref = float(lm.robust_cost(r2, w, delta))

    dense = segsum.build_dense_obs(pt_id, cam_id, P, C, tp_cap,
                                   cam_window=wc)
    uvw = segsum.pack_rows(dense, jnp.concatenate([uv, w[:, None]], 1))
    cam19 = segsum.build_cam_table(intr, k_idx, R, t)
    pp = dense.camp.shape[1]
    x8 = jnp.zeros((8, pp), jnp.float32).at[:3, :P].set(X.T)
    u96, v16, Wp = segsum.ba_assemble_fused(
        cam19, dense.camp, uvw, x8, delta, tp=tp_cap, bases=dense.bases,
        cam_window=wc, interpret=True)
    ub = u96[:48] + u96[48:]
    U = ub[:36, :C].T.reshape(C, 6, 6)

    def rel(a, b):
        return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-20))

    assert rel(U, nbp.U) < 1e-4
    assert rel(ub[36:42, :C].T, nbp.b_c) < 2e-3   # near-cancelling sums
    assert rel(v16[:9, :P].T, nbp.V9) < 1e-4
    assert rel(v16[9:12, :P].T, nbp.b_p) < 1e-3
    assert rel(Wp, segsum.pack_rows(dense, nbp.W18)) < 1e-4
    np.testing.assert_allclose(float(jnp.sum(v16[12])), cost_ref, rtol=1e-4)


def test_cost_fused_matches_eval():
    """The 2-candidate fused cost kernel == lm._eval_cost per candidate."""
    (intr, k_idx, R, t, X, cam_id, pt_id, uv, w, tp_cap) = _raw_local_scene()
    C, P = R.shape[0], X.shape[0]
    delta = 4.0 / 500.0
    wc = segsum.compute_cam_window(np.asarray(pt_id), np.asarray(cam_id),
                                   P, C, tp_cap)
    dense = segsum.build_dense_obs(pt_id, cam_id, P, C, tp_cap,
                                   cam_window=wc)
    uvw = segsum.pack_rows(dense, jnp.concatenate([uv, w[:, None]], 1))
    pp = dense.camp.shape[1]
    cam19s = jnp.concatenate(
        [segsum.build_cam_table(intr, k_idx, R, t),
         segsum.build_cam_table(intr, k_idx, R, t + 0.01)], 0)
    x8s = (jnp.zeros((16, pp), jnp.float32)
           .at[:3, :P].set(X.T).at[8:11, :P].set(X.T + 0.005))
    costs = segsum.ba_cost_fused(cam19s, dense.camp, uvw, x8s, delta,
                                 tp=tp_cap, nc=2, bases=dense.bases,
                                 cam_window=wc, interpret=True)
    c0 = lm._eval_cost(intr, k_idx, R, t, X, cam_id, pt_id, uv, w, delta)
    c1 = lm._eval_cost(intr, k_idx, R, t + 0.01, X + 0.005,
                       cam_id, pt_id, uv, w, delta)
    np.testing.assert_allclose(float(costs[0]), float(c0), rtol=1e-4)
    np.testing.assert_allclose(float(costs[1]), float(c1), rtol=1e-4)


def test_ba_solve_dense_cg_parity():
    """Full LM with the dense/fused CG converges identically (costs) to the
    planes path on a perturbed orbit scene."""
    sc = make_scene(n_cams=8, n_points=120, noise_px=0.3)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    intr = jnp.asarray(sc.intrinsics, jnp.float32)[None]
    k_idx = jnp.zeros(8, jnp.int32)
    fixed = jnp.zeros(8, bool).at[0].set(True)
    rng = np.random.default_rng(2)
    R0 = jnp.asarray(sc.Rs, jnp.float32)
    t0 = jnp.asarray(sc.ts + 0.03 * rng.standard_normal((8, 3)), jnp.float32)
    X0 = jnp.asarray(sc.points + 0.03 * rng.standard_normal((120, 3)),
                     jnp.float32)
    args = (intr, k_idx, R0, t0, X0, cam_id, pt_id, jnp.asarray(uv),
            jnp.asarray(w), fixed)
    Ra, ta, Xa, costs_a = lm.ba_solve(*args, iters=8, cg_iters=25, tp_cap=16)
    Rb, tb, Xb, costs_b = lm.ba_solve(*args, iters=8, cg_iters=25, tp_cap=16,
                                      dense_cg=True)
    assert float(costs_b[-1]) < float(costs_b[0]) * 0.1
    np.testing.assert_allclose(float(costs_b[-1]), float(costs_a[-1]),
                               rtol=0.02)


def test_ba_solve_dense_overflow_parity():
    """Long-track hybrid: tp_cap DELIBERATELY below the longest track with
    the overflow riding ov_cap must converge to the same optimum as the
    planes path over the full table (VERDICT r3 item 5: no more tp>64
    fallback — the dense path must survive dense-walkthrough tracks)."""
    sc = make_scene(n_cams=8, n_points=120, noise_px=0.3)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    lens = np.bincount(np.asarray(pt_id), minlength=120)
    tp_small = 4
    assert lens.max() > tp_small  # the scene really has longer tracks
    ov = int(np.maximum(lens - tp_small, 0).sum())
    ov_cap = 1 << (ov - 1).bit_length()
    intr = jnp.asarray(sc.intrinsics, jnp.float32)[None]
    k_idx = jnp.zeros(8, jnp.int32)
    fixed = jnp.zeros(8, bool).at[0].set(True)
    rng = np.random.default_rng(2)
    R0 = jnp.asarray(sc.Rs, jnp.float32)
    t0 = jnp.asarray(sc.ts + 0.03 * rng.standard_normal((8, 3)), jnp.float32)
    X0 = jnp.asarray(sc.points + 0.03 * rng.standard_normal((120, 3)),
                     jnp.float32)
    args = (intr, k_idx, R0, t0, X0, cam_id, pt_id, jnp.asarray(uv),
            jnp.asarray(w), fixed)
    Ra, ta, Xa, costs_a = lm.ba_solve(*args, iters=8, cg_iters=25, tp_cap=16)
    Rb, tb, Xb, costs_b = lm.ba_solve(*args, iters=8, cg_iters=25,
                                      tp_cap=tp_small, dense_cg=True,
                                      ov_cap=ov_cap)
    assert float(costs_b[-1]) < float(costs_b[0]) * 0.1
    np.testing.assert_allclose(float(costs_b[-1]), float(costs_a[-1]),
                               rtol=0.02)
    # with a camera window too (the production configuration)
    order = np.argsort(np.asarray(pt_id), kind="stable")
    wc = segsum.compute_cam_window(np.asarray(pt_id)[order],
                                   np.asarray(cam_id)[order], 120, 8,
                                   tp_small)
    Rc, tc, Xc, costs_c = lm.ba_solve(*args, iters=8, cg_iters=25,
                                      tp_cap=tp_small, dense_cg=True,
                                      ov_cap=ov_cap, cam_window=wc)
    np.testing.assert_allclose(float(costs_c[-1]), float(costs_a[-1]),
                               rtol=0.02)
