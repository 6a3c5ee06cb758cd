"""Block-sparse normal equations + Schur complement for bundle adjustment.

Capability parity: Ceres' SPARSE_SCHUR / ITERATIVE_SCHUR path (the reference's
BA backend via OpenMVG, SURVEY.md §3.4).  TPU design: the scene's observation
table IS the sparse structure — Jacobian blocks live per-observation in flat
(O, 2, 6) / (O, 2, 3) arrays, and every assembly step is a
``segment_sum`` over camera or point ids.  No sparse matrices, no indices
into CSR structure, no host graph building: everything is dense gathers,
batched 3x3/6x6 linear algebra, and segment reductions — all MXU/VPU native
and shardable over the observation axis.

Layout:
  cams:    flattened camera params updated via se3 left-perturbation, 6/cam
  points:  3/point
  obs:     (cam_id[O], pt_id[O], uv[O,2], w[O]) with w=0 for dead/padded rows

Normal-equation blocks:
  U  (C,6,6)  camera diagonal blocks     = Σ_obs Jc^T Jc
  V  (P,3,3)  point diagonal blocks      = Σ_obs Jp^T Jp
  W  (O,6,3)  per-observation coupling   = Jc^T Jp   (kept per-obs, never
              aggregated into a sparse matrix — applied via segment ops)
Schur complement S = U - W V^{-1} W^T is applied matrix-free in PCG.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class NormalBlocks(NamedTuple):
    U: jax.Array        # (C,6,6)
    V: jax.Array        # (P,3,3)
    Wc: jax.Array       # (O,6,3) per-observation coupling blocks
    b_c: jax.Array      # (C,6)  = -Jc^T r
    b_p: jax.Array      # (P,3)  = -Jp^T r
    cam_id: jax.Array   # (O,)
    pt_id: jax.Array    # (O,)


def assemble(Jc, Jp, r, w, cam_id, pt_id, n_cams: int, n_pts: int) -> NormalBlocks:
    """Build normal-equation blocks from per-observation Jacobians.

    Args:
      Jc: (O,2,6) residual Jacobian wrt camera tangent.
      Jp: (O,2,3) wrt point.
      r:  (O,2) residuals.
      w:  (O,) weights (0 for invalid; robust-loss weights otherwise).
    """
    ws = w[:, None, None]
    Jc_w = Jc * ws
    # Per-observation outer products (batched small matmuls -> MXU).
    U_o = jnp.einsum("oik,oil->okl", Jc_w, Jc)          # (O,6,6)
    V_o = jnp.einsum("oik,oil->okl", Jp * ws, Jp)        # (O,3,3)
    W_o = jnp.einsum("oik,oil->okl", Jc_w, Jp)           # (O,6,3)
    bc_o = -jnp.einsum("oik,oi->ok", Jc_w, r)            # (O,6)
    bp_o = -jnp.einsum("oik,oi->ok", Jp * ws, r)         # (O,3)

    U = jax.ops.segment_sum(U_o, cam_id, num_segments=n_cams)
    V = jax.ops.segment_sum(V_o, pt_id, num_segments=n_pts)
    b_c = jax.ops.segment_sum(bc_o, cam_id, num_segments=n_cams)
    b_p = jax.ops.segment_sum(bp_o, pt_id, num_segments=n_pts)
    return NormalBlocks(U, V, W_o, b_c, b_p, cam_id, pt_id)


def _damp(M: jax.Array, lam: jax.Array) -> jax.Array:
    """Levenberg multiplicative+additive damping of diagonal blocks."""
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return M + eye * (lam * d + 1e-10)[..., None, :] * eye


def _inv_spd(M: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Batched SPD inverse with Tikhonov floor (3x3 / 6x6 blocks)."""
    k = M.shape[-1]
    M = M + eps * jnp.eye(k, dtype=M.dtype)
    return jnp.linalg.inv(M)


class SchurSystem(NamedTuple):
    blocks: NormalBlocks
    Vinv: jax.Array       # (P,3,3) damped-V inverse
    Ud: jax.Array         # (C,6,6) damped U
    b_red: jax.Array      # (C,6) reduced RHS

    @property
    def n_cams(self) -> int:
        return self.Ud.shape[0]

    @property
    def n_pts(self) -> int:
        return self.Vinv.shape[0]


def reduce_system(nb: NormalBlocks, lam: jax.Array) -> SchurSystem:
    """Damp and Schur-eliminate the point blocks (the 'landmark marginalization')."""
    n_cams = nb.U.shape[0]
    n_pts = nb.V.shape[0]
    Ud = _damp(nb.U, lam)
    Vd = _damp(nb.V, lam)
    Vinv = _inv_spd(Vd)
    # b_red = b_c - W V^{-1} b_p   (per-obs gather + segment_sum)
    Vinv_bp = jnp.einsum("pij,pj->pi", Vinv, nb.b_p)      # (P,3)
    contrib = jnp.einsum("oij,oj->oi", nb.Wc, Vinv_bp[nb.pt_id])  # (O,6)
    b_red = nb.b_c - jax.ops.segment_sum(contrib, nb.cam_id, num_segments=n_cams)
    return SchurSystem(nb, Vinv, Ud, b_red)


def schur_matvec(sys: SchurSystem, x: jax.Array) -> jax.Array:
    """S @ x with S = Ud - W V^{-1} W^T, matrix-free over the obs table.

    x: (C,6). Two segment passes: y_p = Σ_obs W^T x_cam (per point), then
    z_c = Σ_obs W V^{-1} y_p (per cam).
    """
    nb = sys.blocks
    Ux = jnp.einsum("cij,cj->ci", sys.Ud, x)
    Wtx = jnp.einsum("oji,oj->oi", nb.Wc, x[nb.cam_id])        # (O,3)
    y_p = jax.ops.segment_sum(Wtx, nb.pt_id, num_segments=sys.n_pts)  # (P,3)
    Vinv_y = jnp.einsum("pij,pj->pi", sys.Vinv, y_p)
    z_o = jnp.einsum("oij,oj->oi", nb.Wc, Vinv_y[nb.pt_id])    # (O,6)
    z_c = jax.ops.segment_sum(z_o, nb.cam_id, num_segments=sys.n_cams)
    return Ux - z_c


def solve_points(sys: SchurSystem, dx_c: jax.Array) -> jax.Array:
    """Back-substitute point updates: dx_p = V^{-1} (b_p - W^T dx_c)."""
    nb = sys.blocks
    Wtx = jnp.einsum("oji,oj->oi", nb.Wc, dx_c[nb.cam_id])
    rhs = nb.b_p - jax.ops.segment_sum(Wtx, nb.pt_id, num_segments=sys.n_pts)
    return jnp.einsum("pij,pj->pi", sys.Vinv, rhs)


@partial(jax.jit, static_argnames=("iters",))
def pcg(sys: SchurSystem, iters: int = 30, fixed_cam_mask=None):
    """Preconditioned CG on the reduced camera system (block-Jacobi precond).

    fixed_cam_mask: (C,) bool — cameras held fixed for gauge (their updates
    are projected to zero every iteration).
    Fixed trip count (jit-static); BA outer loop controls accuracy via iters.
    """
    Minv = _inv_spd(sys.Ud)  # block-Jacobi preconditioner

    def proj(x):
        if fixed_cam_mask is None:
            return x
        return jnp.where(fixed_cam_mask[:, None], 0.0, x)

    b = proj(sys.b_red)
    x0 = jnp.zeros_like(b)
    r0 = b  # since x0 = 0
    z0 = proj(jnp.einsum("cij,cj->ci", Minv, r0))
    p0 = z0

    def body(_, carry):
        x, r, z, p = carry
        Sp = proj(schur_matvec(sys, p))
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
        x2 = x + alpha * p
        r2 = r - alpha * Sp
        z2 = proj(jnp.einsum("cij,cj->ci", Minv, r2))
        beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-20)
        p2 = z2 + beta * p
        return (x2, r2, z2, p2)

    x, r, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, p0))
    return x, jnp.sqrt(jnp.sum(r * r))
