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


# ---------------------------------------------------------------------------
# Extended system: shared-intrinsics blocks in the reduced camera system
# ---------------------------------------------------------------------------

class NormalBlocksK(NamedTuple):
    """Normal blocks with per-group intrinsics parameters (n_p each).

    Each camera couples to exactly one intrinsics group (k_idx[cam]), so the
    pose<->intrinsics coupling is a per-camera (6,n_p) block and everything
    stays segment-sum shaped.
    """

    base: NormalBlocks
    Ukk: jax.Array      # (I,n_p,n_p)
    Uck: jax.Array      # (C,6,n_p)  pose-intrinsics coupling (summed per cam)
    Wk: jax.Array       # (O,n_p,3)  intrinsics-point coupling per obs
    b_k: jax.Array      # (I,n_p)
    group: jax.Array    # (O,) intrinsics group of each observation
    cam_group: jax.Array  # (C,) intrinsics group of each camera


def assemble_with_intrinsics(Jc, Jp, Jk, r, w, cam_id, pt_id, group, cam_group,
                             n_cams: int, n_pts: int, n_groups: int) -> NormalBlocksK:
    base = assemble(Jc, Jp, r, w, cam_id, pt_id, n_cams, n_pts)
    ws = w[:, None, None]
    Jk_w = Jk * ws
    Ukk_o = jnp.einsum("oik,oil->okl", Jk_w, Jk)
    Uck_o = jnp.einsum("oik,oil->okl", Jc * ws, Jk)   # (O,6,n_p)
    Wk_o = jnp.einsum("oik,oil->okl", Jk_w, Jp)        # (O,n_p,3)
    bk_o = -jnp.einsum("oik,oi->ok", Jk_w, r)
    Ukk = jax.ops.segment_sum(Ukk_o, group, num_segments=n_groups)
    Uck = jax.ops.segment_sum(Uck_o, cam_id, num_segments=n_cams)
    b_k = jax.ops.segment_sum(bk_o, group, num_segments=n_groups)
    return NormalBlocksK(base, Ukk, Uck, Wk_o, b_k, group, cam_group)


class SchurSystemK(NamedTuple):
    sys: SchurSystem     # pose/point part (damped, reduced)
    Ukk_d: jax.Array     # (I,n_p,n_p) damped
    Uck: jax.Array       # (C,6,n_p)
    Wk: jax.Array        # (O,n_p,3)
    b_red_k: jax.Array   # (I,n_p)
    group: jax.Array
    cam_group: jax.Array

    @property
    def n_groups(self) -> int:
        return self.Ukk_d.shape[0]


def reduce_system_k(nbk: NormalBlocksK, lam) -> SchurSystemK:
    sys = reduce_system(nbk.base, lam)
    nb = nbk.base
    Ukk_d = _damp(nbk.Ukk, lam)
    # b_red_k = b_k - Wk V^{-1} b_p
    Vinv_bp = jnp.einsum("pij,pj->pi", sys.Vinv, nb.b_p)
    contrib = jnp.einsum("oij,oj->oi", nbk.Wk, Vinv_bp[nb.pt_id])
    b_red_k = nbk.b_k - jax.ops.segment_sum(
        contrib, nbk.group, num_segments=nbk.Ukk.shape[0])
    return SchurSystemK(sys, Ukk_d, nbk.Uck, nbk.Wk, b_red_k, nbk.group,
                        nbk.cam_group)


def schur_matvec_k(sk: SchurSystemK, x_c: jax.Array, x_k: jax.Array):
    """Matvec of the reduced system over (poses, intrinsics groups)."""
    sys = sk.sys
    nb = sys.blocks
    # direct terms
    y_c = jnp.einsum("cij,cj->ci", sys.Ud, x_c)
    y_c += jnp.einsum("cij,cj->ci", sk.Uck, x_k[sk.cam_group])
    y_k = jnp.einsum("gij,gj->gi", sk.Ukk_d, x_k)
    y_k += jax.ops.segment_sum(
        jnp.einsum("cji,cj->ci", sk.Uck, x_c), sk.cam_group,
        num_segments=sk.n_groups)
    # point-mediated terms: z_p = V^{-1} (Wc^T x_c + Wk^T x_k) per point
    Wtx = jnp.einsum("oji,oj->oi", nb.Wc, x_c[nb.cam_id])
    Wtx += jnp.einsum("oji,oj->oi", sk.Wk, x_k[sk.group])
    z_p = jax.ops.segment_sum(Wtx, nb.pt_id, num_segments=sys.n_pts)
    Vz = jnp.einsum("pij,pj->pi", sys.Vinv, z_p)
    y_c -= jax.ops.segment_sum(
        jnp.einsum("oij,oj->oi", nb.Wc, Vz[nb.pt_id]), nb.cam_id,
        num_segments=sys.n_cams)
    y_k -= jax.ops.segment_sum(
        jnp.einsum("oij,oj->oi", sk.Wk, Vz[nb.pt_id]), sk.group,
        num_segments=sk.n_groups)
    return y_c, y_k


def solve_points_k(sk: SchurSystemK, dx_c: jax.Array, dx_k: jax.Array) -> jax.Array:
    nb = sk.sys.blocks
    Wtx = jnp.einsum("oji,oj->oi", nb.Wc, dx_c[nb.cam_id])
    Wtx += jnp.einsum("oji,oj->oi", sk.Wk, dx_k[sk.group])
    rhs = nb.b_p - jax.ops.segment_sum(Wtx, nb.pt_id, num_segments=sk.sys.n_pts)
    return jnp.einsum("pij,pj->pi", sk.sys.Vinv, rhs)


@partial(jax.jit, static_argnames=("iters",))
def pcg_k(sk: SchurSystemK, iters: int = 30, fixed_cam_mask=None):
    """Block-Jacobi PCG on the (poses + intrinsics) reduced system."""
    Minv_c = _inv_spd(sk.sys.Ud)
    Minv_k = _inv_spd(sk.Ukk_d)

    def proj(xc, xk):
        if fixed_cam_mask is None:
            return xc, xk
        return jnp.where(fixed_cam_mask[:, None], 0.0, xc), xk

    def prec(rc, rk):
        return (jnp.einsum("cij,cj->ci", Minv_c, rc),
                jnp.einsum("gij,gj->gi", Minv_k, rk))

    b_c, b_k = proj(sk.sys.b_red, sk.b_red_k)
    x = (jnp.zeros_like(b_c), jnp.zeros_like(b_k))
    r = (b_c, b_k)
    z = proj(*prec(*r))
    p = z

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

    def body(_, carry):
        x, r, z, p = carry
        Sp = proj(*schur_matvec_k(sk, *p))
        rz = dot(r, z)
        alpha = rz / jnp.maximum(dot(p, Sp), 1e-20)
        x2 = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        r2 = (r[0] - alpha * Sp[0], r[1] - alpha * Sp[1])
        z2 = proj(*prec(*r2))
        beta = dot(r2, z2) / jnp.maximum(rz, 1e-20)
        p2 = (z2[0] + beta * p[0], z2[1] + beta * p[1])
        return (x2, r2, z2, p2)

    x, r, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, z, p))
    return x[0], x[1]
