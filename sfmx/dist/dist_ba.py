"""Distributed bundle adjustment: observation-sharded LM over a device mesh.

Capability analog: the reference has NO distributed runtime (single-node
Ceres); this is the scale-out path SURVEY §2.3/§5.7 specifies.  Design:

  * The observation table (the only O(N) axis) is sharded over the ``obs``
    mesh axis.  Residuals, Jacobians, robust weights and all per-observation
    outer products are computed shard-locally — zero communication.
  * The fixed-size reduced quantities (camera blocks U (C,6,6), point blocks
    V (P,3,3), RHS vectors) are formed by local ``segment_sum`` + one
    ``psum`` over the mesh — the only collective per assembly.
  * PCG on the reduced camera system runs replicated; its matvec's
    observation-coupled term is again local-work + one ``psum``.
  * Camera/point states stay replicated (tiny next to the obs table).  For
    maps whose V/point state outgrows a chip, the ``partition``/halo path
    (mapstore.partition) shards points by covisibility block instead.

Everything is expressed with ``jax.shard_map`` over a named mesh; the same
code runs on 1 chip (trivial mesh), N local chips, or a multi-host slice
(collectives ride ICI).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import se3
from ..solvers import lm as lm_mod
from ..solvers import schur as schur_mod

AXIS = "obs"


def _psum(x):
    return jax.lax.psum(x, AXIS)


def _local_lm_scan(intr, k_idx, R, t, X, cam_id, pt_id, uv, w_valid, fixed,
                   iters: int, cg_iters: int, huber_px: float):
    """LM scan body executed per-shard inside shard_map (psum at reductions)."""
    n_cams = R.shape[0]
    n_pts = X.shape[0]
    f_ref = jnp.mean(0.5 * (intr[:, 0] + intr[:, 1]))
    huber_n = huber_px / f_ref

    def eval_cost(R, t, X):
        ko = intr[k_idx[cam_id]]
        r = jax.vmap(lm_mod._residual_one)(ko, R[cam_id], t[cam_id], X[pt_id], uv)
        r2 = jnp.sum(r * r, axis=-1)
        return _psum(lm_mod.robust_cost(r2, w_valid, huber_n))

    def lm_iter(state, _):
        R, t, X, lam, cost = state
        r, Jc, Jp = lm_mod._jacobians(intr, k_idx, R, t, X, cam_id, pt_id, uv)
        r2 = jnp.sum(r * r, axis=-1)
        w = w_valid * lm_mod.huber_weight(r2, huber_n)

        # local assembly + one psum for the fixed-size blocks
        nb_local = schur_mod.assemble(Jc, Jp, r, w, cam_id, pt_id, n_cams, n_pts)
        U = _psum(nb_local.U)
        V = _psum(nb_local.V)
        b_c = _psum(nb_local.b_c)
        b_p = _psum(nb_local.b_p)

        Ud = schur_mod._damp(U, lam)
        Vd = schur_mod._damp(V, lam)
        Vinv = schur_mod._inv_spd(Vd)
        Vinv_bp = jnp.einsum("pij,pj->pi", Vinv, b_p)
        contrib = jnp.einsum("oij,oj->oi", nb_local.Wc, Vinv_bp[pt_id])
        b_red = b_c - _psum(
            jax.ops.segment_sum(contrib, cam_id, num_segments=n_cams)
        )

        def proj(x):
            return jnp.where(fixed[:, None], 0.0, x)

        def matvec(x):
            Ux = jnp.einsum("cij,cj->ci", Ud, x)
            Wtx = jnp.einsum("oji,oj->oi", nb_local.Wc, x[cam_id])
            y_p = _psum(jax.ops.segment_sum(Wtx, pt_id, num_segments=n_pts))
            Vinv_y = jnp.einsum("pij,pj->pi", Vinv, y_p)
            z_o = jnp.einsum("oij,oj->oi", nb_local.Wc, Vinv_y[pt_id])
            z_c = _psum(jax.ops.segment_sum(z_o, cam_id, num_segments=n_cams))
            return Ux - z_c

        Minv = schur_mod._inv_spd(Ud)
        b = proj(b_red)
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = proj(jnp.einsum("cij,cj->ci", Minv, r0))

        def cg_body(_, carry):
            x, rr, z, p = carry
            Sp = proj(matvec(p))
            rz = jnp.sum(rr * z)
            alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
            x2 = x + alpha * p
            r2_ = rr - alpha * Sp
            z2 = proj(jnp.einsum("cij,cj->ci", Minv, r2_))
            beta = jnp.sum(r2_ * z2) / jnp.maximum(rz, 1e-20)
            return (x2, r2_, z2, z2 + beta * p)

        dx_c, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, z0, z0))
        # back-substitute points (replicated): need global W^T dx_c per point
        Wtx = jnp.einsum("oji,oj->oi", nb_local.Wc, dx_c[cam_id])
        rhs = b_p - _psum(jax.ops.segment_sum(Wtx, pt_id, num_segments=n_pts))
        dx_p = jnp.einsum("pij,pj->pi", Vinv, rhs)

        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.0625], X.dtype)

        def trial(alpha):
            R2, t2 = se3.perturb_b(R, t, alpha * dx_c)
            return eval_cost(R2, t2, X + alpha * dx_p)

        trial_costs = jax.vmap(trial)(alphas)
        best = jnp.argmin(trial_costs)
        alpha = alphas[best]
        new_cost = trial_costs[best]
        R2, t2 = se3.perturb_b(R, t, alpha * dx_c)
        X2 = X + alpha * dx_p
        accept = new_cost < cost
        full = accept & (best == 0)
        lam2 = jnp.clip(
            jnp.where(full, lam * 0.33, jnp.where(accept, lam, lam * 4.0)), 1e-9, 1e6
        )
        Rn = jnp.where(accept, R2, R)
        tn = jnp.where(accept, t2, t)
        Xn = jnp.where(accept, X2, X)
        cn = jnp.where(accept, new_cost, cost)
        return (Rn, tn, Xn, lam2, cn), cn

    cost0 = eval_cost(R, t, X)
    init = (R, t, X, jnp.asarray(1e-4, X.dtype), cost0)
    (R, t, X, _, _), costs = jax.lax.scan(lm_iter, init, None, length=iters)
    return R, t, X, jnp.concatenate([cost0[None], costs])


def make_ba_step(mesh: Mesh, *, iters: int = 10, cg_iters: int = 30,
                 huber_px: float = 4.0):
    """Build the jitted obs-sharded BA solver for a mesh.

    Obs arrays must have length divisible by the mesh 'obs' axis (pad dead
    rows with w=0 — `dist.mesh.pad_to_multiple`).
    """
    fn = partial(_local_lm_scan, iters=iters, cg_iters=cg_iters, huber_px=huber_px)
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(sharded)
