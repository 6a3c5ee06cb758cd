"""Closed-form similarity alignment (Umeyama) — georeferencing & ATE.

Capability parity: the reference's coordinate-alignment tools map the SfM
frame into the floor-plan/world frame from user control points, and its
evaluation aligns trajectories before computing error (SURVEY.md C11, C15).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def umeyama(src: jax.Array, dst: jax.Array, mask=None, with_scale: bool = True):
    """Least-squares similarity s,R,t minimizing ||dst - (s R src + t)||^2.

    Args:
      src, dst: (N,3) corresponding points.
      mask: optional (N,) bool of valid correspondences.
    Returns: (s, R, t).
    """
    if mask is None:
        mask = jnp.ones(src.shape[0], dtype=bool)
    w = mask.astype(src.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu_s = jnp.sum(src * w[:, None], axis=0) / n
    mu_d = jnp.sum(dst * w[:, None], axis=0) / n
    sc = (src - mu_s) * w[:, None]
    dc = (dst - mu_d) * w[:, None]
    cov = dc.T @ (src - mu_s) / n  # (3,3)
    var_s = jnp.sum(sc * (src - mu_s)) / n
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.diag(jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)]))
    R = U @ S @ Vt
    if with_scale:
        s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.ones((), src.dtype)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def apply_sim3(s, R, t, X):
    return s * (X @ R.T) + t


def ate_rmse(est: jax.Array, ref: jax.Array, mask=None, with_scale: bool = True):
    """Absolute trajectory error: Umeyama-align est->ref, RMSE of residuals."""
    if mask is None:
        mask = jnp.ones(est.shape[0], dtype=bool)
    s, R, t = umeyama(est, ref, mask, with_scale=with_scale)
    aligned = apply_sim3(s, R, t, est)
    err2 = jnp.sum((aligned - ref) ** 2, axis=-1)
    w = mask.astype(est.dtype)
    rmse = jnp.sqrt(jnp.sum(err2 * w) / jnp.maximum(jnp.sum(w), 1.0))
    return rmse, (s, R, t)
