"""Epipolar geometry: normalized 8-point F/E, pose-from-E, Sampson scoring.

Capability parity: OpenMVG's geometric filtering (F/E ACRANSAC) during
matching and its two-view initializer (relative pose from E + cheirality
disambiguation).  TPU design: every solver consumes a fixed-capacity masked
correspondence set and is built from small symmetric eigenproblems
(9x9 / 3x3 ``eigh``) so it vmaps across thousands of RANSAC hypotheses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _hartley_normalize(x: jax.Array, mask: jax.Array):
    """Similarity-normalize 2D points to zero mean, sqrt(2) RMS radius."""
    w = mask.astype(x.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(x * w, axis=0) / n
    xc = (x - mu) * w
    rms = jnp.sqrt(jnp.sum(xc * xc) / n)
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-12)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], x.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
    return (x - mu) * s, T


def eight_point(x1: jax.Array, x2: jax.Array, mask: jax.Array, essential: bool = False) -> jax.Array:
    """Normalized 8-point algorithm.

    Args:
      x1, x2: (N,2) corresponding points (pixels for F, normalized cam coords
        for E). N may exceed 8 — masked least squares over all valid rows.
      mask: (N,) bool.
      essential: if True enforce the (s,s,0) singular structure, else rank-2.

    Returns 3x3 matrix with x2^T M x1 = 0.
    """
    x1n, T1 = _hartley_normalize(x1, mask)
    x2n, T2 = _hartley_normalize(x2, mask)
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=1)
    A = A * mask.astype(A.dtype)[:, None]
    # Direct SVD of A (not eigh of A^T A, which squares the conditioning and
    # costs ~3 digits of f32 accuracy in the recovered epipolar constraint).
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[8].reshape(3, 3)
    F = T2.T @ F @ T1
    # Structure enforcement AFTER denormalization: the Hartley similarities
    # do not commute with the singular-value structure (for E the equal-pair
    # constraint only holds in the original normalized-camera frame).
    U, D, Vt = jnp.linalg.svd(F)
    if essential:
        s = 0.5 * (D[0] + D[1])
        D = jnp.stack([s, s, jnp.zeros_like(s)])
    else:
        D = D.at[2].set(0.0)
    F = U @ jnp.diag(D) @ Vt
    # Scale-normalize for stable thresholding downstream.
    return F / jnp.maximum(jnp.linalg.norm(F), 1e-12)


def sampson_error(F: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) distance, (N,)."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=1)  # (N,3)
    p2 = jnp.concatenate([x2, ones], axis=1)
    Fp1 = p1 @ F.T  # (N,3) = F @ p1
    Ftp2 = p2 @ F  # (N,3) = F^T @ p2
    num = jnp.sum(p2 * Fp1, axis=1) ** 2
    den = Fp1[:, 0] ** 2 + Fp1[:, 1] ** 2 + Ftp2[:, 0] ** 2 + Ftp2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


_W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def decompose_essential(E: jax.Array):
    """E -> 4 candidate (R, t) with ||t||=1. Caller disambiguates by cheirality."""
    U, _, Vt = jnp.linalg.svd(E)
    # Make proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = _W.astype(E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def relative_pose_from_essential(E: jax.Array, xn1: jax.Array, xn2: jax.Array, mask: jax.Array):
    """Select the (R,t) among the 4 E-decompositions maximizing front-of-both-cameras count.

    Camera 1 is identity; returns world-to-cam2 (R, t) with unit baseline,
    plus the winning in-front count.
    """
    from .triangulate import triangulate_two_view

    Rs, ts = decompose_essential(E)
    I3 = jnp.eye(3, dtype=E.dtype)
    z3 = jnp.zeros(3, dtype=E.dtype)

    def score(R, t):
        X, ok = triangulate_two_view(I3, z3, R, t, xn1, xn2)
        return jnp.sum((ok & mask).astype(jnp.int32)), X

    counts, Xs = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best], Xs[best]
