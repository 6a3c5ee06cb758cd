"""Camera models: pinhole with radial distortion (brown k1,k2,k3).

Capability parity: the reference's map stores OpenMVG intrinsics
(``pinhole_radial_k3``: f, cx, cy, k1, k2, k3); localization undistorts
query keypoints before PnP.  Here an intrinsics record is a flat length-7
vector so a scene's intrinsics table is just an (I,7) array that shards
and vmaps trivially.

Layout of an intrinsics vector ``k``:
    k = [fx, fy, cx, cy, k1, k2, k3]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

FX, FY, CX, CY, K1, K2, K3 = range(7)
N_INTR = 7


def make_intrinsics(fx, fy, cx, cy, k1=0.0, k2=0.0, k3=0.0) -> jax.Array:
    return jnp.asarray([fx, fy, cx, cy, k1, k2, k3], dtype=jnp.float32)


def distort_radial(k: jax.Array, xn: jax.Array) -> jax.Array:
    """Apply radial distortion to normalized coords xn (...,2)."""
    r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
    f = 1.0 + r2 * (k[K1] + r2 * (k[K2] + r2 * k[K3]))
    return xn * f


def undistort_radial(k: jax.Array, xd: jax.Array, iters: int = 8) -> jax.Array:
    """Invert radial distortion by fixed-point iteration (fixed trip count).

    xd are distorted normalized coords; returns undistorted normalized coords.
    Fixed iteration count keeps the op jit-static; 8 iterations converge to
    <1e-6 px for |k1|<0.5 lenses.
    """

    def body(_, xn):
        r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
        f = 1.0 + r2 * (k[K1] + r2 * (k[K2] + r2 * k[K3]))
        return xd / f

    return jax.lax.fori_loop(0, iters, body, xd)


def project(k: jax.Array, R: jax.Array, t: jax.Array, X: jax.Array):
    """World point(s) X (...,3) -> pixel coords (...,2) and depth (...,).

    Full model: Xc = R X + t; xn = Xc.xy/Xc.z; xd = distort(xn);
    uv = [fx*xd.x + cx, fy*xd.y + cy].
    """
    Xc = X @ R.T + t
    z = Xc[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = Xc[..., :2] / zsafe[..., None]
    xd = distort_radial(k, xn)
    uv = xd * jnp.stack([k[FX], k[FY]]) + jnp.stack([k[CX], k[CY]])
    return uv, z


def pixel_to_normalized(k: jax.Array, uv: jax.Array, undistort: bool = True) -> jax.Array:
    """Pixel coords -> undistorted normalized camera coords (...,2)."""
    xd = (uv - jnp.stack([k[CX], k[CY]])) / jnp.stack([k[FX], k[FY]])
    if undistort:
        return undistort_radial(k, xd)
    return xd


def bearing(k: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel coords -> unit bearing vectors in the camera frame (...,3)."""
    xn = pixel_to_normalized(k, uv)
    v = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def K_matrix(k: jax.Array) -> jax.Array:
    """3x3 calibration matrix (ignores distortion)."""
    one = jnp.ones((), k.dtype)
    zero = jnp.zeros((), k.dtype)
    return jnp.stack(
        [
            jnp.stack([k[FX], zero, k[CX]]),
            jnp.stack([zero, k[FY], k[CY]]),
            jnp.stack([zero, zero, one]),
        ]
    )


def reprojection_residual(k, R, t, X, uv_obs):
    """2-vector residual (predicted - observed) in pixels; NaN-free.

    Points behind the camera produce large (but finite) residuals via the
    z-clamp in ``project`` — robust loss + cheirality masks handle them.
    """
    uv, _ = project(k, R, t, X)
    return uv - uv_obs
