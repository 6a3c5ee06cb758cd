"""Pallas TPU kernels: fused FED diffusion + det-Hessian response.

XLA executes the scale-space evolution as ~26 separate conv/roll/mul HBM
round-trips per step (~30x off the bandwidth roofline for single-channel
planes).  These kernels keep a whole image plane in VMEM:

  * ``diffuse_segment``: all FED steps between two scale levels run on the
    VMEM-resident plane — one HBM read + one write per level segment
    instead of ~15 per step.  Steps are unrolled (static schedule).
  * ``response_level``: the six dilated-Scharr passes + determinant for one
    level, one read + one write.

Boundary semantics are periodic (pltpu.roll), matching features.scharr_roll
and _diffusion_step exactly, so the jnp implementations remain the parity
oracles (tested in interpret mode).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import ScaleSpaceConfig, contrast_k2, fed_tau_schedule, gaussian_blur


def _roll2(x, dy: int, dx: int):
    """Periodic shift by (-dy,-dx) == features._sh semantics, in-kernel.

    pltpu.roll requires non-negative shifts; normalize modulo the axis size.
    """
    if dy:
        x = pltpu.roll(x, (-dy) % x.shape[-2], axis=x.ndim - 2)
    if dx:
        x = pltpu.roll(x, (-dx) % x.shape[-1], axis=x.ndim - 1)
    return x


def _scharr_roll2(x, d: int):
    """Sequential-accumulation Scharr: one shifted plane live at a time.

    The all-at-once form holds 8 shifted copies simultaneously and overflows
    the 16MB VMEM budget for VGA planes with d-dilated double application.
    """
    NE, SE = _roll2(x, -d, d), _roll2(x, d, d)
    gx = NE + SE
    gy = SE - NE
    NW = _roll2(x, -d, -d)
    gx = gx - NW
    gy = gy - NW
    SW = _roll2(x, d, -d)
    gx = gx - SW
    gy = gy + SW
    gx = 3.0 * gx
    gy = 3.0 * gy
    gx = gx + 10.0 * _roll2(x, 0, d)
    gx = gx - 10.0 * _roll2(x, 0, -d)
    gy = gy + 10.0 * _roll2(x, d, 0)
    gy = gy - 10.0 * _roll2(x, -d, 0)
    return gx / 32.0, gy / 32.0


def _make_diffuse_kernel(taus: tuple):
    def kernel(k2_ref, L_ref, out_ref):
        L = L_ref[:]
        k2 = k2_ref[pl.program_id(0)]  # full (B,) SMEM array, indexed per step
        for tau in taus:  # static unroll (full FED cycle on the VMEM plane)
            gx, gy = _scharr_roll2(L, 1)
            g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
            flux = (
                0.5 * (g + _roll2(g, -1, 0)) * (_roll2(L, -1, 0) - L)
                + 0.5 * (g + _roll2(g, 1, 0)) * (_roll2(L, 1, 0) - L)
                + 0.5 * (g + _roll2(g, 0, -1)) * (_roll2(L, 0, -1) - L)
                + 0.5 * (g + _roll2(g, 0, 1)) * (_roll2(L, 0, 1) - L)
            )
            L = L + tau * flux
        out_ref[:] = L

    return kernel


@partial(jax.jit, static_argnames=("taus", "interpret"))
def diffuse_segment(L_prev: jax.Array, k2: jax.Array, taus: tuple, *,
                    interpret: bool = False) -> jax.Array:
    """Run the FED steps of one level segment. L_prev (B,H,W), k2 (B,)."""
    B, H, W = L_prev.shape
    return pl.pallas_call(
        _make_diffuse_kernel(taus),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # k2: whole (B,) array
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        interpret=interpret,
    )(k2, L_prev)


def _scharr_into(gx_ref, gy_ref, src, d: int):
    """Scharr of `src` (a VALUE) written into scratch refs, one shifted
    plane live per statement — Mosaic stack-allocates every live value
    temporary, and the all-values form overflows VMEM on VGA planes."""
    gx_ref[:] = 3.0 * _roll2(src, -d, d)          # NE
    gy_ref[:] = -gx_ref[:]
    t = 3.0 * _roll2(src, d, d)                    # SE
    gx_ref[:] = gx_ref[:] + t
    gy_ref[:] = gy_ref[:] + t
    t = 3.0 * _roll2(src, -d, -d)                  # NW
    gx_ref[:] = gx_ref[:] - t
    gy_ref[:] = gy_ref[:] - t
    t = 3.0 * _roll2(src, d, -d)                   # SW
    gx_ref[:] = gx_ref[:] - t
    gy_ref[:] = gy_ref[:] + t
    gx_ref[:] = gx_ref[:] + 10.0 * _roll2(src, 0, d)
    gx_ref[:] = (gx_ref[:] - 10.0 * _roll2(src, 0, -d)) / 32.0
    gy_ref[:] = gy_ref[:] + 10.0 * _roll2(src, d, 0)
    gy_ref[:] = (gy_ref[:] - 10.0 * _roll2(src, -d, 0)) / 32.0


def _make_response_kernel(d: int):
    def kernel(L_ref, out_ref, s1, s2, s3):
        # s1=Lx s2=Ly -> s3=Lxx out=Lxy -> s1=Lyy (s2 scratch) -> det
        _scharr_into(s1, s2, L_ref[0], d)
        _scharr_into(s3, out_ref.at[0], s1[:], d)   # s3=Lxx, out=Lxy
        _scharr_into(s1, s2, s2[:], d)              # s2 input read as value first
        # s2 now holds Lyy
        s1[:] = out_ref[0] * out_ref[0]             # Lxy^2
        out_ref[0] = s3[:] * s2[:] - s1[:]

    return kernel


@partial(jax.jit, static_argnames=("d", "interpret"))
def response_level(level: jax.Array, d: int, *, interpret: bool = False) -> jax.Array:
    """Det-Hessian response of one level plane batch (B,H,W), aperture d."""
    B, H, W = level.shape
    return pl.pallas_call(
        _make_response_kernel(d),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.float32)] * 3,
        interpret=interpret,
    )(level)


def build_scale_space_and_response(images: jax.Array, cfg: ScaleSpaceConfig, *,
                                   interpret: bool = False):
    """Fused pipeline front: (B,H,W) -> (levels, resp) both (B,L,H,W).

    Images whose width is not a lane-tile multiple (128) or height not a
    sublane multiple (8) are EDGE-REPLICATE padded before the kernels and
    sliced back after: Mosaic rejects misaligned VMEM slices ("Slice shape
    along dimension 2 must be aligned to tiling"), and replicate edges are
    better-behaved than the oracle's circular wrap anyway (wrap mixes
    opposite image borders into the diffusion stencil).  Behavior differs
    from the jnp oracle only within the borders' stencil reach.
    """
    B, H, W = images.shape
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    if (Hp != H or Wp != W) and not interpret:
        images = jnp.pad(images, ((0, 0), (0, Hp - H), (0, Wp - W)),
                         mode="edge")
    else:
        Hp, Wp = H, W
    L0 = gaussian_blur(images, float(cfg.sigmas[0]))
    # the contrast percentile is a GLOBAL per-image statistic: compute it on
    # the unpadded region or padding perturbs every diffusion step
    k2 = contrast_k2(L0[..., :H, :W])[:, 0, 0]
    times = 0.5 * cfg.sigmas**2
    levels = [L0]
    L = L0
    for i in range(1, cfg.n_levels):
        taus = tuple(float(t) for t in fed_tau_schedule(float(times[i] - times[i - 1])))
        L = diffuse_segment(L, k2, taus, interpret=interpret)
        levels.append(L)
    levels = jnp.stack(levels, axis=1)
    resp = jnp.stack(
        [response_level(levels[:, i], int(cfg.sigma_levels[i]), interpret=interpret)
         for i in range(cfg.n_levels)], axis=1)
    if Hp != H or Wp != W:
        levels = levels[..., :H, :W]
        resp = resp[..., :H, :W]
    return levels, resp
