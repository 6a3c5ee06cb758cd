"""Pallas TPU kernel: upright patch descriptor via window-DMA + MXU resample.

The jnp `describe` path computes ~3k bilinear gathers per keypoint from the
full scale-space array — random access the TPU has no hardware for (XLA
lowers it to scalarized loads; it dominated the extraction profile).  The
TPU-native formulation:

  1. One async DMA copies a static 128x128 window around the keypoint from
     the HBM-resident scale-space level into VMEM (contiguous — what DMA
     engines are built for).  Windows are double-buffered across the
     keypoint grid so the copy of keypoint i+1 overlaps compute of i.
  2. The scale-adapted PATCH x PATCH patch resample is separable for the
     upright descriptor: patch = Sy @ window @ Sx^T where Sy/Sx are
     (PATCH,128) bilinear-weight matrices built on the VPU from the
     keypoint's fractional offset and sigma-dependent spacing.  Two small
     MXU matmuls replace ~600 gathers.
  3. The kernel emits lane-padded 24x24 patches; cell/gradient pooling over
     the 2x2+3x3+4x4 partitions runs OUTSIDE the kernel as dense XLA matmuls
     (Mosaic cannot lower the tiny (g,g)->(g*g,) flattens, and XLA fuses the
     pooling into the following normalization anyway).

Upright (gravity-aligned) mode matches the reference's dominant indoor use;
the oriented path (features.describe) remains for rotated settings.
Parity oracle: `describe_upright_reference` below (pure jnp).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import _GRIDS, _PATCH, _bilinear

WIN = 256           # VMEM window side; origin aligned (8 sublanes / 128 lanes)
                    # so the HBM->VMEM DMA offsets are provably tiled
N_CELLS_RAW = sum(g * g for g in _GRIDS) * 3   # 87
OUT_DIM = 128       # padded output lanes

def _pool_mat(g: int) -> jax.Array:
    """(g, PATCH) cell-mean pooling matrix, built from iota (pallas kernels
    cannot capture constant arrays)."""
    cs = _PATCH // g
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, _PATCH), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, _PATCH), 1)
    return jnp.where(cols // cs == rows, 1.0 / cs, 0.0).astype(jnp.float32)


def _interp_matrix(center: jax.Array, spacing: jax.Array) -> jax.Array:
    """(PATCH, WIN) bilinear sampling weights along one axis.

    Sample positions: center + (k - (PATCH-1)/2) * spacing, k in [0,PATCH).
    """
    # int32 iota + cast: Mosaic rejects f32 iota along the sublane dim
    k = jax.lax.broadcasted_iota(jnp.int32, (_PATCH, WIN), 0).astype(jnp.float32)
    w = jax.lax.broadcasted_iota(jnp.int32, (_PATCH, WIN), 1).astype(jnp.float32)
    pos = center + (k - (_PATCH - 1) / 2.0) * spacing
    d = 1.0 - jnp.abs(w - pos)
    return jnp.maximum(d, 0.0)


def _cells_from_patch(patch: jax.Array) -> jax.Array:
    """(PATCH,PATCH) -> (87,) cell features [mean,dx,dy per grid]."""
    # in-patch gradients (axis-aligned == upright frame)
    dx = jnp.concatenate(
        [patch[:, 1:2] - patch[:, 0:1],
         0.5 * (patch[:, 2:] - patch[:, :-2]),
         patch[:, -1:] - patch[:, -2:-1]], axis=1)
    dy = jnp.concatenate(
        [patch[1:2] - patch[0:1],
         0.5 * (patch[2:] - patch[:-2]),
         patch[-1:] - patch[-2:-1]], axis=0)
    outs = []
    for g in _GRIDS:
        Pm = _pool_mat(g)
        for ch in (patch, dx, dy):
            outs.append((Pm @ ch @ Pm.T).reshape(g * g))
    # layout must match features.describe: per grid, [mean, dx, dy]
    return jnp.concatenate(outs)


GROUP = 8  # keypoints per grid step (TPU block sublane constraint)


def _describe_kernel(lvl_ref, y0_ref, x0_ref, fy_ref, fx_ref, sp_ref,
                     levels_hbm, out_ref, win_vmem, sem):
    """Grid over keypoint groups; GROUP in-flight window DMAs per step."""
    i = pl.program_id(0)

    def start_copy(j):
        idx = i * GROUP + j
        y0 = pl.multiple_of(y0_ref[idx], 8)
        x0 = pl.multiple_of(x0_ref[idx], 128)
        return pltpu.make_async_copy(
            levels_hbm.at[lvl_ref[idx], pl.ds(y0, WIN), pl.ds(x0, WIN)],
            win_vmem.at[j],
            sem.at[j],
        )

    for j in range(GROUP):
        start_copy(j).start()

    for j in range(GROUP):
        idx = i * GROUP + j
        start_copy(j).wait()
        Sy = _interp_matrix(fy_ref[idx], sp_ref[idx])   # (PATCH, WIN)
        Sx = _interp_matrix(fx_ref[idx], sp_ref[idx])
        win = win_vmem[j]
        patch = jnp.dot(
            Sy, jnp.dot(win, Sx.T, preferred_element_type=jnp.float32),
            preferred_element_type=jnp.float32)
        # Write the resampled patch; cell pooling happens outside the kernel
        # (Mosaic cannot lower the tiny (g,g)->(g*g,) reshapes, and pooling
        # is dense MXU work XLA already handles).  Lane-pad 24 -> 128.
        out_ref[j * _PATCH:(j + 1) * _PATCH, :_PATCH] = patch
        out_ref[j * _PATCH:(j + 1) * _PATCH, _PATCH:] = jnp.zeros(
            (_PATCH, OUT_DIM - _PATCH), jnp.float32)


def _window_params(uv, sigma, H, W):
    """Aligned window origin + in-window center + sample spacing.

    Origins are aligned DOWN (y: 8, x: 128) so Mosaic can prove the DMA
    offsets divisible by the memory tiling; H/W must be padded such that
    H % 8 == 0, W % 128 == 0, H >= WIN, W >= WIN (see describe_upright).
    """
    spacing = 20.0 * sigma / (_PATCH - 1)     # span 20 sigma over PATCH samples
    y0 = jnp.floor(uv[..., 1] - 64.0).astype(jnp.int32)
    y0 = jnp.clip((y0 // 8) * 8, 0, H - WIN)
    x0 = jnp.floor(uv[..., 0] - 64.0).astype(jnp.int32)
    x0 = jnp.clip((x0 // 128) * 128, 0, W - WIN)
    fx = uv[..., 0] - x0.astype(jnp.float32)
    fy = uv[..., 1] - y0.astype(jnp.float32)
    return y0, x0, fy, fx, spacing


@partial(jax.jit, static_argnames=("interpret",))
def describe_upright(levels: jax.Array, uv: jax.Array, level: jax.Array,
                     sigma: jax.Array, mask: jax.Array, *, interpret: bool = False):
    """Upright cell features for all keypoints of a batch.

    Args:
      levels: (B,L,H,W) scale space.
      uv/level/sigma/mask: (B,K) keypoint fields.
    Returns raw cell features (B,K,128) (normalize with `finalize_float`).
    """
    B, L, H, W = levels.shape
    K = uv.shape[1]
    # pad the scale space so aligned window origins always fit
    Hp = max(((H + 7) // 8) * 8, WIN)
    Wp = max(((W + 127) // 128) * 128, WIN)
    if (Hp, Wp) != (H, W):
        levels = jnp.pad(levels, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
    y0, x0, fy, fx, sp = _window_params(uv, sigma, Hp, Wp)

    def per_image(lv, y0i, x0i, fyi, fxi, spi, lvli):
        assert K % GROUP == 0, f"keypoint capacity must be a multiple of {GROUP}"
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(K // GROUP,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((GROUP * _PATCH, OUT_DIM), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((GROUP, WIN, WIN), jnp.float32),
                pltpu.SemaphoreType.DMA((GROUP,)),
            ],
        )
        return pl.pallas_call(
            _describe_kernel,
            out_shape=jax.ShapeDtypeStruct((K * _PATCH, OUT_DIM), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(lvli, y0i, x0i, fyi, fxi, spi, lv)

    rows = jax.vmap(per_image)(levels, y0, x0, fy, fx, sp, level)
    patches = rows.reshape(B, K, _PATCH, OUT_DIM)[..., :_PATCH]  # (B,K,24,24)
    feats = jax.vmap(jax.vmap(_cells_from_patch))(patches)
    pad = OUT_DIM - feats.shape[-1]
    feats = jnp.pad(feats, ((0, 0), (0, 0), (0, pad)))
    return jnp.where(mask[..., None], feats, 0.0)


def describe_upright_reference(levels, uv, level, sigma, mask):
    """Pure-jnp parity oracle for `describe_upright` (same math, gathers)."""
    B, L, H, W = levels.shape
    K = uv.shape[1]
    Hp = max(((H + 7) // 8) * 8, WIN)
    Wp = max(((W + 127) // 128) * 128, WIN)
    if (Hp, Wp) != (H, W):
        levels = jnp.pad(levels, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
    y0, x0, fy, fx, sp = _window_params(uv, sigma, Hp, Wp)

    def one(lv, uv1, lvl1, y01, x01, fy1, fx1, sp1):
        img = lv[lvl1]
        k = jnp.arange(_PATCH, dtype=jnp.float32)
        off = (k - (_PATCH - 1) / 2.0) * sp1
        xs = x01.astype(jnp.float32) + fx1 + off
        ys = y01.astype(jnp.float32) + fy1 + off
        gx, gy = jnp.meshgrid(xs, ys)
        patch = _bilinear(img, gx.ravel(), gy.ravel()).reshape(_PATCH, _PATCH)
        return _cells_from_patch(patch)

    feats = jax.vmap(jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)))(
        levels, uv, level, y0, x0, fy, fx, sp
    )
    pad = OUT_DIM - feats.shape[-1]
    feats = jnp.pad(feats, ((0, 0), (0, 0), (0, pad)))
    return jnp.where(mask[..., None], feats, 0.0)


def finalize_float(raw: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-group standardization + global L2 norm (matches features.describe)."""
    groups = []
    off = 0
    for gdim in _GRIDS:
        n = gdim * gdim
        for _ch in range(3):
            v = raw[..., off:off + n]
            off += n
            v = v - jnp.mean(v, axis=-1, keepdims=True)
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
            groups.append(v)
    f = jnp.concatenate(groups, axis=-1)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
    pad = OUT_DIM - f.shape[-1]
    f = jnp.pad(f, ((0, 0), (0, 0), (0, pad)))
    return jnp.where(mask[..., None], f, 0.0)


def finalize_bits(raw: jax.Array, mask: jax.Array) -> jax.Array:
    """Pack M-LDB comparison bits from raw cell features (matches
    features.describe's pair ordering; packed (B,K,N_WORDS) uint32)."""
    from .features import N_WORDS

    bits = []
    off = 0
    for gdim in _GRIDS:
        n = gdim * gdim
        for _ch in range(3):
            v = raw[..., off:off + n]
            off += n
            iu, ju = np.triu_indices(n, k=1)
            bits.append(v[..., iu] > v[..., ju])
    b = jnp.concatenate(bits, axis=-1)
    pad = N_WORDS * 32 - b.shape[-1]
    b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
    w = b.reshape(*b.shape[:-1], N_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(w << shifts, axis=-1).astype(jnp.uint32)
    return jnp.where(mask[..., None], packed, 0)
