"""Pallas TPU kernel: fused Schur-complement cross-term matvec for BA.

Capability parity: the reduced-camera-system solve inside Ceres'
ITERATIVE_SCHUR (SURVEY §3.4 "dominant cost", §7.2 planned kernel).

Why a kernel: the CG matvec S x = U_d x - W V^{-1} W^T x is built from
per-observation 6x3 blocks coupled to cameras by cam_id and points by
pt_id.  In XLA this lowers to width-3/6 gathers and scatter-adds, which on
this chip run at 1-13 GB/s (measured, BASELINE.md round-3 table: achieved
gather/scatter bandwidth is linear in row width; the dense-stream ceiling
is ~383 GB/s).  The planes-formulation matvec measures 12.7 ms at config-3
scale — >100x off the dense-stream roofline — because every one of its six
narrow gather/scatter passes wastes ~97% of each HBM burst.

Design (measured 1.4 ms for the same matvec, ~9x):
  * POINT-MAJOR DENSE layout: observations live in (tp, P) padded slots
    sorted by point (track lengths are capped by the track builder, so
    tp is a true bound).  W blocks stream as a dense (tp*18, P) f32 array
    in the PLANES convention (big axis on lanes) — full-bandwidth reads,
    no (O,6,3) tile inflation.
  * The point-side reduction is a dense sum over the tp axis — the
    scatter-add is GONE, and V^{-1} applies in-register per point tile.
  * The camera-side gather x[camp] and scatter-add of z contributions run
    on the MXU as one-hot matmuls against a VMEM-resident (8, Cp) camera
    table: building (Cp, TP) one-hot masks by iota-compare costs VPU
    compares, and each dot pads M=8 rows — ~5% MXU utilization — but that
    still beats HBM scatter at 0.7-6 GB/s by an order of magnitude.
  * f32 values split into (hi, lo) bf16 pairs before each one-hot matmul
    (one-hot entries are exact in bf16, so hi+lo reproduces the f32 gather
    /scatter to accumulation rounding; plain bf16 rounds inputs to 8 bits
    and visibly perturbs CG trajectories).

HBM traffic per matvec: W read once (O*18*4 B) + camp + Vinv9 + x/z
(C-sized, negligible) — ~16 MB at config-3 vs ~50 MB of narrow traffic in
the planes path, and all of it dense-stream.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


from typing import NamedTuple


class DenseObs(NamedTuple):
    """Point-major padded observation layout shared by kernel and oracle.

    All arrays are planes-layout (slot rows, padded point axis on lanes).
    Built ONCE per solve (jit-safe: one width-1 scatter); ``pack_rows``
    re-gathers per-obs values into the dense layout once per LM iteration,
    buying scatter-free CG iterations.
    """

    camp: jax.Array   # (tp, Pp) int32 camera of each slot (pad: in-window
    #                   fill camera, W zero)
    rows: jax.Array   # (tp, Pp) int32 obs row of each slot (pad: O sentinel)
    bases: jax.Array  # (Pp // tile_p,) int32 camera-window base per point
    #                   tile, 128-aligned; every camp in tile t lies in
    #                   [bases[t], bases[t] + cam_window)


def build_dense_obs(pt_id: jax.Array, cam_id: jax.Array, n_pts: int,
                    n_cams: int, tp_cap: int, tile_p: int = 512,
                    cam_window: int | None = None) -> DenseObs:
    """Invert a PT-SORTED obs table into (tp, Pp) point-major slots.

    tp_cap must be a true track-length bound (same contract as
    ``lm.ba_solve(tp_cap=...)``); overflow slots are silently dropped by
    the out-of-range scatter, so callers must size it correctly.

    cam_window: static width of the per-tile camera window the kernel's
    one-hot matmuls run over.  MUST be >= the true max per-tile camera
    span, 128-aligned (``compute_cam_window`` computes it host-side);
    None = full camera axis (always correct, no locality win).  Pad slots
    are filled with the point's first observed camera (nearest preceding
    obs for observation-free points) so they never widen a tile's span.
    """
    O = pt_id.shape[0]
    pp = _round_up(max(n_pts, tile_p), tile_p)
    cp = _round_up(n_cams, 128)
    # slot of each obs within its point segment (pt_id sorted ascending)
    start = jnp.searchsorted(pt_id, jnp.arange(n_pts, dtype=pt_id.dtype))
    slot = jnp.arange(O, dtype=jnp.int32) - start[pt_id].astype(jnp.int32)
    rows = jnp.full((tp_cap, pp), O, jnp.int32)
    rows = rows.at[slot, pt_id].set(jnp.arange(O, dtype=jnp.int32),
                                    mode="drop")
    # pad-slot camera fill: camera of the point's first obs (clip keeps the
    # sorted-order NEIGHBOR for empty points — stays local to the tile)
    fill = cam_id[jnp.clip(start, 0, max(O - 1, 0))].astype(jnp.int32)
    fill = jnp.concatenate(
        [fill, jnp.zeros((pp - n_pts,), jnp.int32) + fill[-1]]) \
        if n_pts < pp else fill[:pp]
    camp = jnp.broadcast_to(fill[None, :], (tp_cap, pp))
    camp = camp.at[slot, pt_id].set(cam_id.astype(jnp.int32), mode="drop")
    n_tiles = pp // tile_p
    if cam_window is None or cam_window >= cp:
        bases = jnp.zeros((n_tiles,), jnp.int32)
    else:
        lo = jnp.min(camp.reshape(tp_cap, n_tiles, tile_p), axis=(0, 2))
        bases = jnp.minimum((lo // 128) * 128, cp - cam_window)
        bases = jnp.maximum(bases, 0).astype(jnp.int32)
    return DenseObs(camp=camp, rows=rows, bases=bases)


def compute_cam_window(pt_id_sorted: np.ndarray, cam_id: np.ndarray,
                       n_pts: int, n_cams: int, tp_cap: int,
                       tile_p: int = 512) -> int:
    """Host-side: smallest valid static ``cam_window`` for this obs table.

    Max over point tiles of (max_cam - 128-aligned min_cam + 1), rounded up
    to 128 and capped at the padded camera count.  Scenes built by
    incremental SfM have strong point-id/camera locality (tracks are
    triangulated as their cameras register), so this is typically ~128-256
    even for hundreds of cameras; adversarially random tables degrade to
    the full axis, which is always correct.
    """
    pt_id_sorted = np.asarray(pt_id_sorted)
    cam_id = np.asarray(cam_id)
    pp = _round_up(max(n_pts, tile_p), tile_p)
    cp = _round_up(n_cams, 128)
    tile_of = pt_id_sorted // tile_p
    n_tiles = pp // tile_p
    lo = np.full(n_tiles, n_cams, np.int64)
    hi = np.zeros(n_tiles, np.int64)
    np.minimum.at(lo, tile_of, cam_id)
    np.maximum.at(hi, tile_of, cam_id)
    seen = lo <= hi
    span = np.where(seen, hi - (lo // 128) * 128 + 1, 1)
    wc = int(_round_up(int(span.max(initial=1)), 128))
    return min(wc, cp)


def pack_rows(dense: DenseObs, vals: jax.Array) -> jax.Array:
    """(O, width) per-obs values -> (tp*width, Pp) planes layout."""
    tp, pp = dense.rows.shape
    width = vals.shape[1]
    v = jnp.concatenate([vals, jnp.zeros((1, width), vals.dtype)], 0)
    g = v[dense.rows.reshape(-1)]                        # (tp*Pp, width)
    g = g.reshape(tp, pp, width)
    return jnp.transpose(g, (0, 2, 1)).reshape(tp * width, pp)


def _split_hi_lo(v: jax.Array):
    hi = v.astype(jnp.bfloat16)
    return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _dot(a, b):
    # precision MUST be explicit: the library-wide default is `highest`
    # (sfmx/__init__.py), which Mosaic rejects for bf16 operands ("Bad lhs
    # type").  DEFAULT is exact here — one-hot entries are exact in bf16
    # and the hi/lo split carries the f32 mantissa.
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _matvec_kernel(bases_ref, camp_ref, w_ref, vinv_ref, x_ref, bias_ref,
                   o_ref, vy_ref, *, tp: int, wc: int):
    """Grid over point tiles; o_ref (8, Cp) accumulates across steps.

    Computes, per point tile:  y = Σ_slots W^T x[camp] + bias;
    vy = V^{-1} y (written to vy_ref rows 0-2); z[cam] += W vy (one-hot
    scatter-accumulated into o_ref).  The bias input makes the same kernel
    serve the CG matvec (bias=0), the Schur rhs b_red (x=0, bias=b_p) and
    back-substitution (x=dx_c, bias=-b_p → vy = -dx_p).

    The one-hot gather/scatter matmuls — the kernel's cost ceiling — run
    over a per-tile CAMERA WINDOW of static width wc (bases_ref holds each
    tile's 128-aligned base): covisibility locality makes real scenes'
    per-tile camera span small, cutting one-hot FLOPs by Cp/wc.  The f32
    hi/lo bf16 split is packed into one M=16 matmul per direction instead
    of two M=8 ones — halves the M-padding waste on the 128-row MXU.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    b = pl.multiple_of(bases_ref[i], 128)   # bases are 128-aligned by build
    tile_p = camp_ref.shape[1]
    xw = x_ref[:, pl.ds(b, wc)]                          # (8, wc)
    x_hi, x_lo = _split_hi_lo(xw)
    x16 = jnp.concatenate([x_hi, x_lo], axis=0)          # (16, wc)
    campb = camp_ref[:] - b                              # window-local ids
    iota_ct = jax.lax.broadcasted_iota(jnp.int32, (wc, tile_p), 0)
    iota_tc = jax.lax.broadcasted_iota(jnp.int32, (tile_p, wc), 1)

    # pass 1: y[k] = sum_j W_j[:, k]^T x[camp_j] + bias[k]  (dense in slots)
    y = [bias_ref[k, :][None, :] for k in range(3)]
    for j in range(tp):
        cj = campb[j, :]
        oh = (iota_ct == cj[None, :]).astype(jnp.bfloat16)          # (wc,TP)
        g16 = _dot(x16, oh)                                         # (16,TP)
        g = g16[:8] + g16[8:]
        for k in range(3):
            acc = y[k]
            for a in range(6):
                w_row = w_ref[j * 18 + a * 3 + k, :][None, :]
                acc = acc + w_row * g[a:a + 1, :]
            y[k] = acc

    # V^{-1} y per point (component-wise 3x3)
    vy = [sum(vinv_ref[k * 3 + l, :][None, :] * y[l] for l in range(3))
          for k in range(3)]
    vy_ref[:] = jnp.concatenate(
        vy + [jnp.zeros((5, tile_p), jnp.float32)], axis=0)

    # pass 2: z[cam] += W_j vy  (one-hot scatter-accumulate on the MXU)
    acc = jnp.zeros((16, wc), jnp.float32)
    for j in range(tp):
        rows = []
        for a in range(6):
            za = sum(w_ref[j * 18 + a * 3 + k, :][None, :] * vy[k]
                     for k in range(3))
            rows.append(za)
        rows.append(jnp.zeros((2, tile_p), jnp.float32))
        z = jnp.concatenate(rows, axis=0)                            # (8,TP)
        z_hi, z_lo = _split_hi_lo(z)
        z16 = jnp.concatenate([z_hi, z_lo], axis=0)                  # (16,TP)
        oht = (iota_tc == campb[j, :][:, None]).astype(jnp.bfloat16)
        acc += _dot(z16, oht)
    o_ref[:, pl.ds(b, wc)] += acc[:8] + acc[8:]


@partial(jax.jit, static_argnames=("tp", "tile_p", "cam_window", "interpret"))
def schur_cross_matvec(Wp: jax.Array, camp: jax.Array, Vinv9: jax.Array,
                       x8: jax.Array, bias3: jax.Array | None = None, *,
                       tp: int, tile_p: int = 512,
                       bases: jax.Array | None = None,
                       cam_window: int | None = None,
                       interpret: bool = False):
    """Fused cross-term pass of the Schur system (see _matvec_kernel).

    Args (planes layout, point axis padded to a tile_p multiple):
      Wp:    (tp*18, Pp) f32 point-major W blocks; pad slots MUST be zero.
      camp:  (tp, Pp) int32 camera of each slot (pad slots: any id whose W
             is zero AND inside the tile's camera window).
      Vinv9: (16, Pp) f32, rows 0-8 = damped inverse point blocks.
      x8:    (8, Cp) f32, rows 0-5 = camera-side input vector.
      bias3: optional (8, Pp) f32, rows 0-2 = point-side bias added to y.
      bases/cam_window: per-tile 128-aligned camera-window bases and the
        static window width (``DenseObs.bases`` / ``compute_cam_window``);
        None = full camera axis.
    Returns (z8 (8, Cp), vy8 (8, Pp)): rows 0-5 of z8 = cross term;
    rows 0-2 of vy8 = V^{-1}(Σ W^T x[camp] + bias).
    """
    pp = Wp.shape[1]
    grid = (pp // tile_p,)
    cp = x8.shape[1]
    wc = cp if cam_window is None else min(cam_window, cp)
    if bases is None or wc >= cp:
        wc = cp
        bases = jnp.zeros((pp // tile_p,), jnp.int32)
    kern = partial(_matvec_kernel, tp=tp, wc=wc)
    if bias3 is None:
        bias3 = jnp.zeros((8, pp), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((Wp.shape[0], tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((16, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((8, cp), lambda i, bs: (0, 0)),
            pl.BlockSpec((8, tile_p), lambda i, bs: (0, i)),
        ],
        out_specs=[pl.BlockSpec((8, cp), lambda i, bs: (0, 0)),
                   pl.BlockSpec((8, tile_p), lambda i, bs: (0, i))],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, cp), jnp.float32),
                   jax.ShapeDtypeStruct((8, pp), jnp.float32)],
        interpret=interpret,
    )(bases, camp, Wp, Vinv9, x8, bias3)


def schur_cross_matvec_ref(Wp, camp, Vinv9, x8, bias3=None):
    """Pure-jnp oracle for the kernel (same arguments, same layout)."""
    tp = camp.shape[0]
    pp = Wp.shape[1]
    if bias3 is None:
        bias3 = jnp.zeros((8, pp), jnp.float32)
    y = [bias3[k] for k in range(3)]
    for j in range(tp):
        xg = x8[:, camp[j]]                               # (8, Pp)
        for k in range(3):
            y[k] = y[k] + sum(Wp[j * 18 + a * 3 + k] * xg[a]
                              for a in range(6))
    vy = [sum(Vinv9[k * 3 + l] * y[l] for l in range(3)) for k in range(3)]
    z = jnp.zeros_like(x8)
    for j in range(tp):
        za = jnp.stack([sum(Wp[j * 18 + a * 3 + k] * vy[k] for k in range(3))
                        for a in range(6)]
                       + [jnp.zeros_like(vy[0])] * 2, axis=0)  # (8, Pp)
        z = z.at[:, camp[j]].add(za)
    vy8 = jnp.concatenate([jnp.stack(vy, 0), jnp.zeros((5, pp))], axis=0)
    return z, vy8
