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
    O = pt_id_sorted.shape[0]
    pp = _round_up(max(n_pts, tile_p), tile_p)
    cp = _round_up(n_cams, 128)
    n_tiles = pp // tile_p
    lo = np.full(n_tiles, n_cams, np.int64)
    hi = np.zeros(n_tiles, np.int64)
    # only DENSE slots (slot < tp_cap) enter the window: overflow slots of
    # long tracks are handled outside the kernel (lm.ba_solve ov_cap) and
    # would otherwise blow the span up to the track's full camera range
    if O:
        seg_start = np.searchsorted(pt_id_sorted, pt_id_sorted)
        slot_of = np.arange(O) - seg_start
        keep = slot_of < tp_cap
        np.minimum.at(lo, pt_id_sorted[keep] // tile_p, cam_id[keep])
        np.maximum.at(hi, pt_id_sorted[keep] // tile_p, cam_id[keep])
    # The window must ALSO cover ``build_dense_obs``'s pad-slot fill cameras
    # (the nearest following obs's camera for observation-free points;
    # points past n_pts reuse the last fill).  A fill outside the window
    # gathers an all-zero camera row in the kernel (fm=0 -> NaN residual the
    # zero weight cannot mask), and a fill BELOW a tile's real span drags
    # ``bases`` down until real observations fall off the window's top.
    if O:
        start = np.searchsorted(pt_id_sorted, np.arange(max(n_pts, 1)))
        fill = cam_id[np.clip(start, 0, O - 1)].astype(np.int64)
        fill_full = np.concatenate(
            [fill, np.full(pp - len(fill), fill[-1], np.int64)])
        tile_pts = np.arange(pp) // tile_p
        np.minimum.at(lo, tile_pts, fill_full)
        np.maximum.at(hi, tile_pts, fill_full)
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


# ---------------------------------------------------------------------------
# Fused BA assembly: residuals + analytic Jacobians + normal blocks, all in
# the dense point-major layout.
#
# Why: the XLA assembly path materializes (O,36)/(O,18)/(O,12) per-obs
# arrays whose minor dims tile to 128 lanes (3.5-14x physical HBM
# inflation), segment-scatters U by camera, and re-gathers W into the dense
# layout every LM iteration (pack_rows).  Here the per-obs inputs (uv,
# validity) are packed into the dense layout ONCE per solve; each LM
# iteration then runs ONE kernel that gathers camera parameters through the
# windowed one-hot (MXU), evaluates the projection model and its analytic
# Jacobians component-wise on the lanes (VPU), writes W directly in the
# (tp*18, Pp) layout the CG matvec consumes, reduces V/b_p/cost densely
# over slots, and scatter-accumulates U/b_c per camera with one M=84
# one-hot matmul per slot.  No narrow HBM access remains anywhere in the
# LM iteration.  (SURVEY §7.2 planned kernel; replaces Ceres' residual/
# Jacobian evaluation + Schur elimination hot loop, SURVEY §3.4.)
# ---------------------------------------------------------------------------


def build_cam_table(intr, k_idx, R, t):
    """(19, Cp) per-camera parameter table: rows 0-8 R flat, 9-11 t,
    12-18 intr[k_idx] (fx fy cx cy k1 k2 k3)."""
    C = R.shape[0]
    cp = _round_up(C, 128)
    tab = jnp.concatenate(
        [R.reshape(C, 9), t, intr[k_idx]], axis=1).T.astype(jnp.float32)
    return jnp.zeros((19, cp), jnp.float32).at[:, :C].set(tab)


def _proj_math(g, x0, x1, x2, u, v):
    """Projection + residual from gathered camera rows g (list of 19
    (1,TP) arrays) and dense point rows; returns residuals and the
    intermediates the Jacobians need.  Mirrors lm._jacobians_planes."""
    fx, fy, cx, cy = g[12], g[13], g[14], g[15]
    k1, k2, k3 = g[16], g[17], g[18]
    fm = 0.5 * (fx + fy)
    s0 = g[0] * x0 + g[1] * x1 + g[2] * x2
    s1 = g[3] * x0 + g[4] * x1 + g[5] * x2
    s2 = g[6] * x0 + g[7] * x1 + g[8] * x2
    xc, yc, zc = s0 + g[9], s1 + g[10], s2 + g[11]
    zs = jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
    iz = 1.0 / zs
    xn, yn = xc * iz, yc * iz
    r2 = xn * xn + yn * yn
    fd = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    fp = k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2)
    ru = (fx * (xn * fd) + cx - u) / fm
    rv = (fy * (yn * fd) + cy - v) / fm
    return ru, rv, (fx, fy, fm, fd, fp, iz, xn, yn, s0, s1, s2)


def _jac_rows(g, aux):
    """Analytic Jacobian rows (each (1,TP)): Ju/Jv (6 each), Pu/Pv (3)."""
    fx, fy, fm, fd, fp, iz, xn, yn, s0, s1, s2 = aux
    gx, gy = fx / fm, fy / fm
    A00 = gx * (fd + 2.0 * xn * xn * fp)
    A01 = gx * (2.0 * xn * yn * fp)
    A10 = gy * (2.0 * xn * yn * fp)
    A11 = gy * (fd + 2.0 * yn * yn * fp)
    B00, B01 = A00 * iz, A01 * iz
    B02 = -(A00 * xn + A01 * yn) * iz
    B10, B11 = A10 * iz, A11 * iz
    B12 = -(A10 * xn + A11 * yn) * iz
    Ju = [-B01 * s2 + B02 * s1, B00 * s2 - B02 * s0, -B00 * s1 + B01 * s0,
          B00, B01, B02]
    Jv = [-B11 * s2 + B12 * s1, B10 * s2 - B12 * s0, -B10 * s1 + B11 * s0,
          B10, B11, B12]
    Pu = [B00 * g[0] + B01 * g[3] + B02 * g[6],
          B00 * g[1] + B01 * g[4] + B02 * g[7],
          B00 * g[2] + B01 * g[5] + B02 * g[8]]
    Pv = [B10 * g[0] + B11 * g[3] + B12 * g[6],
          B10 * g[1] + B11 * g[4] + B12 * g[7],
          B10 * g[2] + B11 * g[5] + B12 * g[8]]
    return Ju, Jv, Pu, Pv


def _huber_rows(ru, rv, delta):
    """(rho, w_huber) from residual rows; delta broadcasts from (1,1)."""
    r2 = ru * ru + rv * rv
    rn = jnp.sqrt(jnp.maximum(r2, 1e-20))
    small = rn <= delta
    rho = jnp.where(small, r2, delta * (2.0 * rn - delta))
    wh = jnp.where(small, 1.0, delta / rn)
    return rho, wh


def _gather_cam(cam_hi, cam_lo, oh, nrows: int):
    """Windowed one-hot gather of the camera table: (nrows, TP)."""
    g2 = _dot(jnp.concatenate([cam_hi, cam_lo], axis=0), oh)
    return g2[:nrows] + g2[nrows:]


def _assemble_kernel(bases_ref, camp_ref, uvw_ref, cam_ref, x_ref, sc_ref,
                     u_ref, v_ref, w_ref, *, tp: int, wc: int):
    """One LM iteration's assembly for one point tile (see module section).

    Outputs: u_ref (96, Cp) rows 0-83 = hi/lo halves of [U 36 | b_c 6]
    scatter-accumulated over tiles; v_ref (16, TP) rows 0-8 = V9, 9-11 =
    b_p, 12 = per-lane robust-cost partial; w_ref (tp*18, TP) = W blocks
    in the CG matvec's layout (pad slots zero via w_valid).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    b = pl.multiple_of(bases_ref[i], 128)
    tile_p = camp_ref.shape[1]
    delta = sc_ref[0:1, 0:1]
    camw = cam_ref[:, pl.ds(b, wc)]                      # (19, wc)
    cam_hi, cam_lo = _split_hi_lo(camw)
    campb = camp_ref[:] - b
    iota_ct = jax.lax.broadcasted_iota(jnp.int32, (wc, tile_p), 0)
    iota_tc = jax.lax.broadcasted_iota(jnp.int32, (tile_p, wc), 1)
    x0 = x_ref[0, :][None, :]
    x1 = x_ref[1, :][None, :]
    x2 = x_ref[2, :][None, :]

    v9 = [jnp.zeros((1, tile_p), jnp.float32) for _ in range(9)]
    bp = [jnp.zeros((1, tile_p), jnp.float32) for _ in range(3)]
    cost = jnp.zeros((1, tile_p), jnp.float32)
    uacc = jnp.zeros((96, wc), jnp.float32)
    for j in range(tp):
        cj = campb[j, :]
        oh = (iota_ct == cj[None, :]).astype(jnp.bfloat16)
        gal = _gather_cam(cam_hi, cam_lo, oh, 19)
        g = [gal[k][None, :] for k in range(19)]
        u = uvw_ref[3 * j, :][None, :]
        v = uvw_ref[3 * j + 1, :][None, :]
        wv = uvw_ref[3 * j + 2, :][None, :]
        ru, rv, aux = _proj_math(g, x0, x1, x2, u, v)
        rho, wh = _huber_rows(ru, rv, delta)
        cost = cost + 0.5 * rho * wv
        wh = wh * wv
        Ju, Jv, Pu, Pv = _jac_rows(g, aux)
        # W blocks straight into the CG layout (row j*18 + a*3 + k)
        for a in range(6):
            for k in range(3):
                w_ref[j * 18 + a * 3 + k, :] = (
                    wh * (Ju[a] * Pu[k] + Jv[a] * Pv[k]))[0]
        # dense point-side reductions
        for k in range(3):
            for l in range(3):
                v9[k * 3 + l] = v9[k * 3 + l] + wh * (
                    Pu[k] * Pu[l] + Pv[k] * Pv[l])
            bp[k] = bp[k] - wh * (Pu[k] * ru + Pv[k] * rv)
        # camera-side scatter: [U 36 | b_c 6] via one M=84 one-hot matmul
        zrows = [wh * (Ju[a] * Ju[c] + Jv[a] * Jv[c])
                 for a in range(6) for c in range(6)]
        zrows += [-wh * (Ju[a] * ru + Jv[a] * rv) for a in range(6)]
        zrows += [jnp.zeros((6, tile_p), jnp.float32)]
        z = jnp.concatenate(zrows, axis=0)                           # (48,TP)
        z_hi, z_lo = _split_hi_lo(z)
        z96 = jnp.concatenate([z_hi, z_lo], axis=0)                  # (96,TP)
        oht = (iota_tc == cj[:, None]).astype(jnp.bfloat16)
        uacc += _dot(z96, oht)
    u_ref[:, pl.ds(b, wc)] += uacc
    v_ref[:] = jnp.concatenate(
        v9 + bp + [cost, jnp.zeros((3, tile_p), jnp.float32)], axis=0)


@partial(jax.jit, static_argnames=("tp", "tile_p", "cam_window", "interpret"))
def ba_assemble_fused(cam19: jax.Array, camp: jax.Array, uvw: jax.Array,
                      x8: jax.Array, delta, *, tp: int, tile_p: int = 512,
                      bases: jax.Array | None = None,
                      cam_window: int | None = None,
                      interpret: bool = False):
    """Fused residual/Jacobian/normal-block assembly (see _assemble_kernel).

    Args:
      cam19: (19, Cp) camera table (build_cam_table).
      camp/bases: dense layout (DenseObs) + window bases.
      uvw: (tp*3, Pp) packed [u, v, w_valid] rows per slot
           (pack_rows(dense, concat([uv, w[:,None]]))), built once per solve.
      x8: (8, Pp) rows 0-2 = points X^T on the lanes.
      delta: Huber threshold (normalized units), traced scalar.
    Returns (u96 (96, Cp), v16 (16, Pp), Wp (tp*18, Pp)); decode U/b_c as
    hi = u96[:48], lo = u96[48:], rows 0-35 U (a*6+b), 36-41 b_c.
    """
    pp = camp.shape[1]
    cp = cam19.shape[1]
    grid = (pp // tile_p,)
    wc = cp if cam_window is None else min(cam_window, cp)
    if bases is None or wc >= cp:
        wc = cp
        bases = jnp.zeros((pp // tile_p,), jnp.int32)
    sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(
        jnp.asarray(delta, jnp.float32))
    kern = partial(_assemble_kernel, tp=tp, wc=wc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((3 * tp, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((19, cp), lambda i, bs: (0, 0)),
            pl.BlockSpec((8, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((8, 128), lambda i, bs: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((96, cp), lambda i, bs: (0, 0)),
                   pl.BlockSpec((16, tile_p), lambda i, bs: (0, i)),
                   pl.BlockSpec((18 * tp, tile_p), lambda i, bs: (0, i))],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((96, cp), jnp.float32),
                   jax.ShapeDtypeStruct((16, pp), jnp.float32),
                   jax.ShapeDtypeStruct((18 * tp, pp), jnp.float32)],
        interpret=interpret,
    )(bases, camp, uvw, cam19, x8, sc)


def _cost_kernel(bases_ref, camp_ref, uvw_ref, cam_ref, x_ref, sc_ref,
                 c_ref, *, tp: int, wc: int, nc: int):
    """Robust cost of nc parameter candidates in one pass over the dense
    obs layout; c_ref (16, TP) row c = candidate c's per-lane partial."""
    b = pl.multiple_of(bases_ref[pl.program_id(0)], 128)
    tile_p = camp_ref.shape[1]
    delta = sc_ref[0:1, 0:1]
    camw = cam_ref[:, pl.ds(b, wc)]                      # (19*nc, wc)
    cam_hi, cam_lo = _split_hi_lo(camw)
    campb = camp_ref[:] - b
    iota_ct = jax.lax.broadcasted_iota(jnp.int32, (wc, tile_p), 0)
    xs = [(x_ref[8 * c + 0, :][None, :], x_ref[8 * c + 1, :][None, :],
           x_ref[8 * c + 2, :][None, :]) for c in range(nc)]
    cost = [jnp.zeros((1, tile_p), jnp.float32) for _ in range(nc)]
    for j in range(tp):
        cj = campb[j, :]
        oh = (iota_ct == cj[None, :]).astype(jnp.bfloat16)
        gall = _gather_cam(cam_hi, cam_lo, oh, 19 * nc)  # (19*nc, TP)
        u = uvw_ref[3 * j, :][None, :]
        v = uvw_ref[3 * j + 1, :][None, :]
        wv = uvw_ref[3 * j + 2, :][None, :]
        for c in range(nc):
            g = [gall[19 * c + k][None, :] for k in range(19)]
            x0, x1, x2 = xs[c]
            ru, rv, _ = _proj_math(g, x0, x1, x2, u, v)
            rho, _ = _huber_rows(ru, rv, delta)
            cost[c] = cost[c] + 0.5 * rho * wv
    c_ref[:] = jnp.concatenate(
        cost + [jnp.zeros((16 - nc, tile_p), jnp.float32)], axis=0)


@partial(jax.jit, static_argnames=("tp", "nc", "tile_p", "cam_window",
                                   "interpret"))
def ba_cost_fused(cam19s: jax.Array, camp: jax.Array, uvw: jax.Array,
                  x8s: jax.Array, delta, *, tp: int, nc: int,
                  tile_p: int = 512, bases: jax.Array | None = None,
                  cam_window: int | None = None, interpret: bool = False):
    """Robust cost of nc candidates (cam19s (19*nc, Cp) stacked tables,
    x8s (8*nc, Pp) stacked point rows).  Returns (nc,) costs."""
    pp = camp.shape[1]
    cp = cam19s.shape[1]
    grid = (pp // tile_p,)
    wc = cp if cam_window is None else min(cam_window, cp)
    if bases is None or wc >= cp:
        wc = cp
        bases = jnp.zeros((pp // tile_p,), jnp.int32)
    sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(
        jnp.asarray(delta, jnp.float32))
    kern = partial(_cost_kernel, tp=tp, wc=wc, nc=nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((3 * tp, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((19 * nc, cp), lambda i, bs: (0, 0)),
            pl.BlockSpec((8 * nc, tile_p), lambda i, bs: (0, i)),
            pl.BlockSpec((8, 128), lambda i, bs: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((16, tile_p), lambda i, bs: (0, i))],
    )
    out, = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((16, pp), jnp.float32)],
        interpret=interpret,
    )(bases, camp, uvw, cam19s, x8s, sc)
    return jnp.sum(out[:nc], axis=1)


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
