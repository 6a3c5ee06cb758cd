"""Pallas TPU kernel: tile-batched pairwise matching.

Capability parity: OpenMVG's pairwise brute-force matcher (SURVEY C3, §3.1
hot loop 2) — same contract as `pallas_pairs.match_pairs_float_pallas`.

Why another matcher kernel: the per-pair kernel (`pallas_pairs.py`) DMAs
both descriptor blocks for EVERY pair — 288 KB/pair — and measures flat
~290k pairs/s across G=8/16/32 with cross-check only 8% of the time, i.e.
it is descriptor-DMA bound (BASELINE.md r4 honest accounting put the
balanced DMA/MXU ceiling at ~1.7M pairs/s).  Production pair lists are a
dense temporal BAND (window pairs, `cli/pipeline.py:build_pairs*`) plus a
few retrieval extras, so descriptor blocks are reused by ~window pairs
each.  This kernel exploits that: the grid runs over (A-tile x B-tile)
blocks of image-index space; each step DMAs the tile's Ta+Tb descriptor
blocks ONCE and computes every listed pair inside the tile from VMEM —
~2.3 MB per up-to-64 pairs (Ta=Tb=8) = 36 KB/pair, 8x less HBM traffic.

Sparse tiles would invert the win (a 1-pair tile costs 2.3 MB vs the
per-pair kernel's 0.29 MB), so the auto entry (`matching.py`) routes only
pairs in tiles with fill >= a threshold here and the leftovers through the
per-pair kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _tiles_kernel(meta_ref, d_hbm, dt_hbm, m_hbm, o_hbm,
                  b_buf, at_buf, ma_buf, mb_buf, o_buf, sem_b,
                  sem_a, sem_ma, sem_mb, sem_o, *, Ta: int, Tb: int,
                  P: int, ratio: float, cross_check: bool):
    """One grid step = one (A-tile, B-tile): DMA Ta 'a'-side transposed
    blocks + Tb 'b'-side blocks + their mask rows, then score the tile's
    P = Ta*Tb (ai, bj) combinations from VMEM.  meta layout (flat SMEM):
    per step [a_base, b_base] (presence is resolved host-side — absent
    slots are computed anyway and dropped by the wrapper; band tiles are
    mostly full, so wasted compute is cheaper than predication).

    Output leaves by MANUAL async copy (rotating out-blocks measured
    ~3.2 ms/step on this backend vs 0.1 ms for the whole step's compute)
    and is PACKED into ONE int32 per (pair, query keypoint) to cut output
    bytes 4x: bits [31:11] = the bf16 pattern of the best similarity
    (bitcast, sign bit included — unpack by << 16 then bitcast back),
    bits [10:0] = idx*2 + accept (K <= 1024).  Compute body is the same
    fused tile as pallas_pairs._pairs_fused_kernel (transposed sim,
    sublane reductions, gather-free mutual-best).

    Store alignment: Mosaic requires dim-(-2) stores at multiples of the
    8-sublane tile, so the P-loop runs in groups of 8 (outer fori_loop,
    inner 8 unrolled bodies — the same unroll depth the per-pair kernel
    uses; 64 unrolled bodies measured a 30 MB VMEM stack OOM)."""
    i = pl.program_id(0)
    a_base = meta_ref[2 * i]
    b_base = meta_ref[2 * i + 1]
    copies = []
    for t in range(Ta):
        ca = pltpu.make_async_copy(dt_hbm.at[a_base + t], at_buf.at[t],
                                   sem_a.at[t])
        cm = pltpu.make_async_copy(m_hbm.at[a_base + t], ma_buf.at[t],
                                   sem_ma.at[t])
        ca.start()
        cm.start()
        copies.append(ca)
        copies.append(cm)
    for t in range(Tb):
        cb = pltpu.make_async_copy(d_hbm.at[b_base + t], b_buf.at[t],
                                   sem_b.at[t])
        cm = pltpu.make_async_copy(m_hbm.at[b_base + t], mb_buf.at[t],
                                   sem_mb.at[t])
        cb.start()
        cm.start()
        copies.append(cb)
        copies.append(cm)
    for c in copies:
        c.wait()

    def body(p_local, ai, bj):
        b = b_buf[bj]                                    # (K, D) bf16
        at = at_buf[ai]                                  # (D, K) bf16
        sim = jnp.dot(b, at, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)  # (Kb, Ka)
        mb = mb_buf[bj, 0, :][:, None]                   # (Kb, 1) 0/1 rows
        sim = jnp.where(mb > 0.0, sim, NEG)

        row = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
        a1 = jnp.argmax(sim, axis=0)                     # (Ka,) best b
        s1 = jnp.max(sim, axis=0)
        sim2 = jnp.where(row == a1[None, :], NEG, sim)
        s2 = jnp.max(sim2, axis=0)
        d1 = jnp.maximum(2.0 - 2.0 * s1, 0.0)
        d2 = jnp.maximum(2.0 - 2.0 * s2, 1e-12)
        ok = (d1 < ratio * ratio * d2) & (ma_buf[ai, 0, :] > 0.0)
        if cross_check:
            bmax = jnp.max(sim, axis=1)                  # (Kb,) per-b max
            mutual = jnp.any(
                (row == a1[None, :]) & (sim == bmax[:, None]), axis=0)
            ok &= mutual
        s_bits = jax.lax.bitcast_convert_type(
            s1.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
        return (s_bits << 11) | (a1 * 2 + ok.astype(jnp.int32))

    # ONE loop body (not unrolled copies): 64 unrolled bodies measured a
    # 30 MB VMEM stack OOM and even 8-at-a-time measured 5x slower than
    # the plain sequential loop (live (K,K) temporaries don't get their
    # buffers reused across unrolled bodies).  Mosaic only allows
    # dim-(-2) stores at 8-sublane-aligned offsets, so each body's (K,)
    # packed row lands in an (8, K) carry via a sublane-iota select
    # (vreg work, no memory op; dynamic_update_slice is not lowerable)
    # and the carry flushes with one aligned store every 8th iteration.
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, o_buf.shape[-1]), 0)

    def loop_body(p, carry):
        rowv = body(p, p // Tb, p % Tb)
        carry = jnp.where(sub_iota == (p % 8), rowv[None, :], carry)

        @pl.when(p % 8 == 7)
        def _():
            o_buf[pl.ds(pl.multiple_of(p - 7, 8), 8)] = carry

        return carry

    jax.lax.fori_loop(0, P, loop_body,
                      jnp.zeros((8, o_buf.shape[-1]), jnp.int32),
                      unroll=False)
    co = pltpu.make_async_copy(o_buf, o_hbm.at[i], sem_o)
    co.start()
    co.wait()


def pack_tiles(pairs: np.ndarray, n_images: int, *, Ta: int = 8,
               Tb: int = 8, min_fill: int = 8):
    """Host-side tile packing.  Returns
    (meta, pos, dense_idx, rest_idx, n_steps): meta is the flat int32
    prefetch array ([a_base, b_base] per step), dense_idx are original
    pair indices packed into tiles (in packing order), pos[j] is
    dense_idx[j]'s row (step*P + ai*Tb+bj) in the kernel output, rest_idx
    are original indices routed to the per-pair kernel (tiles with
    < min_fill pairs).  The kernel computes every slot of each tile;
    absent slots are simply never read back.

    Tile bases are clamped to n_images - T so edge tiles stay in range
    (local coords shift accordingly); requires n_images >= max(Ta, Tb).
    """
    pairs = np.asarray(pairs)
    P = Ta * Tb
    ta = pairs[:, 0] // Ta
    tb = pairs[:, 1] // Tb
    tile_id = ta * ((n_images + Tb - 1) // Tb) + tb
    order = np.argsort(tile_id, kind="stable")
    tid_sorted = tile_id[order]
    # boundaries of equal-tile runs
    starts = np.flatnonzero(np.r_[True, tid_sorted[1:] != tid_sorted[:-1]])
    ends = np.r_[starts[1:], len(order)]
    counts = ends - starts

    dense_runs = counts >= min_fill
    meta_rows = []
    dense_idx = []
    pos = []
    step = 0
    for s, e, dense in zip(starts, ends, dense_runs):
        if not dense:
            continue
        idx = order[s:e]
        a_base = min((pairs[idx[0], 0] // Ta) * Ta, n_images - Ta)
        b_base = min((pairs[idx[0], 1] // Tb) * Tb, n_images - Tb)
        for j in idx:
            ai = pairs[j, 0] - a_base
            bj = pairs[j, 1] - b_base
            dense_idx.append(j)
            pos.append(step * P + ai * Tb + bj)
        meta_rows.append(np.array([a_base, b_base], np.int32))
        step += 1
    rest_idx = order[np.repeat(~dense_runs, counts)]
    if step == 0:
        return None, None, None, np.asarray(rest_idx, np.int64), 0
    meta = np.concatenate(meta_rows).astype(np.int32)
    return (meta, np.asarray(pos, np.int64), np.asarray(dense_idx, np.int64),
            np.asarray(rest_idx, np.int64), step)


@partial(jax.jit, static_argnames=("n_steps", "P", "Ta", "Tb", "ratio",
                                   "cross_check", "interpret"))
def _tiles_call(meta, d_bf16, dt_bf16, m32, *, n_steps: int, P: int,
                Ta: int, Tb: int, ratio: float, cross_check: bool,
                interpret: bool):
    C, K, D = d_bf16.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((Tb, K, D), jnp.bfloat16),
            pltpu.VMEM((Ta, D, K), jnp.bfloat16),
            pltpu.VMEM((Ta, 8, K), jnp.float32),
            pltpu.VMEM((Tb, 8, K), jnp.float32),
            pltpu.VMEM((P, K), jnp.int32),
            pltpu.SemaphoreType.DMA((Tb,)),
            pltpu.SemaphoreType.DMA((Ta,)),
            pltpu.SemaphoreType.DMA((Ta,)),
            pltpu.SemaphoreType.DMA((Tb,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, = pl.pallas_call(
        partial(_tiles_kernel, Ta=Ta, Tb=Tb, P=P, ratio=ratio,
                cross_check=cross_check),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_steps, P, K), jnp.int32)],
        interpret=interpret,
    )(meta, d_bf16, dt_bf16, m32)
    return out


def match_pairs_float_tiled(descs: jax.Array, masks: jax.Array,
                            pairs, *, ratio: float = 0.8,
                            cross_check: bool = True,
                            interpret: bool | None = None,
                            Ta: int = 8, Tb: int = 8, min_fill: int = 8):
    """Tile-batched pairwise matcher: dense band tiles through
    `_tiles_kernel`, sparse leftovers through the per-pair kernel.  Same
    MatchResult contract as `matching.match_pairs_float` (host reorders
    outputs back to the input pair order)."""
    from .matching import MatchResult
    from .pallas_pairs import match_pairs_float_pallas

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, K, D = descs.shape
    pairs_np = np.asarray(pairs)
    Np = pairs_np.shape[0]
    # K <= 1024: idx*2+accept must fit the packed word's low 11 bits
    if C < max(Ta, Tb) or Np == 0 or K > 1024:
        return match_pairs_float_pallas(
            descs, masks, jnp.asarray(pairs_np), ratio=ratio,
            cross_check=cross_check, interpret=interpret)
    meta, pos, dense_idx, rest_idx, n_steps = pack_tiles(
        pairs_np, C, Ta=Ta, Tb=Tb, min_fill=min_fill)

    d_bf16 = descs.astype(jnp.bfloat16)
    P = Ta * Tb
    idx_j = jnp.zeros((Np, K), jnp.int32)
    valid_j = jnp.zeros((Np, K), bool)
    score_j = jnp.full((Np, K), NEG, jnp.float32)

    if n_steps > 0:
        dt_bf16 = jnp.swapaxes(d_bf16, 1, 2)
        m32 = jnp.broadcast_to(masks.astype(jnp.float32)[:, None, :],
                               (C, 8, K))
        out = _tiles_call(
            jnp.asarray(meta), d_bf16, dt_bf16, m32, n_steps=n_steps, P=P,
            Ta=Ta, Tb=Tb, ratio=ratio, cross_check=cross_check,
            interpret=interpret)
        rows = out.reshape(n_steps * P, K)[jnp.asarray(pos)]  # (Nd, K) i32
        didx = jnp.asarray(dense_idx)
        idx_j = idx_j.at[didx].set((rows & 0x7FF) >> 1)
        valid_j = valid_j.at[didx].set((rows & 1) > 0)
        s_rows = jax.lax.bitcast_convert_type(
            ((rows >> 11) & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
        score_j = score_j.at[didx].set(s_rows.astype(jnp.float32))
    if len(rest_idx) > 0:
        r = match_pairs_float_pallas(
            descs, masks, jnp.asarray(pairs_np[rest_idx]), ratio=ratio,
            cross_check=cross_check, interpret=interpret)
        ridx = jnp.asarray(rest_idx)
        idx_j = idx_j.at[ridx].set(r.idx)
        valid_j = valid_j.at[ridx].set(r.valid)
        score_j = score_j.at[ridx].set(r.score)
    return MatchResult(idx=idx_j, valid=valid_j, score=score_j)
