"""Pallas TPU kernels: batched pairwise matching with VMEM-resident tiles.

Capability parity: OpenMVG's pairwise brute-force matcher (SURVEY C3, §3.1
hot loop 2) — this is the map-build matching hot path.

Why: the jnp matcher (`matching.match_pairs_float`) materializes the
(Np, K, K) similarity tensor in HBM — at 512 pairs x 512 x 512 that is
0.5 GB written + re-read by top_k and the cross-check argmax.  Measured on
chip it runs ~0.7% MFU: pure HBM traffic.

`match_pairs_float_pallas` (the production entry, via
``matching.match_pairs_float_auto``) is FULLY fused: G=8 pairs per grid
step fetch their (K,D) descriptor blocks and mask rows by manual async
copies (dictionary gather from HBM-resident inputs), the (K,K) similarity
tile is computed TRANSPOSED on the MXU (candidates on sublanes, queries on
lanes, so the per-query top-2/mutual reductions run along sublanes), and
the ratio test, -inf masking, and gather-free mutual-best cross-check
("cell == row max == column max") all happen in VMEM; the per-pair results
leave in one (G,4,K) f32 block.  Measured on-chip: 13.9k -> 155k pairs/s
vs the dense matcher (each fusion step isolated in BASELINE.md round 3).

`match_pairs_top2` is the raw top-2 kernel variant (no masking/tests),
kept for parity testing and composition.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _pairs_kernel(pairs_ref, a_hbm, bt_hbm, o_ref, a_buf, bt_buf,
                  sem_a, sem_b, *, G: int):
    """G pairs per grid step: the per-pair descriptor blocks are fetched
    with MANUAL async copies (dictionary gather from HBM-resident inputs
    into VMEM scratch) — all 2G DMAs are in flight before the first pair's
    compute, so DMA latency amortizes over G MXU tiles.  All four per-pair
    results go out in ONE (G, 4, K) f32 block (indices < K are exact in
    f32): four separate (1,1,K) output blocks measured ~12 us/pair of
    small-DMA latency, 2.5x the whole compute."""
    i = pl.program_id(0)
    copies = []
    for j in range(G):
        ca = pltpu.make_async_copy(a_hbm.at[pairs_ref[2 * (i * G + j)]],
                                   a_buf.at[j], sem_a.at[j])
        cb = pltpu.make_async_copy(bt_hbm.at[pairs_ref[2 * (i * G + j) + 1]],
                                   bt_buf.at[j], sem_b.at[j])
        ca.start()
        cb.start()
        copies.append((ca, cb))
    for j in range(G):
        ca, cb = copies[j]
        ca.wait()
        cb.wait()
        # refs are f32; cast to bf16 IN-kernel — this Mosaic build rejects
        # matmuls whose operands arrive as bf16 blocks ("Bad lhs type"),
        # but is happy casting f32 VMEM values at the MXU's doorstep.
        a = a_buf[j].astype(jnp.bfloat16)                # (K, D)
        bt = bt_buf[j].astype(jnp.bfloat16)              # (D, K)
        # precision MUST be explicit: the library-wide default is `highest`
        # (sfmx/__init__.py), which Mosaic rejects for bf16 operands.
        sim = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)   # (K, K) VMEM

        col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        a1 = jnp.argmax(sim, axis=1)                     # (K,) best col / row
        s1 = jnp.max(sim, axis=1)
        sim2 = jnp.where(col == a1[:, None], NEG, sim)
        s2 = jnp.max(sim2, axis=1)
        j1 = jnp.argmax(sim, axis=0)                     # (K,) best row / col

        o_ref[j, 0] = s1
        o_ref[j, 1] = a1.astype(jnp.float32)
        o_ref[j, 2] = s2
        o_ref[j, 3] = j1.astype(jnp.float32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("interpret",))
def match_pairs_top2(descs: jax.Array, pairs: jax.Array, *,
                     interpret: bool = False):
    """Per-pair top-2 + column argmax, one MXU tile per pair, G pairs per
    grid step (see _pairs_kernel).

    Args:
      descs: (C, K, D) descriptors, masked rows pre-zeroed.
      pairs: (Np, 2) int32 image indices.

    Returns (s1, i1, s2, j1), each (Np, K).
    """
    C, K, D = descs.shape
    Np = pairs.shape[0]
    G = 8
    npad = _round_up(Np, G)
    if npad != Np:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((npad - Np, 2), pairs.dtype)], axis=0)
    d32 = descs.astype(jnp.float32)
    d32_t = jnp.swapaxes(d32, 1, 2)                      # (C, D, K) for rhs

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # (C, K, D) in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),        # (C, D, K) in HBM
        ],
        out_specs=[pl.BlockSpec((G, 4, K), lambda i, pairs: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((G, K, D), jnp.float32),
            pltpu.VMEM((G, D, K), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    # pairs prefetch is FLAT (2*Np,): a 2-D (Np,2) SMEM operand pads its
    # minor dim to 128 lanes — 64x the memory, overflowing the 1 MB SMEM
    # for thousand-pair lists
    out, = pl.pallas_call(
        partial(_pairs_kernel, G=G), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((npad, 4, K), jnp.float32)],
        interpret=interpret,
    )(pairs.reshape(-1), d32, d32_t)
    out = out[:Np]
    return (out[:, 0], out[:, 1].astype(jnp.int32), out[:, 2],
            out[:, 3].astype(jnp.int32))


def _pairs_fused_kernel(pairs_ref, d_hbm, dt_hbm, ma_hbm, mb_hbm, o_ref,
                        b_buf, at_buf, ma_buf, mb_buf, sem_a, sem_b,
                        sem_ma, sem_mb, *, G: int, ratio: float,
                        cross_check: bool):
    """Fully-fused pairwise matcher: similarity tile + top-2 + ratio test +
    mask handling + mutual-best cross-check, all in VMEM.  The wrapper's
    former take_along_axis postprocessing was (Np,K) ELEMENT gathers in
    XLA — measured: it halved end-to-end pairs/s.  Masked columns are
    NEG'd before the reductions (the dense matcher's -inf convention), so
    winners never land on masked keypoints and the ratio test sees only
    valid competitors.  Mutual-best is computed as "cell == its row max ==
    its column max" — no index gather needed; ties (exact float equality
    of distinct similarities) are astronomically unlikely and the dense
    matcher's tie behavior is arbitrary too."""
    i = pl.program_id(0)
    copies = []
    for j in range(G):
        pa = pairs_ref[2 * (i * G + j)]
        pb = pairs_ref[2 * (i * G + j) + 1]
        cs = (pltpu.make_async_copy(d_hbm.at[pb], b_buf.at[j], sem_a.at[j]),
              pltpu.make_async_copy(dt_hbm.at[pa], at_buf.at[j], sem_b.at[j]),
              pltpu.make_async_copy(ma_hbm.at[pa], ma_buf.at[j], sem_ma.at[j]),
              pltpu.make_async_copy(mb_hbm.at[pb], mb_buf.at[j], sem_mb.at[j]))
        for c in cs:
            c.start()
        copies.append(cs)
    for j in range(G):
        for c in copies[j]:
            c.wait()
        b = b_buf[j]                                     # (K, D) bf16 image b
        at = at_buf[j]                                   # (D, K) bf16 image a
        # TRANSPOSED tile (b on sublanes, a on lanes): every per-a-keypoint
        # reduction (max/argmax/second/mutual) runs along SUBLANES, which
        # the VPU reduces far faster than cross-lane; only the per-b column
        # max for the cross-check pays a lane reduction.
        sim = jnp.dot(b, at, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)   # (Kb, Ka)
        mb = mb_buf[j, 0, :][:, None]                    # (Kb, 1) 0/1 rows
        sim = jnp.where(mb > 0.0, sim, NEG)

        row = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
        a1 = jnp.argmax(sim, axis=0)                     # (Ka,) best b
        s1 = jnp.max(sim, axis=0)
        sim2 = jnp.where(row == a1[None, :], NEG, sim)
        s2 = jnp.max(sim2, axis=0)
        d1 = jnp.maximum(2.0 - 2.0 * s1, 0.0)
        d2 = jnp.maximum(2.0 - 2.0 * s2, 1e-12)
        ok = (d1 < ratio * ratio * d2) & (ma_buf[j, 0, :] > 0.0)
        if cross_check:
            bmax = jnp.max(sim, axis=1)                  # (Kb,) per-b max
            # restrict the mutual test to the WINNING row a1: any() over
            # all rows could accept via a tying cell in a different row
            # while idx still points at a1 (ADVICE r3) — this form is
            # exactly bmax[a1[k]] == s1[k], matching the dense matcher's
            # index-based cross-check
            mutual = jnp.any((row == a1[None, :]) & (sim == bmax[:, None]),
                             axis=0)
            ok &= mutual
        o_ref[j, 0] = s1
        o_ref[j, 1] = a1.astype(jnp.float32)
        o_ref[j, 2] = ok.astype(jnp.float32)
        o_ref[j, 3] = s2


@partial(jax.jit, static_argnames=("ratio", "cross_check", "interpret", "G"))
def match_pairs_float_pallas(descs: jax.Array, masks: jax.Array,
                             pairs: jax.Array, *, ratio: float = 0.8,
                             cross_check: bool = True,
                             interpret: bool | None = None,
                             G: int = 8):
    """Drop-in for matching.match_pairs_float via the fully-fused VMEM-tile
    kernel (no XLA postprocessing at all).

    Score contract matches the dense matcher: raw best similarity over
    VALID columns (-inf convention) for every row; `valid` is the accept
    mask (ratio + masks + mutual-best cross-check)."""
    from .matching import MatchResult

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, K, D = descs.shape
    Np = pairs.shape[0]
    # The pair list is a scalar-prefetch operand and must fit SMEM (1 MB):
    # big pair lists (hundreds of frames x retrieval fan-out) are processed
    # in fixed chunks through ONE compiled kernel via lax.map.
    chunk = min(4096, _round_up(Np, G))
    npad = _round_up(Np, chunk)
    if npad != Np:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((npad - Np, 2), pairs.dtype)], axis=0)
    # bf16 descriptor buffers: the kernel's MXU dot already rounds inputs
    # to bf16, so casting HOST-side is bit-identical — and the kernel is
    # descriptor-DMA-bound, so halving the bytes per pair buys throughput
    d32 = descs.astype(jnp.bfloat16)
    d32_t = jnp.swapaxes(d32, 1, 2)
    # (C, 8, K): mask rows broadcast across a full sublane tile so the
    # per-pair manual DMA slices an aligned (8, K) block, not a 1-row one
    m32 = jnp.broadcast_to(masks.astype(jnp.float32)[:, None, :],
                           (C, 8, K))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec((G, 4, K), lambda i, pairs: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((G, K, D), jnp.bfloat16),
            pltpu.VMEM((G, D, K), jnp.bfloat16),
            pltpu.VMEM((G, 8, K), jnp.float32),
            pltpu.VMEM((G, 8, K), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    call = pl.pallas_call(
        partial(_pairs_fused_kernel, G=G, ratio=ratio,
                cross_check=cross_check),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((chunk, 4, K), jnp.float32)],
        interpret=interpret,
    )
    # flat prefetch: see match_pairs_top2 (2-D SMEM operands pad to 128 lanes)
    if npad == chunk:
        out, = call(pairs.reshape(-1), d32, d32_t, m32, m32)
    else:
        outs = jax.lax.map(
            lambda p: call(p, d32, d32_t, m32, m32)[0],
            pairs.reshape(npad // chunk, chunk * 2))
        out = outs.reshape(npad, 4, K)
    out = out[:Np]
    return MatchResult(idx=out[:, 1].astype(jnp.int32),
                       valid=out[:, 2] > 0.0, score=out[:, 0])
