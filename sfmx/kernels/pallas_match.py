"""Pallas TPU kernel: tiled brute-force top-2 descriptor matching.

Capability parity: OpenMVG's brute-force matcher (SURVEY C3).  The jnp
matcher materializes the full (Ka,Kb) similarity matrix in HBM before
`top_k` — fine for per-image pairs (512x512), prohibitive for map-scale
retrieval (query features vs 10^5-10^6 landmark descriptors).

This kernel streams B-tiles from HBM through VMEM, keeps the MXU similarity
tile on-chip, and maintains a running (best, second-best, argbest) per query
row in VMEM scratch across the grid — the (Ka,Kb) matrix never exists.
HBM traffic: Ka*D + Kb*D instead of Ka*Kb.  bf16 inputs, f32 accumulation.

Layout note: scores/indices are carried as (TA, 128)-lane-padded scratch so
all merges are full-width VPU ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _match_kernel(a_ref, b_ref, s1_ref, i1_ref, s2_ref,
                  s1_sc, i1_sc, s2_sc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        s1_sc[:] = jnp.full_like(s1_sc, NEG)
        s2_sc[:] = jnp.full_like(s2_sc, NEG)
        i1_sc[:] = jnp.zeros_like(i1_sc)

    # refs ARE bf16: the host casts descriptors before pallas_call (halves
    # the streaming DMA traffic; the MXU dot rounds to bf16 regardless)
    a = a_ref[:]  # (TA, D) bf16
    b = b_ref[:]  # (TB, D) bf16
    # explicit precision: the library default `highest` fails Mosaic for
    # bf16 operands ("Bad lhs type"); DEFAULT = one-pass bf16 MXU matmul
    sim = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)   # (TA, TB)

    TB = sim.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    t1 = jnp.max(sim, axis=1, keepdims=True)                  # tile best
    a1 = jnp.argmax(sim, axis=1)[:, None]                     # tile argbest
    sim2 = jnp.where(col == a1, NEG, sim)
    t2 = jnp.max(sim2, axis=1, keepdims=True)                 # tile second

    g1 = s1_sc[:, :1]
    g2 = s2_sc[:, :1]
    gi = i1_sc[:, :1]
    ti = j * TB + a1

    new_s1 = jnp.maximum(g1, t1)
    new_i1 = jnp.where(t1 > g1, ti, gi)
    # second best = max of the losers
    new_s2 = jnp.maximum(jnp.minimum(g1, t1), jnp.maximum(g2, t2))

    s1_sc[:, :1] = new_s1
    i1_sc[:, :1] = new_i1
    s2_sc[:, :1] = new_s2

    @pl.when(j == nj - 1)
    def _():
        s1_ref[:] = s1_sc[:]
        i1_ref[:] = i1_sc[:]
        s2_ref[:] = s2_sc[:]


@partial(jax.jit, static_argnames=("tile_a", "tile_b", "interpret"))
def match_top2(desc_a: jax.Array, desc_b: jax.Array, *,
               tile_a: int = 256, tile_b: int = 2048, interpret: bool = False):
    """Streaming top-2: returns (s1, i1, s2) each (Ka,).

    desc_a (Ka,D), desc_b (Kb,D); Ka % tile_a == 0 and Kb % tile_b == 0
    (pad with zero rows — zero descriptors score 0 and are masked by the
    caller's validity logic).
    """
    Ka, D = desc_a.shape
    Kb, _ = desc_b.shape
    assert Ka % tile_a == 0 and Kb % tile_b == 0, (Ka, Kb, tile_a, tile_b)
    # bf16 into VMEM: the kernel's MXU dot rounds to bf16 anyway, so the
    # host-side cast is bit-identical and halves the landmark-pool
    # streaming traffic — the kernel's whole cost at 10^5+ landmarks
    a16 = desc_a.astype(jnp.bfloat16)
    b16 = desc_b.astype(jnp.bfloat16)

    grid = (Ka // tile_a, Kb // tile_b)
    out_shape = [
        jax.ShapeDtypeStruct((Ka, 128), jnp.float32),
        jax.ShapeDtypeStruct((Ka, 128), jnp.int32),
        jax.ShapeDtypeStruct((Ka, 128), jnp.float32),
    ]
    s1, i1, s2 = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_a, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_a, 128), jnp.float32),
            pltpu.VMEM((tile_a, 128), jnp.int32),
            pltpu.VMEM((tile_a, 128), jnp.float32),
        ],
        interpret=interpret,
    )(a16, b16)
    return s1[:, 0], i1[:, 0], s2[:, 0]


def match_top2_reference(desc_a: jax.Array, desc_b: jax.Array):
    """jnp oracle (bf16 GEMM like the kernel)."""
    sim = jnp.dot(desc_a.astype(jnp.bfloat16), desc_b.astype(jnp.bfloat16).T,
                  preferred_element_type=jnp.float32)
    v, i = jax.lax.top_k(sim, 2)
    return v[:, 0], i[:, 0], v[:, 1]


def match_float_streaming(desc_a, desc_b, mask_a, mask_b, *, ratio: float = 0.8,
                          tile_a: int = 256, tile_b: int = 2048,
                          interpret: bool = False):
    """Drop-in for matching.match_float on large Kb (no cross-check pass).

    Masked rows are zero descriptors; they score <= 0 against unit vectors
    while real matches score near 1, so the ratio test plus the mask_a guard
    reproduces the dense matcher's accept set for valid rows.
    """
    from .matching import MatchResult
    from ..core.masking import round_up

    Ka, D = desc_a.shape
    Kb, _ = desc_b.shape
    pa = round_up(max(Ka, tile_a), tile_a)
    pb = round_up(max(Kb, tile_b), tile_b)
    a = jnp.where(mask_a[:, None], desc_a, 0.0)
    b = jnp.where(mask_b[:, None], desc_b, 0.0)
    a = jnp.pad(a, ((0, pa - Ka), (0, 0)))
    b = jnp.pad(b, ((0, pb - Kb), (0, 0)))
    s1, i1, s2 = match_top2(a, b, tile_a=tile_a, tile_b=tile_b,
                            interpret=interpret)
    s1, i1, s2 = s1[:Ka], i1[:Ka], s2[:Ka]
    d1 = jnp.maximum(2.0 - 2.0 * s1, 0.0)
    d2 = jnp.maximum(2.0 - 2.0 * s2, 1e-12)
    ok = (d1 < ratio * ratio * d2) & mask_a & (i1 < Kb)
    ok &= jnp.take(mask_b, jnp.clip(i1, 0, Kb - 1))
    return MatchResult(idx=jnp.clip(i1, 0, Kb - 1), valid=ok, score=s1)
