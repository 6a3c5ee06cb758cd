"""Pallas TPU kernel: batched pairwise matching with VMEM-resident tiles.

Capability parity: OpenMVG's pairwise brute-force matcher (SURVEY C3, §3.1
hot loop 2) — this is the map-build matching hot path.

Why: the jnp matcher (`matching.match_pairs_float`) materializes the
(Np, K, K) similarity tensor in HBM — at 512 pairs x 512 x 512 that is
0.5 GB written + re-read by top_k and the cross-check argmax.  Measured on
chip it runs ~0.6% MFU: pure HBM traffic.  Here the grid runs one image
pair per step, DMA-ing just the two (K, D) descriptor blocks into VMEM
(scalar-prefetched pair indices drive the block index_map — the dictionary
-gather pattern), computing the (K, K) similarity tile on the MXU, and
reducing best/second/col-argmax entirely in VMEM.  HBM traffic per pair
drops from O(K^2) to O(K*D + K): ~30x less.

Masking convention (same trade-off as pallas_match.py): invalid rows are
zeroed, not -inf'd — a zero column can only displace the true second-best
downward (making the ratio test conservative), and invalid winners are
rejected by the caller's mask_b gather.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _pairs_kernel(pairs_ref, a_ref, bt_ref, s1_ref, i1_ref, s2_ref, j1_ref):
    # refs are f32; cast to bf16 IN-kernel — this Mosaic build rejects
    # matmuls whose operands were DMA'd in as bf16 blocks ("Bad lhs type"),
    # but is happy casting f32 VMEM values at the MXU's doorstep
    a = a_ref[0].astype(jnp.bfloat16)                    # (K, D)
    bt = bt_ref[0].astype(jnp.bfloat16)                  # (D, K)
    # precision MUST be explicit: the library-wide default is `highest`
    # (sfmx/__init__.py), which Mosaic rejects for bf16 operands ("Bad lhs
    # type" at tpu.matmul).  DEFAULT is the plain one-pass bf16 MXU matmul.
    sim = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)   # (K, K) VMEM

    col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    a1 = jnp.argmax(sim, axis=1)                         # (K,) best col / row
    s1 = jnp.max(sim, axis=1)
    sim2 = jnp.where(col == a1[:, None], NEG, sim)
    s2 = jnp.max(sim2, axis=1)
    j1 = jnp.argmax(sim, axis=0)                         # (K,) best row / col

    # outputs are (1, 1, K) blocks: a (1, K) block would violate the TPU
    # (8, 128) min-tile rule on the sublane axis
    s1_ref[0, 0] = s1
    i1_ref[0, 0] = a1
    s2_ref[0, 0] = s2
    j1_ref[0, 0] = j1


@partial(jax.jit, static_argnames=("interpret",))
def match_pairs_top2(descs: jax.Array, pairs: jax.Array, *,
                     interpret: bool = False):
    """Per-pair top-2 + column argmax, one MXU tile per pair.

    Args:
      descs: (C, K, D) descriptors, masked rows pre-zeroed.
      pairs: (Np, 2) int32 image indices.

    Returns (s1, i1, s2, j1), each (Np, K).
    """
    C, K, D = descs.shape
    Np = pairs.shape[0]
    d32 = descs.astype(jnp.float32)
    d32_t = jnp.swapaxes(d32, 1, 2)                      # (C, D, K) for rhs

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda i, pairs: (pairs[i, 0], 0, 0)),
            pl.BlockSpec((1, D, K), lambda i, pairs: (pairs[i, 1], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, K), lambda i, pairs: (i, 0, 0))
            for _ in range(4)
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((Np, 1, K), jnp.float32),
        jax.ShapeDtypeStruct((Np, 1, K), jnp.int32),
        jax.ShapeDtypeStruct((Np, 1, K), jnp.float32),
        jax.ShapeDtypeStruct((Np, 1, K), jnp.int32),
    ]
    outs = pl.pallas_call(
        _pairs_kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(pairs, d32, d32_t)
    return tuple(o[:, 0, :] for o in outs)


def match_pairs_float_pallas(descs: jax.Array, masks: jax.Array,
                             pairs: jax.Array, *, ratio: float = 0.8,
                             cross_check: bool = True,
                             interpret: bool | None = None):
    """Drop-in for matching.match_pairs_float via the VMEM-tile kernel.

    Accept set matches the dense matcher for valid rows up to the zero-mask
    convention (module docstring): the ratio test can only get stricter.
    """
    from .matching import MatchResult

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = jnp.where(masks[..., None], descs, 0.0)
    s1, i1, s2, j1 = match_pairs_top2(d, pairs, interpret=interpret)

    K = descs.shape[1]
    mask_a = masks[pairs[:, 0]]                          # (Np, K)
    mask_b = masks[pairs[:, 1]]
    d1 = jnp.maximum(2.0 - 2.0 * s1, 0.0)
    d2 = jnp.maximum(2.0 - 2.0 * s2, 1e-12)
    ok = (d1 < ratio * ratio * d2) & mask_a
    ok &= jnp.take_along_axis(mask_b, i1, axis=1)
    if cross_check:
        back = jnp.take_along_axis(j1, i1, axis=1)       # (Np, K)
        ok &= back == jnp.arange(K)[None, :]
    # MatchResult contract (matching.MatchResult): score is the raw best
    # similarity for every row, valid is the accept mask — consumers that
    # read score without gating on valid see the same values as the dense
    # matcher.  (Zero-masked rows yield s1=0, same as a dense masked row
    # would only up to the -inf convention; such rows are never valid.)
    return MatchResult(idx=i1, valid=ok, score=s1)
