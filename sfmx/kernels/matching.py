"""Descriptor matching: GEMM / Hamming brute-force + Lowe ratio + cross-check.

Capability parity: OpenMVG's brute-force matcher with ratio test and the
pairwise geometric (E/F RANSAC) filter (SURVEY.md C3, §3.1 hot loop 2).

TPU design: a match of image A vs B is one (K,D)x(D,K) MXU GEMM (float
descriptors, cosine similarity == negative squared L2 for unit vectors) or an
XOR+popcount reduction (binary M-LDB words); top-2 + ratio + mutual-best are
vectorized masks.  All-pairs matching is a vmap over a static pair list —
the jnp reference implementation here is the parity oracle for the tiled
Pallas kernel in ``pallas_match.py``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.masking import NEG_INF


class MatchResult(NamedTuple):
    idx: jax.Array    # (Ka,) best match index into B
    valid: jax.Array  # (Ka,) bool passed ratio + cross-check + masks
    score: jax.Array  # (Ka,) similarity of best match


def _top2(sim: jax.Array):
    """Best and second-best along last axis."""
    v, i = jax.lax.top_k(sim, 2)
    return v[..., 0], i[..., 0], v[..., 1]


def match_similarity(sim: jax.Array, mask_a: jax.Array, mask_b: jax.Array,
                     ratio: float, cross_check: bool = True) -> MatchResult:
    """Ratio + mutual-best filtering given a (Ka,Kb) similarity matrix.

    ``ratio`` is applied in distance domain for unit float descriptors:
    d^2 = 2 - 2 s, accept if d1^2 < ratio^2 * d2^2.
    """
    sim = jnp.where(mask_a[:, None] & mask_b[None, :], sim, NEG_INF)
    s1, i1, s2 = _top2(sim)
    d1 = jnp.maximum(2.0 - 2.0 * s1, 0.0)
    d2 = jnp.maximum(2.0 - 2.0 * s2, 1e-12)
    ok = (d1 < ratio * ratio * d2) & (s1 > NEG_INF / 2)
    if cross_check:
        j1 = jnp.argmax(sim, axis=0)  # best A for each B
        ok &= j1[i1] == jnp.arange(sim.shape[0])
    return MatchResult(idx=i1, valid=ok & mask_a, score=s1)


def match_float(desc_a: jax.Array, desc_b: jax.Array, mask_a: jax.Array,
                mask_b: jax.Array, *, ratio: float = 0.8,
                cross_check: bool = True) -> MatchResult:
    """Brute-force match of unit-norm float descriptors (one MXU GEMM).

    Descriptor similarity tolerates low precision — explicitly run the GEMM
    in bf16 for full MXU throughput (the library default is highest-precision
    matmuls for geometry; see sfmx/__init__.py).
    """
    sim = jnp.dot(
        desc_a.astype(jnp.bfloat16), desc_b.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return match_similarity(sim, mask_a, mask_b, ratio, cross_check)


def hamming_distance(bits_a: jax.Array, bits_b: jax.Array) -> jax.Array:
    """(Ka,W) x (Kb,W) uint32 -> (Ka,Kb) int32 Hamming distances."""
    x = jnp.bitwise_xor(bits_a[:, None, :], bits_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def match_hamming(bits_a: jax.Array, bits_b: jax.Array, mask_a: jax.Array,
                  mask_b: jax.Array, *, ratio: float = 0.8, n_bits: int = 486,
                  cross_check: bool = True) -> MatchResult:
    """Brute-force Hamming match of packed binary descriptors."""
    d = hamming_distance(bits_a, bits_b).astype(jnp.float32)
    sim = -d  # similarity ordering
    sim = jnp.where(mask_a[:, None] & mask_b[None, :], sim, NEG_INF)
    s1, i1, s2 = _top2(sim)
    d1, d2 = -s1, jnp.maximum(-s2, 1e-6)
    ok = (d1 < ratio * d2) & (s1 > NEG_INF / 2)
    if cross_check:
        j1 = jnp.argmax(sim, axis=0)
        ok &= j1[i1] == jnp.arange(sim.shape[0])
    return MatchResult(idx=i1, valid=ok & mask_a, score=s1)


# Batched over a pair list: descs (C,K,D), pairs (Np,2) int32.
@partial(jax.jit, static_argnames=("ratio", "cross_check"))
def match_pairs_float(descs: jax.Array, masks: jax.Array, pairs: jax.Array, *,
                      ratio: float = 0.8, cross_check: bool = True) -> MatchResult:
    def one(pair):
        a, b = pair[0], pair[1]
        return match_float(descs[a], descs[b], masks[a], masks[b],
                           ratio=ratio, cross_check=cross_check)

    return jax.vmap(one)(pairs)  # fields have leading (Np,) axis


def match_pairs_float_auto(descs: jax.Array, masks: jax.Array,
                           pairs: jax.Array, *, ratio: float = 0.8,
                           cross_check: bool = True,
                           kernel: str = "auto") -> MatchResult:
    """Backend-dispatched pairwise matching (the production entry).

    kernel="pallas" forces the per-pair VMEM-tile kernel (pallas_pairs.py —
    one MXU tile per pair, no HBM (Np,K,K) tensor), "tiles" the
    tile-batched kernel (pallas_tiles.py — descriptor blocks DMA'd once per
    (A-tile, B-tile) and shared by all pairs inside), "dense" the jnp
    oracle; "auto" picks pallas on TPU when shapes are tile-aligned.

    The tiled kernel is OPT-IN, not auto: despite moving 8x fewer
    descriptor bytes per pair, it measures ~83k pairs/s vs the per-pair
    kernel's ~263k on this chip — its fori_loop pair bodies run ~7 us
    each where the per-pair kernel's 8-way unrolled bodies run ~2.5 us
    (Mosaic pipelines unrolled bodies across the MXU/VPU but serializes
    loop iterations), and unrolling inside the tile blows the 16 MB VMEM
    stack (measured 30 MB at 64 bodies).  On a backend where loop bodies
    pipeline, the DMA economics favor tiles; keep both.
    """
    K, D = descs.shape[1], descs.shape[2]
    aligned = K % 8 == 0 and D % 128 == 0
    # VMEM budget: the fused kernel (pallas_pairs.py) holds G=8 pairs of
    # (K,D) f32 descriptor buffers + (8,K) mask rows in scratch, plus one
    # (K,K) f32 similarity tile and its bf16 temporaries.  Bound the
    # footprint well under the ~16 MB/core VMEM so auto never hands Mosaic
    # an uncompilable tile (e.g. K=4096 -> 64 MB sim tile).
    G = 8
    vmem_bytes = (2 * G * K * D * 4 + 2 * G * 8 * K * 4
                  + 4 * K * K + 2 * K * K + 4 * K * D)
    fits_vmem = vmem_bytes <= 12 * 1024 * 1024
    on_tpu = jax.default_backend() == "tpu"
    if kernel == "tiles":
        from .pallas_tiles import match_pairs_float_tiled

        return match_pairs_float_tiled(descs, masks, pairs, ratio=ratio,
                                       cross_check=cross_check)
    use_pallas = kernel == "pallas" or (
        kernel == "auto" and aligned and fits_vmem and on_tpu)
    if use_pallas:
        from .pallas_pairs import match_pairs_float_pallas

        return match_pairs_float_pallas(descs, masks, pairs, ratio=ratio,
                                        cross_check=cross_check)
    return match_pairs_float(descs, masks, pairs, ratio=ratio,
                             cross_check=cross_check)


@partial(jax.jit, static_argnames=("ratio", "cross_check"))
def match_pairs_hamming(bits: jax.Array, masks: jax.Array, pairs: jax.Array, *,
                        ratio: float = 0.8, cross_check: bool = True) -> MatchResult:
    """Batched Hamming matching over a pair list: bits (C,K,W) uint32.

    The binary analog of :func:`match_pairs_float` — the reference's primary
    AKAZE path matches binary M-LDB descriptors (SURVEY C2/C3).
    """
    def one(pair):
        a, b = pair[0], pair[1]
        return match_hamming(bits[a], bits[b], masks[a], masks[b],
                             ratio=ratio, cross_check=cross_check)

    return jax.vmap(one)(pairs)


def geometric_verify_pairs(
    key: jax.Array,
    xn: jax.Array,          # (C,K,2) normalized coords for all features
    kp_mask: jax.Array,     # (C,K)
    pairs: jax.Array,       # (Np,2)
    matches: MatchResult,   # batched over pairs; idx (Np,K)
    *,
    threshold: float = 1e-5,
    k_hypotheses: int = 256,
):
    """Essential-matrix RANSAC filter per pair, batched over all pairs at once.

    Returns (inlier_mask (Np,K) bool aligned to matches.idx, inlier_counts).
    Threshold is squared Sampson error in normalized coords
    (~ (px_thresh/f)^2).

    TPU design (VERDICT r3 item 2 — this was the 222 s wall at 512 frames):
    all Np*k_hypotheses minimal 8-point systems solve in ONE SVD-free
    component-wise batch (epipolar.eight_point_batch: unrolled 9x9 Cholesky
    + inverse iteration, pure VPU), all hypotheses score in one broadcast
    Sampson pass, and only the Np WINNERS get a weighted least-squares
    refit over their inliers + essential-structure enforcement (Np tiny
    3x3 SVDs instead of Np*H 8x9 + 3x3 ones) and a final re-score.  The
    refit makes the inlier sets match-or-beat the old per-hypothesis-SVD
    path (tested against ground-truth epipolar geometry).
    """
    from ..solvers import epipolar, ransac

    Np, K = matches.idx.shape
    a, b = pairs[:, 0], pairs[:, 1]
    x1 = xn[a]                                            # (Np,K,2)
    x2 = jnp.take_along_axis(xn[b], matches.idx[..., None], axis=1)
    valid = (matches.valid & kp_mask[a]
             & jnp.take_along_axis(kp_mask[b], matches.idx, axis=1))

    keys = jax.random.split(key, Np)
    samp = jax.vmap(
        lambda k, m: ransac.sample_minimal(k, m, k_hypotheses, 8)
    )(keys, valid)                                        # (Np,H,8)
    gather = jax.vmap(lambda xs, si: xs[si])              # (K,2),(H,8)->(H,8,2)
    x1s = gather(x1, samp).reshape(Np * k_hypotheses, 8, 2)
    x2s = gather(x2, samp).reshape(Np * k_hypotheses, 8, 2)
    F = epipolar.eight_point_batch(
        x1s, x2s, jnp.ones(x1s.shape[:2], x1s.dtype))
    F = F.reshape(Np, k_hypotheses, 3, 3)
    # score every hypothesis against every correspondence of its pair
    e = epipolar.sampson_error_batch(F, x1[:, None], x2[:, None])  # (Np,H,K)
    cnt_h = jnp.sum(((e < threshold) & valid[:, None]).astype(jnp.int32),
                    axis=-1)                              # (Np,H)
    best = jnp.argmax(cnt_h, axis=1)                      # (Np,)
    Fb = jnp.take_along_axis(F, best[:, None, None, None], axis=1)[:, 0]
    # enforce essential structure on the raw winner too: an unconstrained F
    # has extra DOF and over-admits matches on degenerate low-parallax /
    # planar pairs, and these counts feed seed ranking and track edges —
    # both candidate inlier sets must satisfy the calibrated model
    Fb = epipolar.enforce_essential_batch(Fb)
    eb = epipolar.sampson_error_batch(Fb, x1, x2)         # (Np,K)
    w_in = ((eb < threshold) & valid).astype(x1.dtype)
    # weighted LS refit on the winner's inliers + essential structure
    Fr = epipolar.eight_point_batch(x1, x2, w_in)
    Er = epipolar.enforce_essential_batch(Fr)
    er = epipolar.sampson_error_batch(Er, x1, x2)
    inl_r = (er < threshold) & valid
    inl_b = (eb < threshold) & valid
    cnt_r = jnp.sum(inl_r.astype(jnp.int32), axis=1)
    cnt_b = jnp.sum(inl_b.astype(jnp.int32), axis=1)
    # keep the refit only where it didn't lose inliers (degenerate refits
    # on near-empty inlier sets can be worse than the raw winner)
    use_r = (cnt_r >= cnt_b)[:, None]
    inliers = jnp.where(use_r, inl_r, inl_b)
    return inliers, jnp.where(use_r[:, 0], cnt_r, cnt_b)
