"""Tile-batched Pallas matcher vs the dense jnp oracle (interpret mode).

Same oracle discipline as test_pallas_pairs.py (SURVEY §4.2.3).  The tiled
matcher additionally exercises: host tile packing (band + sparse extras
split between the tiled and per-pair kernels), output-row repacking back
to input pair order, and the int32 score/idx/accept packing.
"""
import numpy as np
import jax.numpy as jnp

from sfmx.kernels import matching
from sfmx.kernels.pallas_tiles import match_pairs_float_tiled, pack_tiles


def _correlated_descs(rng, C, K=128, D=128, noise=0.1):
    base = rng.standard_normal((K, D)).astype(np.float32)
    d = np.stack([base + noise * rng.standard_normal((K, D)).astype(np.float32)
                  for _ in range(C)])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


def _band_pairs(rng, C, w=6, extras=20):
    pairs = {(a, b) for a in range(C) for b in range(a + 1, min(a + 1 + w, C))}
    for _ in range(extras):
        a = int(rng.integers(0, C // 2))
        b = int(rng.integers(C // 2, C))
        pairs.add((min(a, b), max(a, b)))
    return np.array(sorted(pairs), np.int32)


def test_tiled_parity_band_plus_extras(rng):
    C = 24
    d = _correlated_descs(rng, C)
    masks = rng.random(d.shape[:2]) > 0.1
    d = d * masks[:, :, None]
    pairs = _band_pairs(rng, C)

    ref = matching.match_pairs_float(jnp.asarray(d), jnp.asarray(masks),
                                     jnp.asarray(pairs))
    got = match_pairs_float_tiled(jnp.asarray(d), jnp.asarray(masks), pairs,
                                  interpret=True)
    ref_v, got_v = np.asarray(ref.valid), np.asarray(got.valid)
    assert ref_v.sum() > 100  # correlated descriptors produce real accepts
    np.testing.assert_array_equal(ref_v, got_v)
    np.testing.assert_array_equal(np.asarray(ref.idx)[ref_v],
                                  np.asarray(got.idx)[got_v])
    # packed bf16 score round-trips to within bf16 precision
    assert np.allclose(np.asarray(ref.score)[ref_v],
                       np.asarray(got.score)[got_v], atol=2e-2)


def test_tiled_small_c_falls_back(rng):
    # C below the tile size routes everything through the per-pair kernel
    C = 4
    d = _correlated_descs(rng, C)
    masks = np.ones(d.shape[:2], bool)
    pairs = np.asarray([[0, 1], [1, 2], [2, 3]], np.int32)
    ref = matching.match_pairs_float(jnp.asarray(d), jnp.asarray(masks),
                                     jnp.asarray(pairs))
    got = match_pairs_float_tiled(jnp.asarray(d), jnp.asarray(masks), pairs,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))


def test_pack_tiles_structure():
    rng = np.random.default_rng(3)
    C = 40
    pairs = _band_pairs(rng, C, w=9, extras=10)
    meta, pos, dense_idx, rest_idx, n_steps = pack_tiles(pairs, C)
    P = 64
    # every input pair routed exactly once
    assert sorted(list(dense_idx) + list(rest_idx)) == list(range(len(pairs)))
    assert len(pos) == len(dense_idx)
    # each packed pair's slot decodes back to its (a, b)
    meta = meta.reshape(n_steps, 2)
    for j, p in zip(dense_idx, pos):
        step, slot = divmod(int(p), P)
        ai, bj = divmod(slot, 8)
        a_base, b_base = meta[step]
        assert pairs[j, 0] == a_base + ai
        assert pairs[j, 1] == b_base + bj
