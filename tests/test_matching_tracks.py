"""Matcher + track-builder tests with synthetic descriptors."""
import jax
import jax.numpy as jnp
import numpy as np

from sfmx.kernels import matching
from sfmx.recon import tracks

from .synthetic import make_scene


def synth_descriptors(rng, n_points, dim=128):
    d = rng.normal(size=(n_points, dim)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def scene_features(sc, rng, noise=0.05, K=None):
    """Per-camera feature arrays where feature i of cam c observes a landmark.

    Returns (uv (C,K,2), desc (C,K,D), mask (C,K), feat_pt (C,K) landmark id).
    """
    C, P = sc.visible.shape
    K = K or P
    D = 128
    base = synth_descriptors(rng, P, D)
    uv = np.zeros((C, K, 2), np.float32)
    desc = np.zeros((C, K, D), np.float32)
    mask = np.zeros((C, K), bool)
    feat_pt = np.full((C, K), -1, np.int32)
    for c in range(C):
        ids = np.where(sc.visible[c])[0]
        perm = rng.permutation(len(ids))[: K]
        ids = ids[perm]
        n = len(ids)
        uv[c, :n] = sc.uv[c][ids]
        d = base[ids] + noise * rng.normal(size=(n, D)).astype(np.float32)
        desc[c, :n] = d / np.linalg.norm(d, axis=1, keepdims=True)
        mask[c, :n] = True
        feat_pt[c, :n] = ids
    return uv, desc, mask, feat_pt


def test_match_float_finds_correspondences(rng):
    sc = make_scene(n_cams=3, n_points=150)
    uv, desc, mask, feat_pt = scene_features(sc, rng)
    res = matching.match_float(
        jnp.asarray(desc[0]), jnp.asarray(desc[1]),
        jnp.asarray(mask[0]), jnp.asarray(mask[1]),
    )
    idx = np.asarray(res.idx)
    valid = np.asarray(res.valid)
    # every valid match must link features observing the same landmark
    same = feat_pt[0][valid] == feat_pt[1][idx[valid]]
    assert valid.sum() > 50
    assert same.mean() > 0.98


def test_match_pairs_hamming_batched(rng):
    """Batched pair-list Hamming == per-pair match_hamming, and noisy copies
    of the same bit pattern match back to their source."""
    C, K, W = 4, 48, 16
    base = rng.integers(0, 2**32, size=(K, W), dtype=np.uint32)
    bits = np.broadcast_to(base, (C, K, W)).copy()
    for c in range(1, C):  # flip a few bits per descriptor (binary "noise")
        flips = rng.integers(0, 2**32, size=(K, W), dtype=np.uint32)
        flips &= rng.integers(0, 2**32, size=(K, W), dtype=np.uint32)
        flips &= rng.integers(0, 2**32, size=(K, W), dtype=np.uint32)
        flips &= rng.integers(0, 2**32, size=(K, W), dtype=np.uint32)
        bits[c] ^= flips
    mask = np.ones((C, K), bool)
    pairs = np.asarray([[0, 1], [1, 2], [0, 3]], np.int32)
    res = matching.match_pairs_hamming(
        jnp.asarray(bits), jnp.asarray(mask), jnp.asarray(pairs))
    for p, (a, b) in enumerate(pairs):
        one = matching.match_hamming(
            jnp.asarray(bits[a]), jnp.asarray(bits[b]),
            jnp.asarray(mask[a]), jnp.asarray(mask[b]))
        np.testing.assert_array_equal(np.asarray(res.idx[p]), np.asarray(one.idx))
        np.testing.assert_array_equal(np.asarray(res.valid[p]), np.asarray(one.valid))
        v = np.asarray(res.valid[p])
        assert v.sum() > K * 0.8
        assert (np.asarray(res.idx[p])[v] == np.arange(K)[v]).all()


def test_match_hamming_consistency(rng):
    # random binary descriptors: matching a set against itself must be identity
    bits = rng.integers(0, 2**32, size=(64, 16), dtype=np.uint32)
    m = np.ones(64, bool)
    res = matching.match_hamming(
        jnp.asarray(bits), jnp.asarray(bits), jnp.asarray(m), jnp.asarray(m), ratio=0.9
    )
    np.testing.assert_array_equal(np.asarray(res.idx), np.arange(64))
    assert np.all(np.asarray(res.valid))


def test_hamming_distance_oracle(rng):
    a = rng.integers(0, 2**32, size=(8, 4), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(5, 4), dtype=np.uint32)
    d = np.asarray(matching.hamming_distance(jnp.asarray(a), jnp.asarray(b)))
    for i in range(8):
        for j in range(5):
            ref = sum(bin(int(a[i, w]) ^ int(b[j, w])).count("1") for w in range(4))
            assert d[i, j] == ref


def test_build_tracks_merges_and_filters(rng):
    sc = make_scene(n_cams=4, n_points=100)
    uv, desc, mask, feat_pt = scene_features(sc, rng)
    pairs = np.array([(a, b) for a in range(4) for b in range(a + 1, 4)], np.int32)
    res = matching.match_pairs_float(jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pairs))
    tt = tracks.build_tracks(pairs, np.asarray(res.idx), np.asarray(res.valid), 4, desc.shape[1])
    assert tt.n_tracks > 30
    # each track's observations must reference a single ground-truth landmark
    starts, ends = tt.track_slices()
    consistent = 0
    for s, e in zip(starts, ends):
        lms = feat_pt[tt.obs_cam[s:e], tt.obs_feat[s:e]]
        consistent += len(np.unique(lms)) == 1
    assert consistent / tt.n_tracks > 0.97


def test_geometric_verify_rejects_bad_matches(rng):
    sc = make_scene(n_cams=2, n_points=200)
    uv, desc, mask, feat_pt = scene_features(sc, rng)
    from sfmx.core import cameras
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    xn = jax.vmap(lambda u: cameras.pixel_to_normalized(intr, u))(jnp.asarray(uv))
    pairs = np.array([[0, 1]], np.int32)
    res = matching.match_pairs_float(jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pairs))
    # corrupt 30% of matches to random targets
    idx = np.asarray(res.idx).copy()
    valid = np.asarray(res.valid).copy()
    vsel = np.where(valid[0])[0]
    bad = rng.permutation(vsel)[: len(vsel) // 3]
    idx[0, bad] = rng.integers(0, mask[1].sum(), size=len(bad))
    res2 = matching.MatchResult(jnp.asarray(idx), jnp.asarray(valid), res.score)
    inl, cnt = matching.geometric_verify_pairs(
        jax.random.PRNGKey(0), xn, jnp.asarray(mask), jnp.asarray(pairs), res2,
        threshold=(2.0 / 520.0) ** 2,
    )
    inl = np.asarray(inl)[0]
    good_kept = feat_pt[0][inl] == feat_pt[1][idx[0][inl]]
    assert good_kept.mean() > 0.95  # surviving matches are overwhelmingly true
    assert inl[bad].mean() < 0.1    # corrupted ones got rejected


def test_native_tracks_parity(rng):
    """C++ track builder == numpy oracle (canonicalized track sets)."""
    import pytest

    try:
        from sfmx.recon import _native_tracks
    except ImportError:
        pytest.skip("native tracks not built")
    sc = make_scene(n_cams=5, n_points=120)
    uv, desc, mask, feat_pt = scene_features(sc, rng)
    pairs = np.array([(a, b) for a in range(5) for b in range(a + 1, 5)], np.int32)
    res = matching.match_pairs_float(jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pairs))
    idx, valid = np.asarray(res.idx), np.asarray(res.valid)
    K = desc.shape[1]

    # force the numpy fallback for the oracle
    import sfmx.recon.tracks as tm
    import sys
    native_mod = sys.modules.pop("sfmx.recon._native_tracks")
    sys.modules["sfmx.recon._native_tracks"] = None  # make import fail
    try:
        tt_py = tm.build_tracks(pairs, idx, valid, 5, K)
    finally:
        sys.modules["sfmx.recon._native_tracks"] = native_mod

    tt_c = native_mod.build_tracks(pairs, idx, valid, 5, K)

    def canonical(tt):
        starts, ends = tt.track_slices()
        tracks = []
        for s, e in zip(starts, ends):
            tracks.append(tuple(sorted(zip(tt.obs_cam[s:e].tolist(),
                                           tt.obs_feat[s:e].tolist()))))
        return sorted(tracks)

    assert tt_c.n_tracks == tt_py.n_tracks
    assert canonical(tt_c) == canonical(tt_py)

    cov_c = native_mod.covisibility_counts(tt_c, 5)
    from sfmx.recon.tracks import covisibility_counts as cov_py
    np.testing.assert_array_equal(cov_c, cov_py(tt_py, 5))


def test_geometric_verify_multi_pair_and_degenerate(rng):
    """Batched E-RANSAC over several pairs at once (the production shape):
    true matches survive per pair, a fully-corrupted pair scores ~nothing,
    and a pair with <8 valid matches cannot fabricate a winning model."""
    from sfmx.core import cameras

    sc = make_scene(n_cams=5, n_points=200)
    uv, desc, mask, feat_pt = scene_features(sc, rng)
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    xn = jax.vmap(lambda u: cameras.pixel_to_normalized(intr, u))(
        jnp.asarray(uv))
    pairs = np.array([(a, b) for a in range(5) for b in range(a + 1, 5)],
                     np.int32)
    res = matching.match_pairs_float(jnp.asarray(desc), jnp.asarray(mask),
                                     jnp.asarray(pairs))
    idx = np.asarray(res.idx).copy()
    valid = np.asarray(res.valid).copy()
    # pair 3: every match re-pointed at a random target (pure outliers)
    nb1 = int(mask[pairs[3, 1]].sum())
    idx[3] = rng.integers(0, nb1, size=idx.shape[1])
    # pair 7: only 5 valid matches — below the 8-point minimal sample
    keep = np.where(valid[7])[0][:5]
    valid[7] = False
    valid[7, keep] = True
    res2 = matching.MatchResult(jnp.asarray(idx), jnp.asarray(valid),
                                res.score)
    inl, cnt = matching.geometric_verify_pairs(
        jax.random.PRNGKey(1), xn, jnp.asarray(mask), jnp.asarray(pairs),
        res2, threshold=(2.0 / 520.0) ** 2)
    inl = np.asarray(inl)
    cnt = np.asarray(cnt)
    for p in (0, 1, 2, 4, 5, 6, 8, 9):
        a, b = pairs[p]
        good = feat_pt[a][inl[p]] == feat_pt[b][idx[p][inl[p]]]
        assert cnt[p] > 30, (p, cnt[p])
        assert good.mean() > 0.95, (p, good.mean())
    # corrupted pair: only chance consensus survives (each 8-point sample
    # fits its own 8 points exactly, and best-of-256 selection inflates the
    # tail) — far below the real pairs' counts either way
    assert cnt[3] < 32, cnt[3]
    assert cnt[7] <= 5                  # degenerate pair: bounded by valid
