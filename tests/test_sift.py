"""SIFT-family extractor (C2 parity: reference's selectable SIFT path)."""
import numpy as np
import jax.numpy as jnp

from examples.room import RoomTexture, render_room, walk_poses
from sfmx.kernels import matching, sift
from sfmx.cli.config import load_config
from sfmx.cli.pipeline import extract_features


def _views(n=2):
    tex = RoomTexture(seed=3)
    poses = walk_poses(10)  # adjacent frames -> small-baseline pairs
    imgs = np.stack([render_room(tex, R, eye, 320, 240, 280.0)
                     for (R, t, eye) in poses[:n]])
    return imgs


def test_sift_detects_stable_keypoints():
    imgs = _views(1)
    f = sift.detect_and_describe_sift(jnp.asarray(imgs, jnp.float32),
                                      max_keypoints=256)
    n = int(np.asarray(f.kp.mask).sum())
    assert n > 50, f"too few SIFT keypoints: {n}"
    d = np.asarray(f.desc)[np.asarray(f.kp.mask)]
    norms = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert np.isfinite(d).all()


def test_sift_two_view_matching():
    imgs = _views(2)
    f = sift.detect_and_describe_sift(jnp.asarray(imgs, jnp.float32),
                                      max_keypoints=384)
    m = matching.match_float(f.desc[0], f.desc[1],
                             f.kp.mask[0], f.kp.mask[1], ratio=0.9)
    valid = np.asarray(m.valid)
    n = int(valid.sum())
    assert n > 30, f"too few SIFT two-view matches: {n}"
    # matched keypoints should displace coherently (walk is a small motion)
    uv0 = np.asarray(f.kp.uv[0])[valid]
    uv1 = np.asarray(f.kp.uv[1])[np.asarray(m.idx)[valid]]
    disp = uv1 - uv0
    med = np.median(disp, axis=0)
    inl = np.linalg.norm(disp - med, axis=1) < 30.0
    assert inl.mean() > 0.5, f"incoherent SIFT matches ({inl.mean():.2f})"


def test_pipeline_extractor_selection():
    imgs = _views(1)
    cfg = load_config(overrides=["features.extractor=sift",
                                 "features.max_keypoints=256"])
    f = extract_features(imgs.astype(np.float32), cfg)
    assert int(np.asarray(f.kp.mask).sum()) > 30
    cfg2 = load_config(overrides=["features.max_keypoints=256"])
    f2 = extract_features(imgs.astype(np.float32), cfg2)
    assert int(np.asarray(f2.kp.mask).sum()) > 30


def test_sift_full_reconstruction():
    """End-to-end incremental SfM with the SIFT extractor (slowish)."""
    from sfmx.cli.pipeline import build_map

    imgs = _views(6).astype(np.float32)
    cfg = load_config(overrides=[
        "features.extractor=sift", "features.max_keypoints=384",
        "match.ratio=0.9",
    ])
    intr = np.asarray([[280.0, 280.0, 160.0, 120.0, 0, 0, 0]], np.float32)
    cam_k = np.zeros(len(imgs), np.int32)
    scene, feats, tt, stats = build_map(imgs, intr, cam_k, cfg)
    assert stats["n_registered"] >= 5, stats
    assert stats["n_points"] > 50, stats


def test_sift_multi_octave_scale_invariance():
    """SIFT octave path: matching survives a ~4.4x scale change that the
    flat single-octave pyramid cannot bridge (same harness as the AKAZE
    multi-octave test)."""
    from PIL import Image as PILImage

    from sfmx.kernels import features, matching

    rng = np.random.default_rng(5)
    img = rng.random((240, 320)).astype(np.float32)
    img = features.gaussian_blur(jnp.asarray(img)[None], 3.0)[0]
    img = np.asarray((img - img.min()) / (img.max() - img.min() + 1e-9))
    small = np.asarray(PILImage.fromarray(
        (img * 255).astype(np.uint8)).resize((72, 54), PILImage.BILINEAR),
        np.float32) / 255.0
    scale = 320.0 / 72.0
    f1 = sift.detect_and_describe_sift(jnp.asarray(img)[None],
                                       max_keypoints=512, n_octaves=3)
    f2 = sift.detect_and_describe_sift(jnp.asarray(small)[None],
                                       max_keypoints=512)
    d = jnp.concatenate([f1.desc, f2.desc], axis=0)
    m = jnp.concatenate([f1.kp.mask, f2.kp.mask], axis=0)
    res = matching.match_pairs_float(d, m, jnp.asarray([[0, 1]], np.int32))
    idx = np.asarray(res.idx[0])
    val = np.asarray(res.valid[0])
    err = np.linalg.norm(
        np.asarray(f1.kp.uv[0]) / scale - np.asarray(f2.kp.uv[0])[idx],
        axis=1)
    n_good = int((val & (err < 3.0)).sum())
    assert n_good >= 8, n_good
