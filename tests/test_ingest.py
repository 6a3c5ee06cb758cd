"""Ingest (C1): directory and video loading, intrinsics initialization."""
import numpy as np
import pytest
from PIL import Image

from sfmx.cli.ingest import (default_intrinsics, iter_decoded_chunks,
                             list_images, load_directory, load_video)


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.random((48, 64)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i:02d}.png")
    (tmp_path / "notes.txt").write_text("ignored")
    return tmp_path


def test_load_directory(image_dir):
    ws = load_directory(image_dir, resize_to=(32, 24))
    assert ws.images.shape == (4, 24, 32)
    assert ws.images.dtype == np.float32
    assert 0.0 <= ws.images.min() and ws.images.max() <= 1.0
    assert ws.intrinsics.shape == (1, 7)
    # default focal = 1.2 * max(w,h)
    assert ws.intrinsics[0, 0] == pytest.approx(1.2 * 32)
    assert len(ws.image_paths) == 4
    assert ws.image_paths == sorted(ws.image_paths)


def test_load_directory_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_directory(tmp_path)


def test_default_intrinsics():
    k = default_intrinsics(640, 480)
    assert k[0] == k[1] == pytest.approx(768.0)
    assert (k[2], k[3]) == (320.0, 240.0)


def test_iter_decoded_chunks_parity(image_dir):
    """Streaming decode yields the same pixels/order as the eager loader."""
    ws = load_directory(image_dir, resize_to=(32, 24))
    chunks = list(iter_decoded_chunks(list_images(image_dir), resize_to=(32, 24),
                                      chunk=3, workers=2, prefetch=1))
    assert [c[0].shape[0] for c in chunks] == [3, 1]  # tail chunk is partial
    streamed = np.concatenate([c[0] for c in chunks])
    np.testing.assert_array_equal(streamed, ws.images)
    np.testing.assert_array_equal(np.concatenate([c[1] for c in chunks]),
                                  ws.orig_sizes)


def test_extract_features_streaming_parity(image_dir):
    """Pipelined decode‖extract matches the eager extract exactly."""
    from sfmx.cli.config import PipelineConfig
    from sfmx.cli.pipeline import extract_features, extract_features_streaming

    cfg = PipelineConfig()
    ws = load_directory(image_dir, resize_to=(32, 24))
    eager = extract_features(ws.images, cfg)
    feats, sizes = extract_features_streaming(
        list_images(image_dir), cfg, chunk=3, resize_to=(32, 24))
    assert feats.desc.shape[0] == 4 and len(sizes) == 4
    np.testing.assert_allclose(np.asarray(feats.desc), np.asarray(eager.desc))
    np.testing.assert_array_equal(np.asarray(feats.kp.mask),
                                  np.asarray(eager.kp.mask))


def test_load_video(tmp_path):
    import cv2

    p = str(tmp_path / "walk.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    rng = np.random.default_rng(1)
    for i in range(25):
        w.write((rng.random((48, 64, 3)) * 255).astype(np.uint8))
    w.release()
    ws = load_video(p, every_n=5, resize_to=(32, 24))
    assert ws.images.shape == (5, 24, 32)
    assert all("#frame" in s for s in ws.image_paths)


def test_corridor_renderer_coverage():
    """Corridor ray-caster: every interior view is fully covered by the
    rectangle set (no background leaks through walls/doorways) and rooms
    carry distinct texture (nonzero variance)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.room import Corridor, corridor_walk_poses, render_corridor

    cor = Corridor(n_rooms=3, seed=2)
    poses = corridor_walk_poses(cor, 6)
    for R, t, eye in poses[::2]:
        img = render_corridor(cor, R, eye, 96, 72, 84.0)
        assert np.isfinite(img).all()
        assert img.std() > 0.05
