"""CLI surface (C13): build-map → evaluate → localize on rendered images."""
import json
import sys

import numpy as np
import pytest
from PIL import Image

from sfmx.cli.main import main

sys.path.insert(0, "/root/repo")  # examples package
from examples.room import RoomTexture, look_at, render_room, walk_poses  # noqa: E402


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    tex = RoomTexture(seed=3)
    poses = walk_poses(10)
    d_map = tmp_path_factory.mktemp("map_imgs")
    d_q = tmp_path_factory.mktemp("query_imgs")
    for i, (R, t, eye) in enumerate(poses[:8]):
        img = render_room(tex, R, eye, 320, 240, 280.0)
        Image.fromarray((img * 255).astype(np.uint8)).save(d_map / f"f{i:03d}.png")
    # queries: interior poses with small offsets (a tail pose past the map's
    # coverage is unlocalizable by construction)
    for i, si in enumerate((0.35, 0.6)):
        eye = np.array([-3.0 + 6.0 * si + 0.1, 0.2 * np.sin(6 * si) + 0.05,
                        -3.0 + 2.0 * si])
        yaw = np.deg2rad(25.0 + 20.0 * si + 3.0)
        d = np.array([np.sin(yaw), 0.12 * np.sin(4 * si), np.cos(yaw)])
        R, t = look_at(eye, eye + 5.0 * d)
        img = render_room(tex, R, eye, 320, 240, 280.0)
        Image.fromarray((img * 255).astype(np.uint8)).save(d_q / f"q{i:03d}.png")
    return d_map, d_q


def test_cli_build_localize_evaluate(image_dirs, tmp_path, capsys):
    d_map, d_q = image_dirs
    out = tmp_path / "map.npz"
    main([
        "build-map", str(d_map), "-o", str(out),
        "--workdir", str(tmp_path / "work"),
        "-D", "features.max_keypoints=384",
        "-D", "match.ratio=0.85",
        "-D", "resize_to=320,240",
        "-D", "focal_factor=0.875",   # 280/320
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["registered"] >= 7
    assert rec["points"] > 100
    assert out.exists() and (tmp_path / "map.npz.feats.npz").exists()
    # the serving map is persisted at build time (loaded mmap'd by
    # localize/serve — no vocabulary retraining at startup)
    from sfmx.mapstore import has_localization_map
    assert has_localization_map(tmp_path / "map.npz.lmap")

    main(["evaluate", str(out)])
    report = json.loads(capsys.readouterr().out)
    assert report["scene"]["reproj_rmse_px"] < 1.0

    main([
        "localize", str(out), str(d_q),
        "-D", "features.max_keypoints=384",
        "-D", "resize_to=320,240",
        "-D", "focal_factor=0.875",
    ])
    results = json.loads(capsys.readouterr().out)
    assert len(results) == 2
    assert all(r["n_inliers"] >= 12 for r in results)
    assert all(r["confidence"] > 0.2 for r in results)


def test_cli_stage_cache_hits(image_dirs, tmp_path, capsys):
    d_map, _ = image_dirs
    work = tmp_path / "work2"
    args = ["build-map", str(d_map), "-o", str(tmp_path / "m1.npz"),
            "--workdir", str(work), "-D", "features.max_keypoints=256",
            "-D", "resize_to=320,240"]
    main(args)
    capsys.readouterr()
    n_cached = len(list((work / "stages").glob("*.pkl")))
    assert n_cached >= 2  # extract + match stages persisted
    # second run must reuse stage outputs (same key -> no recompute)
    args[3] = str(tmp_path / "m2.npz")
    main(args)
    assert (tmp_path / "m2.npz").exists()


def test_cli_georeference(image_dirs, tmp_path, capsys):
    d_map, _ = image_dirs
    out = tmp_path / "geo.npz"
    main(["build-map", str(d_map), "-o", str(out),
          "-D", "features.max_keypoints=256", "-D", "resize_to=320,240",
          "-D", "focal_factor=0.875"])
    capsys.readouterr()
    # ground-truth world positions of three registered cameras
    from sfmx.mapstore import load_scene
    poses = walk_poses(10)
    scene = load_scene(out)
    alive = np.flatnonzero(np.asarray(scene.cam_alive))[:4]
    ctrl = [[int(c), *poses[int(c)][2].tolist()] for c in alive]
    ctrl_f = tmp_path / "ctrl.json"
    ctrl_f.write_text(json.dumps(ctrl))
    main(["georeference", str(out), str(ctrl_f), "-o", str(tmp_path / "geo2.npz")])
    rec = json.loads(capsys.readouterr().out)
    assert rec["control_rmse"] < 0.1
    # the whole trajectory must now be in world coordinates
    scene2 = load_scene(tmp_path / "geo2.npz")
    centers = np.asarray(scene2.centers)
    gt = np.stack([poses[i][2] for i in range(8)])
    a2 = np.asarray(scene2.cam_alive)
    err = np.linalg.norm(centers[a2] - gt[a2[:8].nonzero()[0]], axis=1)
    assert np.median(err) < 0.15


def test_cli_bundle_unbundle(tmp_path, capsys):
    """Deploy bundle: map artifacts + compile cache roundtrip (r4 item 9)."""
    import os

    m = tmp_path / "mymap"
    m.mkdir()
    (m / "arrays.npz").write_bytes(b"x" * 64)
    (tmp_path / "mymap.feats.npz").write_bytes(b"y" * 64)
    lm = tmp_path / "mymap.lmap"
    lm.mkdir()
    (lm / "vocab.npy").write_bytes(b"z" * 64)
    cache = tmp_path / "jc"
    cache.mkdir()
    (cache / "prog0").write_bytes(b"c" * 64)
    (cache / "prog1").write_bytes(b"c" * 64)

    out = tmp_path / "deploy.tar.gz"
    main(["bundle", str(m), "-o", str(out), "--cache", str(cache)])
    rec = json.loads(capsys.readouterr().out)
    assert rec["map_artifacts"] == 3 and rec["cached_programs"] == 2
    assert out.exists()

    dest = tmp_path / "deployed"
    main(["unbundle", str(out), "-d", str(dest)])
    rec = json.loads(capsys.readouterr().out)
    assert rec["cache"] and os.path.isdir(rec["cache"])
    assert len(os.listdir(rec["cache"])) == 2
    assert len(rec["maps"]) == 1
    mp = rec["maps"][0]
    assert os.path.exists(os.path.join(mp, "arrays.npz"))
    assert os.path.exists(mp + ".feats.npz")
    assert os.path.exists(os.path.join(mp + ".lmap", "vocab.npy"))
