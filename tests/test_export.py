"""PLY export (cli/export.py): structure, counts, and round-trip parse."""
import numpy as np

from sfmx.cli.export import export_scene_ply, scene_to_ply_arrays, write_ply

from .test_recon_e2e import pipeline_result  # noqa: F401  (fixture reuse)


def _parse_ply(path):
    with open(path, "rb") as f:
        data = f.read()
    head, _, body = data.partition(b"end_header\n")
    lines = head.decode().splitlines()
    assert lines[0] == "ply" and "binary_little_endian" in lines[1]
    nv = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
    ne_lines = [l for l in lines if l.startswith("element edge")]
    ne = int(ne_lines[0].split()[-1]) if ne_lines else 0
    vrec = np.frombuffer(body[:nv * 15],
                         dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    edges = np.frombuffer(body[nv * 15:nv * 15 + ne * 8], "<i4").reshape(ne, 2)
    return vrec, edges


def test_export_scene_ply(tmp_path, pipeline_result):  # noqa: F811
    _, scene, _, _ = pipeline_result
    out = tmp_path / "map.ply"
    summary = export_scene_ply(scene, out)
    vrec, edges = _parse_ply(out)
    n_pts = int(np.asarray(scene.X_alive).sum())
    n_cams = int(np.asarray(scene.cam_alive).sum())
    assert summary["vertices"] == len(vrec) == n_pts + 5 * n_cams
    # frusta: 8 edges per camera + trajectory polyline between cameras
    assert summary["edges"] == len(edges) == 8 * n_cams + (n_cams - 1)
    # all edge indices valid
    assert edges.min() >= 0 and edges.max() < len(vrec)
    # landmark vertices coincide with alive scene points
    X = np.asarray(scene.X)[np.asarray(scene.X_alive)]
    np.testing.assert_allclose(vrec["xyz"][:n_pts], X.astype(np.float32),
                               rtol=1e-6)
    # colors populated (not all one value)
    assert len(np.unique(vrec["rgb"][:n_pts], axis=0)) > 1


def test_write_ply_no_edges(tmp_path):
    v = np.zeros((3, 3), np.float32)
    c = np.full((3, 3), 7, np.uint8)
    p = tmp_path / "pts.ply"
    write_ply(p, v, c, None)
    vrec, edges = _parse_ply(p)
    assert len(vrec) == 3 and len(edges) == 0
