"""Textured-room renderer for end-to-end demos and integration tests.

Ray-casts a box-room interior (6 value-noise textured faces) — the geometry
class the reference targets (indoor walkthroughs, locally planar surfaces).
Pure numpy; fast enough for a handful of QVGA frames.
"""
from __future__ import annotations

import numpy as np

ROOM = np.array([[-5.0, 5.0], [-2.5, 2.5], [-5.0, 5.0]])  # x, y, z extents


class RoomTexture:
    def __init__(self, seed=0, res=96, octaves=4):
        # res is the FINEST grid; on a 10m face seen from ~5m at f=280 a texel
        # is then ~15px on screen — structure detectors can latch onto.
        # Finer grids alias into view-inconsistent noise.
        rng = np.random.default_rng(seed)
        self.grids = [rng.standard_normal((6, res // (2**o) + 2, res // (2**o) + 2))
                      for o in range(octaves)]
        self.res = res
        self.octaves = octaves

    def sample(self, face, u, v):
        """face: (N,) int, u,v in [0,1] -> intensity (N,)."""
        out = np.zeros_like(u)
        for o, g in enumerate(self.grids):
            n = g.shape[1] - 2
            x = u * n
            y = v * n
            x0 = np.clip(x.astype(int), 0, n - 1)
            y0 = np.clip(y.astype(int), 0, n - 1)
            fx = x - x0
            fy = y - y0
            v00 = g[face, y0, x0]
            v01 = g[face, y0, x0 + 1]
            v10 = g[face, y0 + 1, x0]
            v11 = g[face, y0 + 1, x0 + 1]
            # smoothstep for C1 continuity (gives corners, not just ramps)
            fx = fx * fx * (3 - 2 * fx)
            fy = fy * fy * (3 - 2 * fy)
            val = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
                   + v10 * (1 - fx) * fy + v11 * fx * fy)
            out += val * (1.5 ** o)  # coarse octaves dominate (smooth base + detail)
        return out


def look_at(eye, target, up=np.array([0.0, 1.0, 0.0])):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])
    return R, -R @ eye


def render_room(tex: RoomTexture, R, eye, width=320, height=240, focal=280.0):
    """Render the room interior from world-to-cam rotation R, camera center eye."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    xn = (xs - width / 2) / focal
    yn = (ys - height / 2) / focal
    dirs_cam = np.stack([xn, yn, np.ones_like(xn)], -1).reshape(-1, 3)
    dirs = dirs_cam @ R  # R^T @ d
    N = dirs.shape[0]
    best_t = np.full(N, np.inf)
    best_face = np.zeros(N, int)
    best_uv = np.zeros((N, 2))
    face = 0
    for axis in range(3):
        for side in range(2):
            bound = ROOM[axis, side]
            d = dirs[:, axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (bound - eye[axis]) / d
            t = np.where(np.abs(d) < 1e-12, np.inf, t)
            # inf * 0 rays (parallel to the face) are masked below; keep
            # the arithmetic finite so numpy stays quiet
            with np.errstate(invalid="ignore"):
                pt = eye[None, :] + t[:, None] * dirs
            oa = [a for a in range(3) if a != axis]
            inside = (
                (t > 1e-6)
                & (pt[:, oa[0]] >= ROOM[oa[0], 0] - 1e-6) & (pt[:, oa[0]] <= ROOM[oa[0], 1] + 1e-6)
                & (pt[:, oa[1]] >= ROOM[oa[1], 0] - 1e-6) & (pt[:, oa[1]] <= ROOM[oa[1], 1] + 1e-6)
            )
            better = inside & (t < best_t)
            best_t = np.where(better, t, best_t)
            best_face = np.where(better, face, best_face)
            u = (pt[:, oa[0]] - ROOM[oa[0], 0]) / (ROOM[oa[0], 1] - ROOM[oa[0], 0])
            v = (pt[:, oa[1]] - ROOM[oa[1], 0]) / (ROOM[oa[1], 1] - ROOM[oa[1], 0])
            best_uv[better] = np.stack([u, v], -1)[better]
            face += 1
    img = tex.sample(best_face, np.clip(best_uv[:, 0], 0, 1), np.clip(best_uv[:, 1], 0, 1))
    img = img.reshape(height, width)
    img = (img - img.min()) / max(img.max() - img.min(), 1e-9)
    return img.astype(np.float32)


def arc_poses(n, radius=1.5, arc_deg=120.0, target_dist=6.0):
    """Orbit poses (rotation-dominant — useful as a degenerate-geometry case)."""
    poses = []
    for a in np.deg2rad(np.linspace(0, arc_deg, n)):
        eye = np.array([radius * np.sin(a), 0.3 * np.sin(2 * a), radius * np.cos(a) - 2.0])
        target = np.array([target_dist * np.sin(a), 0.0, target_dist * np.cos(a) - 2.0])
        R, t = look_at(eye, target)
        poses.append((R, t, eye))
    return poses


def walk_poses(n, heading_deg=25.0):
    """Walkthrough poses: translate across the room with gentle heading drift.

    Translation-dominant motion (the geometry SfM needs): ~0.5m steps with
    walls 3-8m away gives several degrees of parallax per frame.
    """
    poses = []
    s = np.linspace(0.0, 1.0, n)
    for i, si in enumerate(s):
        eye = np.array([-3.0 + 6.0 * si, 0.2 * np.sin(6 * si), -3.0 + 2.0 * si])
        yaw = np.deg2rad(heading_deg + 20.0 * si)
        d = np.array([np.sin(yaw), 0.12 * np.sin(4 * si), np.cos(yaw)])
        R, t = look_at(eye, eye + 5.0 * d)
        poses.append((R, t, eye))
    return poses
