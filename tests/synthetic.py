"""Synthetic scene generator — the oracle for integration tests (SURVEY §4.2.2).

Generates a random 3D point cloud, a smooth camera trajectory orbiting it,
pinhole intrinsics, and exact (optionally noisy) projections with visibility.
Pure numpy/f64 so tests compare f32 pipeline output against an exact scene.
"""
from __future__ import annotations

import dataclasses

import numpy as np


def look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0.0, 1.0, 0.0])):
    """World-to-camera rotation with +z forward (camera looks at target)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.cross(fwd, np.array([1.0, 0.0, 0.0]))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # rows = camera axes in world frame
    t = -R @ eye
    return R, t


@dataclasses.dataclass
class SyntheticScene:
    points: np.ndarray       # (P,3) world points
    Rs: np.ndarray           # (C,3,3) world-to-camera
    ts: np.ndarray           # (C,3)
    intrinsics: np.ndarray   # (7,) fx fy cx cy k1 k2 k3 (shared)
    width: int
    height: int
    uv: np.ndarray           # (C,P,2) pixel observations
    visible: np.ndarray      # (C,P) bool

    @property
    def centers(self) -> np.ndarray:
        return np.einsum("cij,cj->ci", self.Rs.transpose(0, 2, 1), -self.ts)


def make_scene(
    n_cams: int = 12,
    n_points: int = 300,
    noise_px: float = 0.0,
    k1: float = 0.0,
    seed: int = 0,
    width: int = 640,
    height: int = 480,
    radius: float = 6.0,
    arc_deg: float = 120.0,
) -> SyntheticScene:
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2.0, 2.0, size=(n_points, 3))
    fx = fy = 520.0
    cx, cy = width / 2.0, height / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    intr = np.array([fx, fy, cx, cy, k1, 0.0, 0.0])

    Rs, ts, uvs, vis = [], [], [], []
    angles = np.deg2rad(np.linspace(0.0, arc_deg, n_cams))
    for a in angles:
        eye = np.array([radius * np.sin(a), 0.5 * np.sin(2 * a), -radius * np.cos(a)])
        R, t = look_at(eye, np.zeros(3))
        Xc = pts @ R.T + t
        z = Xc[:, 2]
        xn = Xc[:, :2] / np.maximum(z[:, None], 1e-9)
        r2 = np.sum(xn * xn, axis=1, keepdims=True)
        xd = xn * (1.0 + k1 * r2)
        uv = xd * np.array([fx, fy]) + np.array([cx, cy])
        v = (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < width) & (uv[:, 1] >= 0) & (uv[:, 1] < height)
        if noise_px > 0:
            uv = uv + rng.normal(scale=noise_px, size=uv.shape)
        Rs.append(R)
        ts.append(t)
        uvs.append(uv)
        vis.append(v)

    return SyntheticScene(
        points=pts,
        Rs=np.stack(Rs),
        ts=np.stack(ts),
        intrinsics=intr,
        width=width,
        height=height,
        uv=np.stack(uvs),
        visible=np.stack(vis),
    )
