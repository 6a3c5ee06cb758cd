"""Evaluation tooling (C15): trajectory ATE, per-frame errors, map stats.

Capability parity: the reference's MATLAB/Python evaluation scripts that
compare an estimated trajectory against a reference one (SURVEY.md C15).
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..mapstore.scene import Scene
from ..solvers import umeyama


def evaluate_trajectory(est_centers: np.ndarray, ref_centers: np.ndarray,
                        mask: np.ndarray | None = None, with_scale: bool = True) -> dict:
    """ATE (Umeyama-aligned RMSE) + per-frame error stats."""
    if mask is None:
        mask = np.ones(len(est_centers), bool)
    rmse, (s, R, t) = umeyama.ate_rmse(
        jnp.asarray(est_centers, jnp.float32), jnp.asarray(ref_centers, jnp.float32),
        jnp.asarray(mask), with_scale=with_scale,
    )
    aligned = np.asarray(umeyama.apply_sim3(s, R, t, jnp.asarray(est_centers, jnp.float32)))
    err = np.linalg.norm(aligned - ref_centers, axis=1)[mask]
    return {
        "ate_rmse": float(rmse),
        "ate_mean": float(err.mean()) if len(err) else float("nan"),
        "ate_median": float(np.median(err)) if len(err) else float("nan"),
        "ate_max": float(err.max()) if len(err) else float("nan"),
        "n_frames": int(mask.sum()),
        "scale": float(s),
    }


def scene_stats(scene: Scene) -> dict:
    n_cams, n_pts, n_obs = scene.counts()
    from ..solvers import lm

    w = np.asarray(scene.obs_alive).astype(np.float32)
    rmse = lm.reprojection_rmse(
        scene.intr, scene.cam_k, scene.cam_R, scene.cam_t, scene.X,
        scene.obs_cam, scene.obs_pt, scene.obs_uv, jnp.asarray(w),
    )
    track_len = np.bincount(
        np.asarray(scene.obs_pt)[w > 0], minlength=scene.X.shape[0]
    )
    alive = np.asarray(scene.X_alive)
    return {
        "n_cameras": n_cams,
        "n_points": n_pts,
        "n_observations": n_obs,
        "reproj_rmse_px": float(rmse),
        "mean_track_length": float(track_len[alive].mean()) if alive.any() else 0.0,
    }


def print_report(report: dict):
    print(json.dumps(report, indent=2))
