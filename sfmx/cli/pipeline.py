"""Batch pipeline driver (C13): ingest → extract → match → reconstruct → map.

Capability parity: the reference's end-to-end map-building scripts
(SURVEY §3.1) with content-addressed stage caching for idempotent re-runs
(§5.3 failure recovery: any stage can be killed and re-run; finished stages
are skipped via input-hash keys).
"""
from __future__ import annotations

import hashlib
import json
import pickle
from pathlib import Path

import numpy as np

from ..utils.logging import LOGGER
from .config import PipelineConfig


def _stage_key(name: str, *parts) -> str:
    h = hashlib.sha256()
    h.update(name.encode())
    for p in parts:
        if isinstance(p, np.ndarray):
            h.update(np.ascontiguousarray(p).tobytes())
        else:
            h.update(repr(p).encode())
    return h.hexdigest()[:24]


class StageCache:
    """Content-addressed stage outputs on disk (idempotent pipeline re-runs)."""

    def __init__(self, workdir: str | Path | None):
        self.dir = Path(workdir) / "stages" if workdir else None
        if self.dir:
            self.dir.mkdir(parents=True, exist_ok=True)

    def get_or_run(self, name: str, key: str, fn):
        if self.dir:
            p = self.dir / f"{name}-{key}.pkl"
            if p.exists():
                LOGGER.log(name, cached=True, key=key)
                with open(p, "rb") as f:
                    return pickle.load(f)
        out = fn()
        if self.dir:
            with open(p, "wb") as f:
                pickle.dump(out, f)
        return out


def build_pairs(n_images: int, mode: str, window: int) -> np.ndarray:
    if mode == "exhaustive":
        return np.array([(a, b) for a in range(n_images) for b in range(a + 1, n_images)],
                        np.int32).reshape(-1, 2)
    if mode == "window":
        return np.array([(a, b) for a in range(n_images)
                         for b in range(a + 1, min(a + 1 + window, n_images))],
                        np.int32).reshape(-1, 2)
    raise ValueError(f"unknown pair mode {mode}")


def extract_features(images: np.ndarray, cfg: PipelineConfig):
    """Extractor-selectable (C2 parity: reference offers SIFT or AKAZE)."""
    import jax.numpy as jnp

    from ..kernels import features

    with LOGGER.scope("extract", n_images=len(images),
                      extractor=cfg.features.extractor) as out:
        if cfg.features.extractor == "sift":
            from ..kernels import sift

            thr = cfg.features.threshold
            feats = sift.detect_and_describe_sift(
                jnp.asarray(images, jnp.float32),
                max_keypoints=cfg.features.max_keypoints,
                # the AKAZE det-Hessian default is meaningless for |DoG|
                threshold=(0.015 if thr < 1e-4 else thr),
                oriented=cfg.features.oriented,
            )
        else:
            sscfg = features.ScaleSpaceConfig(
                sigma_levels=tuple(cfg.features.sigma_levels))
            feats = features.detect_and_describe(
                jnp.asarray(images, jnp.float32), sscfg,
                max_keypoints=cfg.features.max_keypoints,
                threshold=cfg.features.threshold,
            )
        out["keypoints"] = int(np.asarray(feats.kp.mask).sum())
    return feats


def match_images(feats, pairs: np.ndarray, cfg: PipelineConfig):
    import jax.numpy as jnp

    from ..kernels import matching

    with LOGGER.scope("match", n_pairs=len(pairs)) as out:
        res = matching.match_pairs_float(
            feats.desc, feats.kp.mask, jnp.asarray(pairs),
            ratio=cfg.match.ratio, cross_check=cfg.match.cross_check,
        )
        out["matches"] = int(np.asarray(res.valid).sum())
    return res


def build_map(images: np.ndarray, intrinsics: np.ndarray, cam_k: np.ndarray,
              cfg: PipelineConfig, workdir=None):
    """Full map build; returns (scene, feats, track_table, stats)."""
    from ..recon import tracks as tracks_mod
    from ..recon.incremental import reconstruct

    cache = StageCache(workdir)
    feats = cache.get_or_run(
        "extract", _stage_key("extract", images, cfg.features), lambda: extract_features(images, cfg)
    )
    pairs = build_pairs(len(images), cfg.match.pair_mode, cfg.match.window)
    res = cache.get_or_run(
        "match", _stage_key("match", images, cfg.features, cfg.match),
        lambda: match_images(feats, pairs, cfg),
    )
    with LOGGER.scope("tracks") as out:
        tt = tracks_mod.build_tracks(
            pairs, np.asarray(res.idx), np.asarray(res.valid),
            len(images), cfg.features.max_keypoints,
        )
        out["tracks"] = tt.n_tracks
    with LOGGER.scope("reconstruct") as out:
        scene, stats = reconstruct(
            np.asarray(feats.kp.uv), np.asarray(feats.kp.mask), tt,
            np.asarray(intrinsics, np.float32), np.asarray(cam_k, np.int32), cfg.recon,
        )
        out.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})
    return scene, feats, tt, stats
