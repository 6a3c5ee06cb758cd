"""Typed config tree, overridable from CLI key=value pairs and YAML (§5.6).

Capability parity: the reference's per-tool getopt flags + server JSON
configs, unified: every pipeline stage consumes slices of one dataclass
tree; jitted functions only ever receive hashable/static leaves.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

from ..recon.incremental import ReconConfig


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    extractor: str = "akaze"  # akaze (nonlinear scale space) | sift (DoG)
    max_keypoints: int = 1024
    threshold: float = 1e-7   # det-Hessian threshold; SIFT uses |DoG| (~0.015)
    sigma_levels: tuple = (2, 3, 4, 5, 6)
    oriented: bool = False    # upright default (gravity-aligned indoor rigs)
    n_octaves: int = 2        # 2x-downsampled octaves; >1 widens the scale
    #                           band (reference AKAZE spans 4 octaves).
    #                           2 measured +22% extraction cost on-chip
    #                           (bench_scripts/octave_cost.py) and is the
    #                           production default per the <30% rule; far
    #                           queries at 2.7x map scale need 3
    #                           (tests/test_multioctave_e2e.py)


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    ratio: float = 0.85
    cross_check: bool = True
    pair_mode: str = "exhaustive"   # exhaustive | window | retrieval
    window: int = 8                 # for pair_mode=window (also kept in retrieval)
    retrieval_k: int = 8            # top-k retrieved pairs per image (pair_mode=retrieval)
    geometric_verify: bool = True   # E-RANSAC filter (reference always does)
    gv_px_thresh: float = 4.0       # Sampson threshold in pixels
    gv_hypotheses: int = 256        # RANSAC hypotheses per pair
    gv_min_inliers: int = 16        # drop pairs with fewer geometric inliers
    binary: bool = False            # Hamming on M-LDB bits instead of GEMM
    # float-matching kernel: auto (pallas on TPU) | pallas | dense
    kernel: str = "auto"


@dataclasses.dataclass(frozen=True)
class LocalizeConfig:
    top_k_kf: int = 8
    m_cap: int = 2048
    k_hypotheses: int = 1024
    px_thresh: float = 4.0
    sim_thresh: float = 0.75
    min_inliers: int = 12
    binary: bool = False        # Hamming 2D-3D matching on M-LDB bits
    ham_thresh: float = 120.0   # Hamming acceptance threshold (bits of 486)
    # PnP minimal solver: "dlt6" (6-pt DLT) or "p3p" (Grunert 3-pt, 4
    # candidates/sample — survives low inlier ratios; solvers/p3p.py)
    pnp_solver: str = "dlt6"
    # full-pool Pallas streaming matching (no retrieval gather, no m_cap):
    # "auto" switches on when the map exceeds streaming_min_landmarks
    # (float descriptors only; binary maps keep the gather path)
    streaming: str = "auto"     # off | on | auto
    streaming_min_landmarks: int = 65536


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    features: FeatureConfig = FeatureConfig()
    match: MatchConfig = MatchConfig()
    recon: ReconConfig = ReconConfig()
    localize: LocalizeConfig = LocalizeConfig()
    resize_to: tuple | None = (640, 480)
    focal_factor: float = 1.2


def _set_path(cfg, dotted: str, value: str):
    """Immutable update of cfg.<a.b.c> from a string value."""
    parts = dotted.split(".")
    if len(parts) == 1:
        field = parts[0]
        cur = getattr(cfg, field)
        return dataclasses.replace(cfg, **{field: _coerce(cur, value)})
    sub = getattr(cfg, parts[0])
    return dataclasses.replace(cfg, **{parts[0]: _set_path(sub, ".".join(parts[1:]), value)})


def _coerce(cur, value: str):
    if isinstance(cur, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(cur, int):
        return int(value)
    if isinstance(cur, float):
        return float(value)
    if isinstance(cur, tuple) or (cur is None and "," in value):
        def conv(v):
            v = v.strip()
            if v.isdigit():
                return int(v)
            try:
                return float(v)
            except ValueError:
                return v  # e.g. intrinsics param names ("f", "k1")
        return tuple(conv(v) for v in value.split(","))
    return value


def load_config(yaml_path: str | None = None, overrides: list[str] = ()) -> PipelineConfig:
    cfg = PipelineConfig()
    if yaml_path:
        import yaml

        data = yaml.safe_load(Path(yaml_path).read_text()) or {}

        def apply(cfg, prefix, d):
            for k, v in d.items():
                if isinstance(v, dict):
                    cfg = apply(cfg, f"{prefix}{k}.", v)
                else:
                    cfg = _set_path(cfg, f"{prefix}{k}", str(v))
            return cfg

        cfg = apply(cfg, "", data)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        k, v = ov.split("=", 1)
        cfg = _set_path(cfg, k, v)
    return cfg
