"""Beacon/image fusion (C10): BLE position prior gates retrieval & arbitrates.

Capability parity: the reference fuses BLE-beacon localization (sibling repo
hulop/blelocpp) with vision — the beacon estimate restricts the map region
searched, and arbitrates when vision fails (SURVEY.md C10, §3.2).

The beacon side itself is out of scope (it lives in the beacon engine); this
module consumes a *prior estimate* (position + uncertainty radius) and:
  1. passes it to ``localize_query`` as a retrieval gate, and
  2. fuses/arbitrates the final output pose.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .localize import LocalizeResult


class BeaconPrior(NamedTuple):
    center: jnp.ndarray   # (3,) world position estimate
    radius: float         # gating radius (uncertainty, meters)
    confidence: float     # 0..1


class FusedResult(NamedTuple):
    center: jnp.ndarray   # (3,) fused position
    R: jnp.ndarray        # (3,3) orientation (vision's; beacons carry none)
    confidence: jnp.ndarray
    source: jnp.ndarray   # 0=vision, 1=beacon, 2=blend


def fuse(vision: LocalizeResult, prior: BeaconPrior | None,
         *, min_vision_conf: float = 0.05) -> FusedResult:
    """Arbitrate/blend vision pose with the beacon prior.

    Rules (mirrors the reference's behavior):
      * no prior -> vision as-is.
      * vision confident -> vision (beacon only sanity-gates retrieval).
      * vision failed (conf ~ 0) -> beacon center, identity-orientation,
        beacon confidence.
      * both weak -> inverse-variance blend of centers.
    """
    if prior is None:
        return FusedResult(vision.center, vision.R, vision.confidence,
                           jnp.asarray(0, jnp.int32))
    v_ok = vision.confidence >= min_vision_conf
    b_conf = jnp.asarray(prior.confidence, jnp.float32)
    # inverse-variance-style weights from confidences
    wv = jnp.where(v_ok, vision.confidence, 0.0)
    wb = b_conf * 0.5  # beacons are coarse; never dominate a confident fix
    denom = jnp.maximum(wv + wb, 1e-6)
    blend = (wv * vision.center + wb * jnp.asarray(prior.center)) / denom
    center = jnp.where(v_ok, blend, jnp.asarray(prior.center))
    conf = jnp.where(v_ok, jnp.maximum(vision.confidence, b_conf), b_conf)
    source = jnp.where(v_ok, jnp.where(wb > 0, 2, 0), 1).astype(jnp.int32)
    return FusedResult(center, vision.R, conf, source)
