"""Persisted serving map: the LocalizationMap columnar store.

Capability parity: the reference's server loads one serialized map per map
id ONCE and serves from memory (SURVEY §3.3, C7/C14).  Without this store,
``localize``/``serve`` had to re-derive the serving map — including k-means
VLAD vocabulary training — from the raw per-feature descriptors on every
start; at large map scale that is minutes of host work.  Here ``build-map``
aggregates once and persists the finished LocalizationMap as a columnar
directory of raw ``.npy`` files (same v2 store machinery as the Scene), so
a server start is: mmap the columns, device_put, done — no k-means, no
descriptor pooling, seconds even at 10^6 landmarks.
"""
from __future__ import annotations

from pathlib import Path
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from .scene import load_columns, load_manifest, save_columns

if TYPE_CHECKING:  # import cycle: localize.localize imports mapstore.scene
    from ..localize.localize import LocalizationMap

LMAP_FORMAT_VERSION = 1

_REQUIRED = ("X", "lm_desc", "lm_alive", "kf_gdesc", "kf_alive",
             "kf_centers", "kf_lm", "kf_lm_mask")
_OPTIONAL = ("vocab", "lm_bits")


def save_localization_map(path: str | Path, lmap: "LocalizationMap",
                          extra: dict | None = None):
    """Atomically persist a LocalizationMap as a columnar directory."""
    cols = {k: np.asarray(getattr(lmap, k)) for k in _REQUIRED}
    for k in _OPTIONAL:
        v = getattr(lmap, k)
        if v is not None:
            cols[k] = np.asarray(v)
    manifest = {
        "store": "localization_map",
        "format_version": LMAP_FORMAT_VERSION,
        "counts": {"landmarks": cols["X"].shape[0],
                   "keyframes": cols["kf_gdesc"].shape[0]},
        "extra": extra or {},
    }
    save_columns(path, cols, manifest)


def load_localization_map(path: str | Path, *, mmap: bool = True,
                          device=None) -> "LocalizationMap":
    """Load a persisted LocalizationMap.

    Columns are opened mmap'd (no decompression, no host copies beyond the
    pages actually read) and placed on ``device`` (default backend device).
    NO aggregation or vocabulary training happens here — that is the whole
    point of the store.
    """
    from ..localize.localize import LocalizationMap

    man = load_manifest(path)
    if man is None or man.get("store") != "localization_map":
        raise FileNotFoundError(f"no localization-map store at {path}")
    if man["format_version"] > LMAP_FORMAT_VERSION:
        raise ValueError(
            f"lmap format {man['format_version']} newer than supported")
    cols = load_columns(path, mmap=mmap)
    if device is not None:
        import jax

        as_dev = lambda v: jax.device_put(np.asarray(v), device)
    else:
        as_dev = lambda v: jnp.asarray(np.asarray(v))
    kw = {k: as_dev(cols[k]) for k in _REQUIRED}
    for k in _OPTIONAL:
        kw[k] = as_dev(cols[k]) if k in cols else None
    return LocalizationMap(**kw)


def has_localization_map(path: str | Path) -> bool:
    man = load_manifest(path)
    return man is not None and man.get("store") == "localization_map"
