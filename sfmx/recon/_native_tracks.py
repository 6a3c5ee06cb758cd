"""ctypes bindings for the C++ track builder (native/tracks.cpp).

Builds the shared object on demand (the .so is not checked into git);
raises ImportError if no compiler is available — callers fall back to the
numpy implementation.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_SO = Path(__file__).parent / "_sfmx_native.so"
_SRC = Path(__file__).resolve().parents[2] / "native" / "tracks.cpp"
if _SRC.exists() and (
        not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime):
    import subprocess

    try:
        subprocess.run(
            ["g++", "-std=c++17", "-shared", "-fPIC", "-O3", "-DNDEBUG",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120)
    except Exception as e:  # no compiler / failed build -> numpy fallback
        raise ImportError(f"native build failed: {e}") from e
if not _SO.exists():
    raise ImportError(f"{_SO} not built (run: python native/build.py)")

_lib = ctypes.CDLL(str(_SO))
_lib.sfmx_build_tracks.restype = ctypes.c_int64
_lib.sfmx_build_tracks.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int64),
]
_lib.sfmx_covisibility.restype = None
_lib.sfmx_covisibility.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
]


def _ptr(a, ty):
    return a.ctypes.data_as(ctypes.POINTER(ty))


def build_tracks(pair_list, match_idx, match_valid, n_images, max_feats,
                 min_length=2):
    from .tracks import TrackTable

    pair_list = np.ascontiguousarray(pair_list, np.int32)
    match_idx = np.ascontiguousarray(match_idx, np.int32)
    match_valid = np.ascontiguousarray(match_valid, np.uint8)
    n_pairs, K = match_idx.shape
    cap = int(2 * match_valid.sum()) + 16
    out_cam = np.empty(cap, np.int32)
    out_feat = np.empty(cap, np.int32)
    out_track = np.empty(cap, np.int32)
    n_tracks = ctypes.c_int64(0)
    n = _lib.sfmx_build_tracks(
        _ptr(pair_list, ctypes.c_int32), n_pairs,
        _ptr(match_idx, ctypes.c_int32), _ptr(match_valid, ctypes.c_uint8), K,
        n_images, max_feats, min_length,
        _ptr(out_cam, ctypes.c_int32), _ptr(out_feat, ctypes.c_int32),
        _ptr(out_track, ctypes.c_int32), cap, ctypes.byref(n_tracks),
    )
    if n < 0:
        raise RuntimeError("track output capacity exceeded")
    return TrackTable(out_cam[:n].copy(), out_feat[:n].copy(),
                      out_track[:n].copy(), int(n_tracks.value))


def covisibility_counts(tt, n_images: int) -> np.ndarray:
    out = np.zeros((n_images, n_images), np.int32)
    obs_cam = np.ascontiguousarray(tt.obs_cam, np.int32)
    obs_track = np.ascontiguousarray(tt.obs_track, np.int32)
    _lib.sfmx_covisibility(
        _ptr(obs_cam, ctypes.c_int32), _ptr(obs_track, ctypes.c_int32),
        len(obs_cam), n_images, _ptr(out, ctypes.c_int32),
    )
    return out
