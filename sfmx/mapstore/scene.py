"""Columnar scene container — the map format (SURVEY C7).

Capability parity: OpenMVG ``SfM_Data`` (views, intrinsics, poses, landmarks
with observations) serialized via cereal to sfm_data.json/bin.  Here the
scene is a struct-of-arrays pytree with STATIC capacities and alive masks:
it jits, vmaps, shards over a mesh, and serializes to a versioned columnar
store: a directory of raw ``.npy`` files (one per column) plus a JSON
manifest.  Raw .npy columns load with ``np.load(..., mmap_mode="r")``, so a
multi-million-landmark map opens without materializing resident memory —
the serving path touches only the pages it reads (format v2).  Legacy v1
single-file ``.npz`` maps still load.
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scene:
    """Fixed-capacity SfM scene. Shapes: C cams, P points, O observations, I intrinsics."""

    intr: jax.Array       # (I,7) fx fy cx cy k1 k2 k3
    cam_k: jax.Array      # (C,) int32 intrinsics index
    cam_R: jax.Array      # (C,3,3) world->cam
    cam_t: jax.Array      # (C,3)
    cam_alive: jax.Array  # (C,) bool registered cameras
    X: jax.Array          # (P,3) landmarks
    X_alive: jax.Array    # (P,) bool
    obs_cam: jax.Array    # (O,) int32
    obs_pt: jax.Array     # (O,) int32 landmark id
    obs_uv: jax.Array     # (O,2) pixel observations
    obs_alive: jax.Array  # (O,) bool

    @property
    def capacities(self):
        return (self.cam_R.shape[0], self.X.shape[0], self.obs_cam.shape[0])

    def counts(self):
        return (
            int(jnp.sum(self.cam_alive)),
            int(jnp.sum(self.X_alive)),
            int(jnp.sum(self.obs_alive)),
        )

    @property
    def centers(self) -> jax.Array:
        """Camera centers -R^T t, (C,3)."""
        return -jnp.einsum("cji,cj->ci", self.cam_R, self.cam_t)


def new_scene(n_cams: int, n_points: int, n_obs: int, intr: jax.Array,
              cam_k=None) -> Scene:
    I = intr.shape[0]
    if cam_k is None:
        cam_k = jnp.zeros(n_cams, jnp.int32)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n_cams, 3, 3))
    return Scene(
        intr=jnp.asarray(intr, jnp.float32).reshape(I, 7),
        cam_k=jnp.asarray(cam_k, jnp.int32),
        cam_R=eye.copy(),
        cam_t=jnp.zeros((n_cams, 3), jnp.float32),
        cam_alive=jnp.zeros(n_cams, bool),
        X=jnp.zeros((n_points, 3), jnp.float32),
        X_alive=jnp.zeros(n_points, bool),
        obs_cam=jnp.zeros(n_obs, jnp.int32),
        obs_pt=jnp.zeros(n_obs, jnp.int32),
        obs_uv=jnp.zeros((n_obs, 2), jnp.float32),
        obs_alive=jnp.zeros(n_obs, bool),
    )


def save_columns(path: str | Path, cols: dict[str, np.ndarray],
                 manifest: dict):
    """Atomically write a columnar directory: raw ``.npy`` per column + the
    given manifest (temp dir + rename — a crash never leaves a half store).

    Shared by the Scene store, the feature store, and the LocalizationMap
    store; raw .npy columns re-open with ``np.load(..., mmap_mode="r")``.
    """
    path = Path(path)
    manifest = dict(manifest)
    manifest["columns"] = {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                           for k, v in cols.items()}
    tmp = path.with_name(path.name + f".tmp-{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    for k, v in cols.items():
        np.save(tmp / f"{k}.npy", v)
    (tmp / "manifest.json").write_text(json.dumps(manifest, indent=2))
    if path.is_dir():
        shutil.rmtree(path)
    elif path.exists():
        path.unlink()  # legacy v1 single-file store being overwritten
        sidecar = path.with_suffix(path.suffix + ".manifest.json")
        if sidecar.exists():
            sidecar.unlink()
    os.replace(tmp, path)


def load_columns(path: str | Path, *, mmap: bool = True
                 ) -> dict[str, np.ndarray]:
    """Load every column recorded in a columnar directory's manifest,
    mmap'd by default (pages materialize only when touched)."""
    path = Path(path)
    man = load_manifest(path)
    if man is None:
        raise FileNotFoundError(f"no manifest at {path}")
    mode = "r" if mmap else None
    return {k: np.load(path / f"{k}.npy", mmap_mode=mode)
            for k in man["columns"]}


def save_scene(path: str | Path, scene: Scene, extra: dict | None = None):
    """Write the v2 columnar store: ``path/`` with raw .npy columns + manifest.

    Written atomically (temp dir + rename) so a crash mid-save never leaves a
    half-map at ``path``; a legacy v1 ``.npz`` file already at ``path`` is
    replaced.
    """
    cols = {f.name: np.asarray(getattr(scene, f.name)) for f in dataclasses.fields(Scene)}
    manifest = {
        "format_version": FORMAT_VERSION,
        "capacities": {"cams": cols["cam_R"].shape[0], "points": cols["X"].shape[0],
                        "obs": cols["obs_cam"].shape[0], "intr": cols["intr"].shape[0]},
        "extra": extra or {},
    }
    save_columns(path, cols, manifest)


def load_manifest(path: str | Path) -> dict | None:
    path = Path(path)
    man_path = (path / "manifest.json") if path.is_dir() \
        else path.with_suffix(path.suffix + ".manifest.json")
    if man_path.exists():
        return json.loads(man_path.read_text())
    return None


def load_scene_np(path: str | Path, *, mmap: bool = True) -> dict[str, np.ndarray]:
    """Host-side column load. v2 directory maps mmap (zero-copy pages on
    disk, nothing materialized until touched); legacy v1 .npz decompresses.
    """
    path = Path(path)
    man = load_manifest(path)
    if man and man["format_version"] > FORMAT_VERSION:
        raise ValueError(f"scene format {man['format_version']} newer than supported")
    if path.is_dir():
        mode = "r" if mmap else None
        return {f.name: np.load(path / f"{f.name}.npy", mmap_mode=mode)
                for f in dataclasses.fields(Scene)}
    with np.load(path) as z:  # v1 compat: compressed npz, not mmap-able
        return {k: z[k] for k in z.files}


def load_scene(path: str | Path) -> Scene:
    cols = load_scene_np(path, mmap=False)
    return Scene(**{k: jnp.asarray(v) for k, v in cols.items()})
