"""Columnar scene container — the map format (SURVEY C7).

Capability parity: OpenMVG ``SfM_Data`` (views, intrinsics, poses, landmarks
with observations) serialized via cereal to sfm_data.json/bin.  Here the
scene is a struct-of-arrays pytree with STATIC capacities and alive masks:
it jits, vmaps, shards over a mesh, and serializes to a versioned .npz
(mmap-able via numpy; one array per column).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


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


def save_scene(path: str | Path, scene: Scene, extra: dict | None = None):
    """Versioned columnar .npz + JSON manifest sidecar."""
    path = Path(path)
    cols = {f.name: np.asarray(getattr(scene, f.name)) for f in dataclasses.fields(Scene)}
    np.savez_compressed(path, **cols)
    manifest = {
        "format_version": FORMAT_VERSION,
        "capacities": {"cams": cols["cam_R"].shape[0], "points": cols["X"].shape[0],
                        "obs": cols["obs_cam"].shape[0], "intr": cols["intr"].shape[0]},
        "columns": {k: {"shape": list(v.shape), "dtype": str(v.dtype)} for k, v in cols.items()},
        "extra": extra or {},
    }
    path.with_suffix(path.suffix + ".manifest.json").write_text(json.dumps(manifest, indent=2))


def load_scene(path: str | Path) -> Scene:
    path = Path(path)
    man_path = path.with_suffix(path.suffix + ".manifest.json")
    if man_path.exists():
        man = json.loads(man_path.read_text())
        if man["format_version"] > FORMAT_VERSION:
            raise ValueError(f"scene format {man['format_version']} newer than supported")
    with np.load(path) as z:
        cols = {k: jnp.asarray(z[k]) for k in z.files}
    return Scene(**cols)
