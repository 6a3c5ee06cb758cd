"""Device mesh construction and sharding helpers (SURVEY §2.3, §5.8).

The framework's parallel axes:
  * ``data`` — batches of images / queries (DP: extraction, matching, serving)
  * ``obs``  — the BA observation table (the domain's long axis: residual,
    Jacobian and Schur-assembly work is embarrassingly parallel over
    observations, with ``psum`` reductions of fixed-size camera/point blocks)

Multi-host bootstrap is `jax.distributed.initialize` + the same mesh over
`jax.devices()`; nothing else changes (XLA collectives ride ICI within a
slice, DCN across hosts).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis: str = "obs", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(n_data: int, n_obs: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    arr = np.asarray(devices[: n_data * n_obs]).reshape(n_data, n_obs)
    return Mesh(arr, ("data", "obs"))


def shard_along(mesh: Mesh, axis_name: str):
    """NamedSharding placing axis 0 of an array along `axis_name`."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(x, m: int, axis: int = 0, fill=0):
    """Pad an array so axis length divides the mesh axis size."""
    n = x.shape[axis]
    r = (-n) % m
    if r == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, r)
    return np.pad(np.asarray(x), pads, constant_values=fill)
