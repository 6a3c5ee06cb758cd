"""Static-capacity + validity-mask utilities.

The whole framework's answer to the reference's dynamic containers
(std::vector of features, match lists, growing SfM scenes) is: fixed-capacity
arrays with boolean ``alive`` masks, so every op stays static-shaped under jit
(SURVEY.md §7.1, §7.4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_top_k(scores: jax.Array, mask: jax.Array, k: int):
    """Top-k over the last axis where only ``mask`` entries are eligible.

    Returns (values, indices); ineligible slots score NEG_INF so if fewer than
    k valid entries exist the tail indices point at masked entries — callers
    must carry the returned validity = values > NEG_INF/2.
    """
    masked = jnp.where(mask, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k)
    return vals, idx, vals > NEG_INF / 2


def masked_argmax(scores: jax.Array, mask: jax.Array, axis: int = -1):
    masked = jnp.where(mask, scores, NEG_INF)
    idx = jnp.argmax(masked, axis=axis)
    val = jnp.max(masked, axis=axis)
    return val, idx, val > NEG_INF / 2


def masked_argmin(scores: jax.Array, mask: jax.Array, axis: int = -1):
    v, i, ok = masked_argmax(-scores, mask, axis=axis)
    return -v, i, ok


def masked_mean(x: jax.Array, mask: jax.Array, axis=None):
    m = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return jnp.sum(x * m, axis=axis) / denom


def pad_axis_to(x: jax.Array, size: int, axis: int = 0, fill=0):
    """Pad (or truncate) one axis to exactly ``size``."""
    n = x.shape[axis]
    if n == size:
        return x
    if n > size:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, size)
        return x[tuple(sl)]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - n)
    return jnp.pad(x, pads, constant_values=fill)


def first_free_slot(alive: jax.Array) -> jax.Array:
    """Index of the first False in a 1-D alive mask (capacity if full)."""
    return jnp.argmin(alive.astype(jnp.int32))  # argmin finds first 0


def count(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask.astype(jnp.int32))


def scatter_set(arr: jax.Array, idx: jax.Array, value, pred=True):
    """arr.at[idx].set(value) gated by a traced boolean ``pred``.

    When pred is False the write is routed to the existing value, keeping the
    op shape-static (used for conditional scene updates inside jit).
    """
    old = arr[idx]
    new = jnp.where(pred, value, old)
    return arr.at[idx].set(new)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
