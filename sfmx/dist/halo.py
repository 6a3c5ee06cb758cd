"""Halo exchange + ring accumulation for block-partitioned BA (SURVEY §5.7).

The obs-sharded BA (dist_ba) psums full (C,6,6)/(P,3,3) block arrays — fine
while camera/point state fits every chip.  At config-4/5 scale the map is
partitioned (mapstore.partition) and two communication primitives replace
the dense psum:

  * ``halo_gather``: each shard owns a contiguous landmark block; the small
    set of boundary landmarks observed across blocks (the halo) is exchanged
    with one ``all_gather`` of a fixed-capacity halo buffer — the analog of
    sequence-parallel halo exchange.
  * ``ring_reduce_scatter``: cross-block camera-coupling contributions are
    accumulated around the mesh ring with ``lax.ppermute`` — each shard ends
    up owning the fully-summed blocks of its camera range while only
    1/n-sized chunks ride the links each step (the ring-attention-style
    bandwidth-optimal pattern; a dense psum moves the full array).

Both are pure collectives usable inside any shard_map; parity is tested
against psum on the virtual 8-device mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_reduce_scatter(x: jax.Array, axis_name: str) -> jax.Array:
    """Reduce-scatter x ((n*Cb, ...) per shard, identical layout) around the ring.

    Returns this shard's fully-reduced chunk (Cb, ...).  Equivalent to
    psum(x)[rank-th chunk] but each step moves only one chunk.
    """
    n = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    chunks = x.reshape(n, -1, *x.shape[1:])  # (n, Cb, ...)

    # Start by sending chunk (rank+1); after n-1 hops each shard holds the
    # full sum of its own chunk.
    # Chunk c starts at rank c+1 and travels leftward; after the permute at
    # step i, rank r holds the partial for chunk (r + 2 + i) and adds its own
    # contribution.  After n-1 steps rank r owns the full sum of chunk r.
    def body(i, acc):
        acc = jax.lax.ppermute(acc, axis_name,
                               perm=[(j, (j - 1) % n) for j in range(n)])
        idx = (rank + 2 + i) % n
        return acc + chunks[idx]

    acc0 = chunks[(rank + 1) % n]
    acc = jax.lax.fori_loop(0, n - 1, body, acc0)
    return acc


def ring_all_reduce(x: jax.Array, axis_name: str) -> jax.Array:
    """Ring all-reduce built from reduce-scatter + all-gather (psum parity)."""
    n = jax.lax.axis_size(axis_name)
    own = ring_reduce_scatter(x, axis_name)          # (Cb, ...)
    gathered = jax.lax.all_gather(own, axis_name)    # (n, Cb, ...)
    return gathered.reshape(x.shape)


def halo_gather(local_vals: jax.Array, halo_local_idx: jax.Array,
                halo_mask: jax.Array, axis_name: str):
    """Exchange boundary values: every shard contributes its (Hcap,...) halo
    slice (rows of ITS OWN landmarks that other shards observe) and receives
    the full (n, Hcap, ...) boundary set.

    halo_local_idx: (Hcap,) local landmark rows this shard exports (pad 0).
    halo_mask: (Hcap,) validity of those rows.
    Returns (n, Hcap, ...) gathered boundary values + (n, Hcap) masks.
    """
    export = local_vals[halo_local_idx] * halo_mask.reshape(
        (-1,) + (1,) * (local_vals.ndim - 1)).astype(local_vals.dtype)
    vals = jax.lax.all_gather(export, axis_name)
    masks = jax.lax.all_gather(halo_mask, axis_name)
    return vals, masks
