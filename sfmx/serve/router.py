"""Retrieval-routed map shards: the expert-parallel analog (SURVEY §2.3 EP).

Capability parity: the reference serves one in-RAM map per map id on one
machine (SURVEY §3.3).  At multi-floor/building scale one logical map is
too large for a single chip; here it is SPLIT into spatial shards, each
resident on its OWN device, and each query is routed to the shard(s) that
retrieval says contain the place — so serving capacity scales with devices
while every query touches exactly one shard ("shard routing", the nearest
analog of expert routing).

Mechanics:
  * ``split_localization_map`` cuts a built map into keyframe-contiguous
    shards balanced by landmark count (walkthrough keyframe order is the
    covisibility order, like mapstore.partition); the parent VLAD vocab is
    shared so global descriptors stay comparable across shards.
  * ``MapShardRouter`` keeps each shard device-resident, routes a query
    batch with one tiny GEMM over all shards' keyframe global descriptors
    (the router state is (sum C_i, G) — negligible), groups queries by
    winning shard, and localizes each group on its shard's device.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..localize.localize import (LocalizationMap, LocalizeResult,
                                 localize_query)


def split_localization_map(lmap: LocalizationMap, n_shards: int
                           ) -> list[LocalizationMap]:
    """Cut a map into keyframe-contiguous shards balanced by landmark load.

    Each shard keeps its keyframes' rows plus exactly the landmarks those
    keyframes observe (kf_lm re-indexed into the shard-local landmark
    arrays).  Landmarks observed from two shards' keyframes are duplicated
    into both — the serving analog of the BA halo; the duplication fraction
    is the same boundary-covisibility statistic partition.py monitors.
    """
    C = lmap.kf_lm.shape[0]
    kf_lm = np.asarray(lmap.kf_lm)
    kf_lm_mask = np.asarray(lmap.kf_lm_mask)
    # balance by per-keyframe landmark load (contiguous ranges: trajectory
    # order == covisibility order, same argument as partition_trajectory)
    load = kf_lm_mask.sum(1).astype(np.float64)
    cum = np.cumsum(load)
    targets = cum[-1] * (np.arange(1, n_shards) / n_shards)
    splits = np.concatenate([[0], np.searchsorted(cum, targets) + 1, [C]])

    X = np.asarray(lmap.X)
    desc = np.asarray(lmap.lm_desc)
    alive = np.asarray(lmap.lm_alive)
    bits = None if lmap.lm_bits is None else np.asarray(lmap.lm_bits)
    shards = []
    for s, e in zip(splits[:-1], splits[1:]):
        s, e = int(s), int(e)
        ids = np.unique(kf_lm[s:e][kf_lm_mask[s:e]])
        remap = np.zeros(X.shape[0], np.int32)
        remap[ids] = np.arange(len(ids), dtype=np.int32)
        shards.append(LocalizationMap(
            X=jnp.asarray(X[ids]),
            lm_desc=jnp.asarray(desc[ids]),
            lm_alive=jnp.asarray(alive[ids]),
            kf_gdesc=jnp.asarray(np.asarray(lmap.kf_gdesc)[s:e]),
            kf_alive=jnp.asarray(np.asarray(lmap.kf_alive)[s:e]),
            kf_centers=jnp.asarray(np.asarray(lmap.kf_centers)[s:e]),
            kf_lm=jnp.asarray(remap[kf_lm[s:e]]),
            kf_lm_mask=jnp.asarray(kf_lm_mask[s:e]),
            vocab=lmap.vocab,             # shared: scores stay comparable
            lm_bits=None if bits is None else jnp.asarray(bits[ids]),
        ))
    return shards


@dataclasses.dataclass
class MapShardRouter:
    """Device-per-shard serving: route by retrieval, localize on the shard.

    ``localize_kw`` is forwarded to :func:`localize_query` (thresholds,
    hypothesis counts).
    """

    shards: list          # LocalizationMap, device-resident
    devices: list
    router_gdesc: jax.Array   # (sum C_i, G) stacked keyframe descriptors
    router_shard: np.ndarray  # (sum C_i,) owning shard of each router row
    vocab: jax.Array | None

    @classmethod
    def build(cls, shards: list[LocalizationMap], devices=None):
        devices = list(devices) if devices is not None else jax.devices()
        if len(devices) < len(shards):
            # more shards than devices: round-robin (still correct, less HBM
            # headroom per device)
            devices = [devices[i % len(devices)] for i in range(len(shards))]
        placed = [jax.device_put(s, d) for s, d in zip(shards, devices)]
        g = np.concatenate([np.asarray(s.kf_gdesc) for s in shards])
        own = np.concatenate([np.full(s.kf_gdesc.shape[0], i, np.int32)
                              for i, s in enumerate(shards)])
        ka = np.concatenate([np.asarray(s.kf_alive) for s in shards])
        g = np.where(ka[:, None], g, 0.0)   # dead keyframes never win routing
        return cls(shards=placed, devices=devices[:len(shards)],
                   router_gdesc=jnp.asarray(g), router_shard=own,
                   vocab=shards[0].vocab)

    def route(self, q_desc: jax.Array, q_mask: jax.Array) -> np.ndarray:
        """(B,K,D) query descriptors -> (B,) winning shard ids (one GEMM)."""
        from ..localize import retrieve

        if self.vocab is not None:
            qg = retrieve.vlad_encode_b(q_desc, q_mask, self.vocab)
        else:
            qg = jnp.sum(jnp.where(q_mask[..., None], q_desc, 0.0), axis=1)
            qg = qg / jnp.maximum(
                jnp.linalg.norm(qg, axis=-1, keepdims=True), 1e-8)
        scores = qg @ self.router_gdesc.T                  # (B, sum C_i)
        best_kf = np.asarray(jnp.argmax(scores, axis=-1))
        return self.router_shard[best_kf]

    def localize_batch(self, q_desc, q_uv, q_mask, intr, key, q_bits=None,
                       **localize_kw) -> tuple[LocalizeResult, np.ndarray]:
        """Route, group by shard, localize each group with ONE vmapped call.

        Each shard group is padded to a power-of-two bucket (bounding
        recompiles), stacked, and dispatched as a single jitted+vmapped
        ``localize_query`` on the shard's device.  All groups are dispatched
        before ANY host sync, so shard devices run concurrently (JAX async
        dispatch); results are gathered afterwards and returned in input
        order.

        intr: (7,) shared or (B,7) per-query intrinsics.
        Returns (results in input order, shard id per query).
        """
        B = q_desc.shape[0]
        shard_of = self.route(q_desc, q_mask)
        qd = np.asarray(q_desc)
        qu = np.asarray(q_uv)
        qm = np.asarray(q_mask)
        qb = None if q_bits is None else np.asarray(q_bits)
        intr_b = np.broadcast_to(
            np.atleast_2d(np.asarray(intr, np.float32)), (B, 7))

        def _bucket(n: int) -> int:
            b = 1
            while b < n:
                b *= 2
            return b

        pending = []  # (query indices, device result) per shard group
        for sid in np.unique(shard_of):
            sid = int(sid)
            lmap, dev = self.shards[sid], self.devices[sid]
            idx = np.flatnonzero(shard_of == sid)
            n, nb = len(idx), _bucket(len(idx))

            def pad(a):
                g = a[idx]
                return np.concatenate([g, np.repeat(g[:1], nb - n, 0)]) \
                    if n < nb else g

            keys = jax.random.split(jax.random.fold_in(key, sid), nb)
            args = [jax.device_put(pad(a), dev) for a in (qd, qu, qm, intr_b)]
            if qb is not None and lmap.lm_bits is not None:
                bits = jax.device_put(pad(qb), dev)
                fn = lambda d, u, m, i, k_, bq, _l=lmap: localize_query(
                    _l, d, u, m, i, k_, q_bits=bq, **localize_kw)
                res = jax.vmap(fn)(*args, keys, bits)
            else:
                fn = lambda d, u, m, i, k_, _l=lmap: localize_query(
                    _l, d, u, m, i, k_, **localize_kw)
                res = jax.vmap(fn)(*args, keys)
            pending.append((idx, res))  # no host sync: keep devices busy

        outs: list = [None] * B
        for idx, res in pending:
            res_np = jax.tree_util.tree_map(np.asarray, res)
            for j, b in enumerate(idx):
                outs[int(b)] = jax.tree_util.tree_map(
                    lambda x, _j=j: x[_j], res_np)
        res = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *outs)
        return res, shard_of
