"""Localization serving: batched device queue + HTTP API.

Capability parity: the reference's Node.js ``VisionLocalizeServer`` (C14,
SURVEY.md §3.3): HTTP endpoint accepting an image (+ optional beacon
readings, + map id), returning a 6-DOF pose JSON; maps are loaded once and
kept resident.

TPU design: instead of the reference's one-query-at-a-time native-addon
call, concurrent requests are micro-batched onto the device — a background
loop drains the queue every ``batch_window_ms`` and runs the vmapped
``localize_batch`` jitted path once per batch.  Maps are device-resident
``LocalizationMap`` pytrees keyed by map id.
"""
from __future__ import annotations

import asyncio
import dataclasses
import io
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..localize import LocalizationMap, localize_query
from ..localize.fusion import BeaconPrior, fuse


@dataclasses.dataclass
class ServiceStats:
    requests: int = 0
    batches: int = 0
    total_latency_ms: float = 0.0
    total_batch_size: int = 0
    # ring buffer of recent latencies for percentile export (§5.5)
    recent_latencies: list = dataclasses.field(default_factory=list)
    _recent_cap: int = 1024

    def record_latency(self, ms: float):
        self.requests += 1
        self.total_latency_ms += ms
        if len(self.recent_latencies) >= self._recent_cap:
            self.recent_latencies.pop(0)
        self.recent_latencies.append(ms)

    def snapshot(self):
        lat = sorted(self.recent_latencies)

        def pct(p):
            if not lat:
                return None
            return lat[min(len(lat) - 1, int(p * len(lat)))]

        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_latency_ms": self.total_latency_ms / max(self.requests, 1),
            "p50_latency_ms": pct(0.50),
            "p95_latency_ms": pct(0.95),
            "p99_latency_ms": pct(0.99),
            "mean_batch_size": self.total_batch_size / max(self.batches, 1),
        }


class LocalizationService:
    """Micro-batching front of the jitted localization path."""

    def __init__(self, *, batch_window_ms: float = 5.0, max_batch: int = 32):
        self.maps: dict[str, tuple[LocalizationMap, jnp.ndarray]] = {}
        self.batch_window_ms = batch_window_ms
        self.max_batch = max_batch
        self.stats = ServiceStats()
        self._queue: asyncio.Queue = asyncio.Queue()
        self._task = None
        self._key = jax.random.PRNGKey(0)

    def load_map(self, map_id: str, lmap: LocalizationMap, intr: jnp.ndarray):
        self.maps[map_id] = (jax.device_put(lmap), jnp.asarray(intr, jnp.float32))

    async def start(self):
        self._task = asyncio.create_task(self._batch_loop())

    async def stop(self):
        if self._task:
            self._task.cancel()

    async def localize(self, map_id: str, q_desc, q_uv, q_mask,
                       prior: BeaconPrior | None = None) -> dict:
        t0 = time.perf_counter()
        fut = asyncio.get_event_loop().create_future()
        await self._queue.put((map_id, q_desc, q_uv, q_mask, prior, fut))
        out = await fut
        dt = (time.perf_counter() - t0) * 1e3
        self.stats.record_latency(dt)
        out["latency_ms"] = dt
        return out

    async def _batch_loop(self):
        while True:
            item = await self._queue.get()
            batch = [item]
            deadline = time.perf_counter() + self.batch_window_ms / 1e3
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(self._queue.get(), timeout))
                except asyncio.TimeoutError:
                    break
            self.stats.batches += 1
            self.stats.total_batch_size += len(batch)
            try:
                self._run_batch(batch)
            except Exception as e:  # propagate to callers, keep loop alive
                for *_rest, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_batch(self, batch):
        # group by (map id, K) so each group runs as ONE vmapped device call
        by_map: dict[tuple, list] = {}
        for req in batch:
            by_map.setdefault((req[0], req[1].shape[0]), []).append(req)
        for (map_id, _k), reqs in by_map.items():
            lmap, intr = self.maps[map_id]
            self._key, k = jax.random.split(self._key)
            keys = jax.random.split(k, len(reqs))
            q_desc = jnp.asarray(np.stack([r[1] for r in reqs]))
            q_uv = jnp.asarray(np.stack([r[2] for r in reqs]))
            q_mask = jnp.asarray(np.stack([r[3] for r in reqs]))
            res_b = jax.vmap(
                lambda d, u, m, kq: localize_query(lmap, d, u, m, intr, kq)
            )(q_desc, q_uv, q_mask, keys)
            for i, (map_id_, _d, _u, _m, prior, fut) in enumerate(reqs):
                res = jax.tree_util.tree_map(lambda x: x[i], res_b)
                fused = fuse(res, prior)
                fut.set_result({
                    "t": np.asarray(res.t).tolist(),
                    "R": np.asarray(res.R).tolist(),
                    "center": np.asarray(fused.center).tolist(),
                    "n_inliers": int(res.n_inliers),
                    "confidence": float(fused.confidence),
                    "source": int(fused.source),
                })


def make_app(service: LocalizationService):
    """aiohttp application exposing the reference's serving surface.

    POST /localize  {map_id, features:{desc:[[...]], uv:[[x,y]...]},
                     beacons?: {center:[x,y,z], radius, confidence}}
    GET  /maps      list loaded maps
    GET  /stats     serving metrics
    """
    from aiohttp import web

    async def localize(request: web.Request):
        body = await request.json()
        map_id = body["map_id"]
        if map_id not in service.maps:
            return web.json_response({"error": f"unknown map {map_id}"}, status=404)
        desc = np.asarray(body["features"]["desc"], np.float32)
        uv = np.asarray(body["features"]["uv"], np.float32)
        k_cap = 512
        K, D = desc.shape
        q_desc = np.zeros((k_cap, D), np.float32)
        q_uv = np.zeros((k_cap, 2), np.float32)
        q_mask = np.zeros(k_cap, bool)
        n = min(K, k_cap)
        q_desc[:n], q_uv[:n], q_mask[:n] = desc[:n], uv[:n], True
        prior = None
        if "beacons" in body and body["beacons"]:
            b = body["beacons"]
            prior = BeaconPrior(jnp.asarray(b["center"], jnp.float32),
                                float(b["radius"]), float(b.get("confidence", 0.5)))
        out = await service.localize(map_id, q_desc, q_uv, q_mask, prior)
        return web.json_response(out)

    async def maps(_request):
        return web.json_response({"maps": list(service.maps.keys())})

    async def stats(_request):
        return web.json_response(service.stats.snapshot())

    app = web.Application()
    app.router.add_post("/localize", localize)
    app.router.add_get("/maps", maps)
    app.router.add_get("/stats", stats)

    async def on_startup(_app):
        await service.start()

    async def on_cleanup(_app):
        await service.stop()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app
