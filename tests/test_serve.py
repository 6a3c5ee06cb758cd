"""Serving layer (C14): HTTP API + micro-batching over a real map."""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfmx.localize import build_localization_map
from sfmx.serve import LocalizationService, make_app

from .synthetic import make_scene
from .test_matching_tracks import scene_features
from .test_recon_e2e import pipeline_result  # noqa: F401  (fixture reuse)


@pytest.fixture()
def loaded_service(pipeline_result):  # noqa: F811
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    svc = LocalizationService(batch_window_ms=2.0, max_batch=8)
    svc.load_map("demo", lmap, jnp.asarray(sc.intrinsics, jnp.float32))
    return sc, scene, extras, svc


def _query_payload(sc, scene, extras, rng):
    (uv, desc, mask, feat_pt, tt) = extras
    lm_desc_needed = 64
    # take features of a registered camera as a pseudo-query
    c = int(np.flatnonzero(np.asarray(scene.cam_alive))[1])
    sel = np.where(mask[c])[0][:256]
    return desc[c][sel], uv[c][sel]


def test_service_localizes_and_batches(loaded_service):
    sc, scene, extras, svc = loaded_service
    rng = np.random.default_rng(0)
    d, u = _query_payload(sc, scene, extras, rng)
    K = 256
    q_desc = np.zeros((512, d.shape[1]), np.float32)
    q_uv = np.zeros((512, 2), np.float32)
    q_mask = np.zeros(512, bool)
    q_desc[:len(d)], q_uv[:len(u)], q_mask[:len(d)] = d, u, True

    async def run():
        await svc.start()
        outs = await asyncio.gather(*[
            svc.localize("demo", q_desc, q_uv, q_mask) for _ in range(6)
        ])
        await svc.stop()
        return outs

    outs = asyncio.run(run())
    assert all(o["n_inliers"] > 20 for o in outs)
    assert svc.stats.requests == 6
    assert svc.stats.batches < 6  # micro-batching actually batched


def test_http_endpoints(loaded_service):
    from aiohttp.test_utils import TestClient, TestServer

    sc, scene, extras, svc = loaded_service
    rng = np.random.default_rng(1)
    d, u = _query_payload(sc, scene, extras, rng)
    app = make_app(svc)

    async def run():
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/maps")
            maps = await r.json()
            assert maps["maps"] == ["demo"]

            r = await client.post("/localize", json={
                "map_id": "demo",
                "features": {"desc": d.tolist(), "uv": u.tolist()},
            })
            assert r.status == 200
            body = await r.json()
            assert body["n_inliers"] > 20
            assert body["confidence"] > 0.2
            assert len(body["t"]) == 3

            # beacon fusion path
            r = await client.post("/localize", json={
                "map_id": "demo",
                "features": {"desc": d.tolist(), "uv": u.tolist()},
                "beacons": {"center": [0.0, 0.0, 0.0], "radius": 100.0,
                             "confidence": 0.4},
            })
            assert r.status == 200
            body2 = await r.json()
            assert body2["n_inliers"] > 20

            r = await client.post("/localize", json={
                "map_id": "nope", "features": {"desc": [[0.0]], "uv": [[0.0, 0.0]]},
            })
            assert r.status == 404

            r = await client.get("/stats")
            stats = await r.json()
            assert stats["requests"] >= 2

    asyncio.run(run())
