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


def test_service_shard_routed_map(pipeline_result):  # noqa: F811
    """serve --shards N: map split across devices, queries routed by
    retrieval to their shard's device (EP analog in the serving path)."""
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    svc = LocalizationService(batch_window_ms=2.0, max_batch=8)
    svc.load_map("demo", lmap, jnp.asarray(sc.intrinsics, jnp.float32),
                 shards=4)
    from sfmx.serve.router import MapShardRouter

    assert isinstance(svc.maps["demo"][0], MapShardRouter)
    d, u = _query_payload(sc, scene, extras, np.random.default_rng(2))
    q_desc = np.zeros((512, d.shape[1]), np.float32)
    q_uv = np.zeros((512, 2), np.float32)
    q_mask = np.zeros(512, bool)
    q_desc[:len(d)], q_uv[:len(u)], q_mask[:len(d)] = d, u, True

    async def run():
        await svc.start()
        outs = await asyncio.gather(*[
            svc.localize("demo", q_desc, q_uv, q_mask) for _ in range(3)
        ])
        await svc.stop()
        return outs

    outs = asyncio.run(run())
    assert all(o["n_inliers"] > 20 for o in outs)


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


# ---------------------------------------------------------------------------
# Image-in / pose-out serving (the reference's actual surface, SURVEY §3.3):
# client uploads pixels; extraction runs server-side in the device batch.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rendered_map_service():
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.room import RoomTexture, look_at, render_room, walk_poses

    from sfmx.cli.config import FeatureConfig, PipelineConfig
    from sfmx.cli.pipeline import build_map

    tex = RoomTexture(seed=3)
    poses = walk_poses(10)
    imgs = np.stack([render_room(tex, R, eye, 320, 240, 280.0)
                     for (R, t, eye) in poses[:8]])
    intr = np.array([[280.0, 280.0, 160.0, 120.0, 0, 0, 0]], np.float32)
    cfg = PipelineConfig(features=FeatureConfig(max_keypoints=384),
                         resize_to=(320, 240), focal_factor=0.875)
    scene, feats, tt, stats = build_map(imgs, intr, np.zeros(8, np.int32), cfg)
    lmap = build_localization_map(scene, np.asarray(feats.desc), tt.obs_feat,
                                  kp_mask=np.asarray(feats.kp.mask))
    svc = LocalizationService(batch_window_ms=20.0, max_batch=8)
    svc.load_map("room", lmap, jnp.asarray(intr[0]), cfg=cfg)

    # held-out interior query pose (inside the mapped walkthrough)
    si = 0.35
    eye = np.array([-3.0 + 6.0 * si + 0.1, 0.2 * np.sin(6 * si) + 0.05,
                    -3.0 + 2.0 * si])
    yaw = np.deg2rad(25.0 + 20.0 * si + 3.0)
    d = np.array([np.sin(yaw), 0.12 * np.sin(4 * si), np.cos(yaw)])
    Rq, tq = look_at(eye, eye + 5.0 * d)
    q_img = render_room(tex, Rq, eye, 320, 240, 280.0)
    return svc, q_img


def test_http_image_localization_batches(rendered_map_service):
    """POST base64 images -> poses; concurrent uploads share device batches."""
    import base64
    import io

    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    svc, q_img = rendered_map_service
    buf = io.BytesIO()
    Image.fromarray((q_img * 255).astype(np.uint8)).save(buf, format="PNG")
    payload = base64.b64encode(buf.getvalue()).decode()
    app = make_app(svc)

    async def run():
        async with TestClient(TestServer(app)) as client:
            rs = await asyncio.gather(*[
                client.post("/localize", json={"map_id": "room",
                                               "image": payload})
                for _ in range(4)
            ])
            bodies = [await r.json() for r in rs]
            for r, b in zip(rs, bodies):
                assert r.status == 200, b
            # malformed image -> 400, not a crash
            r = await client.post("/localize", json={
                "map_id": "room", "image": base64.b64encode(b"junk").decode()})
            assert r.status == 400
            r = await client.post("/localize", json={"map_id": "room"})
            assert r.status == 400
            return bodies

    bodies = asyncio.run(run())
    assert all(b["n_inliers"] >= 12 for b in bodies)
    assert all(b["confidence"] > 0.2 for b in bodies)
    assert svc.stats.image_requests == 4
    assert svc.stats.batches < svc.stats.requests  # uploads were micro-batched


def test_service_warmup_compiles_buckets(rendered_map_service):
    """warmup() pre-compiles every pow2 batch bucket (image extraction +
    localization) without touching service state; requests still work."""
    import asyncio

    svc0, q_img = rendered_map_service
    # fresh service (the fixture's queue is bound to an earlier test's event
    # loop); share the already-device-put map entry
    svc = LocalizationService(batch_window_ms=5.0, max_batch=8)
    svc.maps["room"] = svc0.maps["room"]
    svc.warmup("room", max_bucket=4)   # buckets 1, 2, 4
    assert svc.stats.requests == 0     # warmup is not traffic

    async def run():
        await svc.start()
        try:
            return await svc.localize("room", image=q_img)
        finally:
            await svc.stop()

    out = asyncio.run(run())
    assert out["n_inliers"] >= 12
