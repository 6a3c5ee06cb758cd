"""Sequential localization with temporal prior (localize/tracking.py).

Uses the reconstructed rendered-room pipeline fixture: localizing the map's
own frame sequence must track continuously (prior-gated path) after the
first frame, and a corrupted frame must trigger loss + global
relocalization on the next good frame.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmx.localize import build_localization_map
from sfmx.localize.tracking import (SequenceLocalizer, TrackingConfig,
                                    localize_sequence)

from .test_recon_e2e import pipeline_result  # noqa: F401  (fixture reuse)


@pytest.fixture()
def lmap_seq(pipeline_result):  # noqa: F811
    sc, scene, stats, extras = pipeline_result
    (uv, desc, mask, feat_pt, tt) = extras
    lmap = build_localization_map(scene, desc, tt.obs_feat)
    return sc, scene, lmap, (uv, desc, mask)


def test_sequence_tracks_continuously(lmap_seq):
    sc, scene, lmap, (uv, desc, mask) = lmap_seq
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    results, flags, stats = localize_sequence(
        lmap, jnp.asarray(desc), jnp.asarray(uv), jnp.asarray(mask), intr,
        jax.random.PRNGKey(0), TrackingConfig(radius=3.0))
    n = desc.shape[0]
    assert stats["frames"] == n
    # frame 0 must relocalize (cold start); the rest should ride the prior
    assert not flags[0]
    assert sum(flags) >= n - 2
    # every frame lands near its reconstructed camera center
    centers = np.asarray(scene.centers)
    alive = np.flatnonzero(np.asarray(scene.cam_alive))
    for i, r in enumerate(results):
        assert float(r.confidence) > 0.0, i
        err = np.linalg.norm(np.asarray(r.center) - centers[alive[i]])
        assert err < 0.1, (i, err)


def test_track_loss_and_relocalization(lmap_seq):
    sc, scene, lmap, (uv, desc, mask) = lmap_seq
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    seq = SequenceLocalizer(lmap, intr, TrackingConfig(radius=3.0))
    key = jax.random.PRNGKey(1)

    r0, f0 = seq.step(jnp.asarray(desc[0]), jnp.asarray(uv[0]),
                      jnp.asarray(mask[0]), key)
    assert float(r0.confidence) > 0 and not f0  # cold start = reloc

    # corrupted frame: all features masked out -> no pose, prior survives
    dead = jnp.zeros_like(jnp.asarray(mask[0]))
    r1, f1 = seq.step(jnp.asarray(desc[1]), jnp.asarray(uv[1]), dead, key)
    assert float(r1.confidence) == 0.0 and not f1
    assert seq.stats["lost"] == 1

    # next good frame recovers via the prior (coast window keeps it)
    r2, f2 = seq.step(jnp.asarray(desc[1]), jnp.asarray(uv[1]),
                      jnp.asarray(mask[1]), key)
    assert float(r2.confidence) > 0.0 and f2

    # a teleported prior (track followed wrong pose) must NOT pin the next
    # frame: force a bogus prior and exhaust the coast window
    seq.state.center = np.asarray([1e3, 1e3, 1e3], np.float32)
    for _ in range(seq.cfg.max_coast + 1):
        r, f = seq.step(jnp.asarray(desc[2]), jnp.asarray(uv[2]),
                        jnp.asarray(mask[2]), key)
        if float(r.confidence) > 0:
            break
    # relocalization happened: pose is correct despite the poisoned prior
    centers = np.asarray(scene.centers)
    alive = np.flatnonzero(np.asarray(scene.cam_alive))
    assert float(r.confidence) > 0.0
    assert np.linalg.norm(np.asarray(r.center) - centers[alive[2]]) < 0.1


def test_scan_matches_host_stepper(lmap_seq):
    """The lax.scan sequence engine reproduces the host SequenceLocalizer's
    per-frame decisions and poses on the same inputs and keys."""
    sc, scene, lmap, (uv, desc, mask) = lmap_seq
    intr = jnp.asarray(sc.intrinsics, jnp.float32)
    cfg = TrackingConfig(radius=3.0)
    key = jax.random.PRNGKey(7)
    results, flags, stats = localize_sequence(
        lmap, jnp.asarray(desc), jnp.asarray(uv), jnp.asarray(mask), intr,
        key, cfg)
    seq = SequenceLocalizer(lmap, intr, cfg)
    keys = jax.random.split(key, desc.shape[0])
    for i in range(desc.shape[0]):
        r, f = seq.step(jnp.asarray(desc[i]), jnp.asarray(uv[i]),
                        jnp.asarray(mask[i]), keys[i])
        assert f == flags[i], i
        np.testing.assert_allclose(np.asarray(results[i].center),
                                   np.asarray(r.center), atol=1e-5)
    assert stats["tracked"] == seq.stats["tracked"]
    assert stats["relocalized"] == seq.stats["relocalized"]
