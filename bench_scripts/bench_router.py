"""Shard-router throughput: batched group dispatch vs the round-2 serial
loop (VERDICT r2 item 3 'Done' criterion).

Runs on the 8-virtual-device CPU mesh (multi-chip is unavailable —
SURVEY §4.2.4): queries routed across 4 map shards, comparing the
production ``MapShardRouter.localize_batch`` (one vmapped call per shard
group, all groups in flight before any host sync) against the round-2
behavior it replaced (one ``localize_query`` per query with a host sync
each).  Prints one JSON line with both throughputs and the speedup.

CAVEAT on the number: on virtual CPU devices every "device" shares one
host, so a per-query host sync costs ~nothing and no real concurrency
exists — the measured speedup (~1.4x) is ONLY the vmap batching economy.
On the real backend a host sync costs ~23 ms (BASELINE.md), so the serial
loop is bounded at ~43 q/s regardless of shard count while the batched
path pays ONE sync per batch; the production gap there is the sync count
ratio (B syncs vs 1), >= 8x at B=8.  test_router.py asserts the structural
property (one device call per shard group) directly.

Run: python bench_scripts/bench_router.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from __graft_entry__ import _example_map
    from sfmx.localize.localize import localize_query
    from sfmx.serve.router import MapShardRouter

    B, K, D = 32, 256, 128
    n_shards = 4
    rng = np.random.default_rng(0)
    shards = [_example_map(P=2048, C=32, D=D, Kc=128, seed=i)
              for i in range(n_shards)]
    router = MapShardRouter.build(shards, jax.devices()[:n_shards])

    q_desc = rng.standard_normal((B, K, D)).astype(np.float32)
    q_desc /= np.linalg.norm(q_desc, axis=-1, keepdims=True)
    q_uv = rng.uniform(0, 640, (B, K, 2)).astype(np.float32)
    q_mask = np.ones((B, K), bool)
    intr = np.asarray([560.0, 560.0, 320.0, 240.0, 0, 0, 0], np.float32)
    kw = dict(top_k_kf=4, m_cap=512, k_hypotheses=256)
    args = (jnp.asarray(q_desc), jnp.asarray(q_uv), jnp.asarray(q_mask))

    # production: batched groups, concurrent shard devices
    res, shard_of = router.localize_batch(*args, intr, jax.random.PRNGKey(0),
                                          **kw)
    reps = 5
    t0 = time.time()
    for i in range(reps):
        res, _ = router.localize_batch(*args, intr,
                                       jax.random.PRNGKey(i), **kw)
        np.asarray(res.confidence)
    batched_qps = B * reps / (time.time() - t0)

    # round-2 behavior: one device call + host sync PER QUERY
    def serial():
        out = []
        for i in range(B):
            sid = int(shard_of[i])
            r = localize_query(router.shards[sid], args[0][i], args[1][i],
                               args[2][i], jnp.asarray(intr),
                               jax.random.PRNGKey(i), **kw)
            out.append(np.asarray(r.confidence))  # host sync per query
        return out

    serial()
    t0 = time.time()
    for _ in range(reps):
        serial()
    serial_qps = B * reps / (time.time() - t0)

    print(json.dumps({
        "router_batched_qps": round(batched_qps, 1),
        "router_serial_qps": round(serial_qps, 1),
        "speedup": round(batched_qps / serial_qps, 2),
        "queries": B, "shards": n_shards, "backend": "cpu-8dev",
    }))


if __name__ == "__main__":
    main()
