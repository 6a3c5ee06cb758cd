"""Measure achieved gather / scatter-add bandwidth on this chip.

Settles the BASELINE.md contradiction (round-1 "gather/scatter-bound at
~105 GB/s" vs the 478.5 GB/s the stream bench measures): streams and
gathers have DIFFERENT ceilings on TPU — a row gather of width d issues
d-wide strided HBM reads, and the achieved bandwidth depends strongly on
the row width (narrow rows waste most of each HBM burst).  This script
measures, per row width:

  * gather rows:      y = x[idx]           (random + sorted idx)
  * scatter-add rows: segment_sum(vals, idx) (random + sorted idx)
  * stream add (reference ceiling)

Traffic model per op: read gathered/scattered rows + write output
(= 2 * O * d * 4 bytes), which is the USEFUL traffic — achieved/useful
below the stream number quantifies the gather penalty directly.

Run: JAX_PLATFORMS=axon python bench_scripts/measure_gather.py  (or cpu)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CHAIN = 16
REPS = 3


def _force(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))


def bench_stream(m=64 * 1024 * 1024):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(x, _):
            return x + 1.0, None
        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return out

    x = jnp.ones((m,), jnp.float32)
    _force(chain(x))
    t0 = time.time()
    for _ in range(REPS):
        out = chain(x)
    _force(out)
    return 2.0 * 4.0 * m * CHAIN * REPS / (time.time() - t0) / 1e9


def bench_gather(P, O, d, sorted_idx):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx = rng.integers(0, P, O).astype(np.int32)
    if sorted_idx:
        idx = np.sort(idx)
    x = jnp.asarray(rng.standard_normal((P, d)), jnp.float32)
    idx = jnp.asarray(idx)

    @jax.jit
    def chain(x, idx):
        def body(carry, i):
            # fold the step index in so the chain cannot be collapsed
            y = x[idx] + carry
            return y[: 1].sum() * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(CHAIN))
        return out

    _force(chain(x, idx))
    t0 = time.time()
    for _ in range(REPS):
        out = chain(x, idx)
    _force(out)
    dt = time.time() - t0
    return 2.0 * 4.0 * O * d * CHAIN * REPS / dt / 1e9


def bench_scatter(P, O, d, sorted_idx):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx = rng.integers(0, P, O).astype(np.int32)
    if sorted_idx:
        idx = np.sort(idx)
    vals = jnp.asarray(rng.standard_normal((O, d)), jnp.float32)
    idx = jnp.asarray(idx)

    @jax.jit
    def chain(vals, idx):
        def body(carry, i):
            s = jax.ops.segment_sum(vals + carry, idx, num_segments=P,
                                    indices_are_sorted=sorted_idx)
            return s[:1, :1].sum() * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(CHAIN))
        return out

    _force(chain(vals, idx))
    t0 = time.time()
    for _ in range(REPS):
        out = chain(vals, idx)
    _force(out)
    dt = time.time() - t0
    return 2.0 * 4.0 * O * d * CHAIN * REPS / dt / 1e9


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    out = {"backend": jax.default_backend(),
           "stream_gbps": round(bench_stream(), 1)}
    P, O = 20000, 200000  # config-3 BA shapes
    for d in (1, 4, 8, 32, 128):
        for srt in (False, True):
            tag = f"d{d}_{'sorted' if srt else 'random'}"
            out[f"gather_{tag}_gbps"] = round(bench_gather(P, O, d, srt), 2)
            out[f"scatter_{tag}_gbps"] = round(bench_scatter(P, O, d, srt), 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
