"""Matching-kernel cost split (VERDICT r4 item 8): where do the ~2.4 us/pair
go between MXU GEMM, VPU reductions, and per-grid-step setup?

Variants timed through the SAME harness:
  full            production kernel (ratio + mask + mutual cross-check)
  no-crosscheck   drops the lane-direction bmax reduction + mutual pass
  top2-only       raw top-2 kernel (match_pairs_top2): no masks/tests
  G=16/32         grid-setup amortization (more pairs per grid step)

Usage: python bench_scripts/profile_match_kernel.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os

os.environ.setdefault("SFMX_JAX_CACHE", "/root/repo/.jax_cache")

import jax
import numpy as np

if os.environ["SFMX_JAX_CACHE"].lower() != "off":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SFMX_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from sfmx.kernels import pallas_pairs

C, K, D = 64, 512, 128
NP = 1024
REPS = 30


def _force(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    rng = np.random.default_rng(0)
    descs = rng.standard_normal((C, K, D)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    masks = jnp.ones((C, K), bool)
    pairs = jnp.asarray(rng.integers(0, C, (NP, 2)).astype(np.int32))
    descs = jnp.asarray(descs)

    out = {}

    def timeit(name, fn, result_leaf):
        o = fn()
        _force(result_leaf(o))
        t0 = time.time()
        for _ in range(REPS):
            o = fn()
        _force(result_leaf(o))
        dt = (time.time() - t0) / REPS
        out[name] = round(NP / dt, 1)

    for G in (8, 16, 32):
        timeit(f"full_G{G}",
               lambda G=G: pallas_pairs.match_pairs_float_pallas(
                   descs, masks, pairs, G=G),
               lambda o: o.score)
        timeit(f"nocheck_G{G}",
               lambda G=G: pallas_pairs.match_pairs_float_pallas(
                   descs, masks, pairs, cross_check=False, G=G),
               lambda o: o.score)
    timeit("top2_raw", lambda: pallas_pairs.match_pairs_top2(descs, pairs),
           lambda o: o[0])
    print(json.dumps({"pairs_per_s": out, "np": NP, "K": K, "D": D}))


if __name__ == "__main__":
    main()
