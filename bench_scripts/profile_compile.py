"""Cold-compile breakdown (VERDICT r3 item 9: 829 s full-pipeline cold).

Times XLA compilation of each pipeline subprogram at a FRESH shape (so the
persistent cache can't hit) plus a trivial unique program (the remote
compile service's fixed overhead).  Run on the chip:

  python bench_scripts/profile_compile.py [--h 232 --w 312]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--h", type=int, default=232)
p.add_argument("--w", type=int, default=312)
p.add_argument("--k", type=int, default=512)
p.add_argument("--cache", action="store_true",
               help="enable the persistent cache (default: off, to measure COLD)")
args = p.parse_args()

if args.cache:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sfmx.kernels import features
from sfmx.kernels import pallas_scale_space as pss
from sfmx.kernels import pallas_describe as pd

B, H, W, K = 16, args.h, args.w, args.k
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, H, W)), jnp.float32)
cfg = features.ScaleSpaceConfig()
out = {"shape": [B, H, W], "K": K}


def timed(name, fn, *a, **kw):
    t0 = time.time()
    r = fn(*a, **kw)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, r)
    out[name] = round(time.time() - t0, 1)
    print(f"{name}: {out[name]}s", flush=True)
    return r


# fixed service overhead: a trivial but unique program
u = float(np.random.default_rng(int(time.time())).random())
timed("trivial_unique", jax.jit(lambda x: jnp.sum(x * u) + u), imgs)

levels, resp = timed(
    "scale_space_pallas",
    jax.jit(lambda im: pss.build_scale_space_and_response(im, cfg)), imgs)
kp = timed(
    "detect",
    jax.jit(lambda lv, r: features.detect(lv, r, cfg, max_keypoints=K,
                                          threshold=1e-7)), levels, resp)
raw = timed(
    "describe_pallas",
    jax.jit(lambda lv, k: pd.describe_upright(lv, k.uv, k.level, k.sigma,
                                              k.mask)), levels, kp)
timed("finalize",
      jax.jit(lambda r, m: (pd.finalize_float(r, m), pd.finalize_bits(r, m))),
      raw, kp.mask)
timed("full_extract",
      jax.jit(lambda im: features.detect_and_describe(
          im, max_keypoints=K, threshold=1e-7)), imgs)

print(json.dumps(out))
