"""Honest speed-of-light analysis for the fused BA kernels (VERDICT r3).

Measures, at config-3 scale, (a) the dense-stream time of exactly the HBM
bytes each kernel must move, (b) the kernels themselves, and reports the
achieved fraction of the pure-bandwidth ceiling plus where the gap lives
(the M=16/M=96-row one-hot matmuls pad a 128-row MXU; the iota-compare
one-hot construction is VPU work the pure-stream bound doesn't include).

Run on the chip: python bench_scripts/roofline_ba.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from sfmx.kernels import segsum


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / reps


def main():
    C, P, O = 512, 20000, 200000
    rng = np.random.default_rng(0)
    pt_id = np.sort(rng.integers(0, P, O).astype(np.int32))
    span = 24
    base = (pt_id.astype(np.float64) / P * (C - span)).astype(np.int32)
    cam_id = (base + rng.integers(0, span, O)).astype(np.int32)
    tp = 1 << max(3, (int(np.bincount(pt_id).max()) - 1).bit_length())
    wc = segsum.compute_cam_window(pt_id, cam_id, P, C, tp)
    wc = 128 * (1 << max(0, (wc // 128 - 1).bit_length()))
    dense = segsum.build_dense_obs(jnp.asarray(pt_id), jnp.asarray(cam_id),
                                   P, C, tp, cam_window=wc)
    tp_r, pp = dense.camp.shape
    cp = -(-C // 128) * 128

    Wp = jnp.asarray(rng.standard_normal((tp_r * 18, pp)), jnp.float32) * 0.01
    vinv = jnp.asarray(rng.standard_normal((16, pp)), jnp.float32) * 0.01
    x8 = jnp.asarray(rng.standard_normal((8, cp)), jnp.float32)
    uvw = jnp.asarray(rng.standard_normal((3 * tp_r, pp)), jnp.float32)
    cam19 = jnp.asarray(rng.standard_normal((19, cp)), jnp.float32)
    xp8 = jnp.asarray(rng.standard_normal((8, pp)), jnp.float32)

    # --- the pure dense-stream bound: read the same bytes, one pass -------
    mv_bytes = (Wp.size + dense.camp.size + vinv.size) * 4
    as_bytes = (uvw.size + dense.camp.size) * 4 + Wp.size * 4  # read + W write
    big_mv = jnp.asarray(rng.standard_normal(mv_bytes // 4), jnp.float32)
    big_as = jnp.asarray(rng.standard_normal(as_bytes // 4), jnp.float32)
    stream = jax.jit(lambda v: jnp.sum(v * 1.0000001))
    t_stream_mv = timeit(stream, big_mv)
    t_stream_as = timeit(stream, big_as)

    # --- the kernels -------------------------------------------------------
    mv = jax.jit(lambda W, c, v, x: segsum.schur_cross_matvec(
        W, c, v, x, tp=tp_r, bases=dense.bases, cam_window=wc))
    t_mv = timeit(mv, Wp, dense.camp, vinv, x8)

    asm = jax.jit(lambda c19, c, u, x: segsum.ba_assemble_fused(
        c19, c, u, x, 0.01, tp=tp_r, bases=dense.bases, cam_window=wc))
    t_as = timeit(asm, cam19, dense.camp, uvw, xp8, reps=10)

    print(json.dumps({
        "scale": {"C": C, "P": P, "O": O, "tp": tp_r, "cam_window": wc},
        "matvec_ms": round(t_mv * 1e3, 3),
        "matvec_stream_bound_ms": round(t_stream_mv * 1e3, 3),
        "matvec_frac_of_stream_SoL": round(t_stream_mv / t_mv, 3),
        "assemble_ms": round(t_as * 1e3, 3),
        "assemble_stream_bound_ms": round(t_stream_as * 1e3, 3),
        "assemble_frac_of_stream_SoL": round(t_stream_as / t_as, 3),
        "mv_bytes_mb": round(mv_bytes / 1e6, 1),
        "as_bytes_mb": round(as_bytes / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
