"""Round-3 spot check on the real chip: production-path timings for bench.py.

Measures (1) BA with the dense_cg fused Pallas matvec at config-3 scale,
(2) match_pairs_float_auto (the Pallas per-pair kernel), (3) the streaming
full-pool localize at 10^5 landmarks, (4) the fused matvec kernel alone with
its actual byte traffic.  Informs the bench.py rewrite (VERDICT r2 item 2).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))


def _obs_table(C, P, O, local, rng):
    """local=True: sliding-window visibility (what incremental SfM yields —
    tracks triangulate as their cameras register, so point id correlates
    with camera id); False: adversarial uniform-random visibility."""
    pt_id = np.sort(rng.integers(0, P, O).astype(np.int32))
    if local:
        span = 24
        base = (pt_id.astype(np.float64) / P * (C - span)).astype(np.int32)
        cam_id = (base + rng.integers(0, span, O)).astype(np.int32)
    else:
        cam_id = rng.integers(0, C, O).astype(np.int32)
    return cam_id, pt_id


def ba_dense(local=True):
    from sfmx.kernels import segsum
    from sfmx.solvers import lm

    C, P, O = 512, 20000, 200000
    iters, cg_iters = 10, 30
    rng = np.random.default_rng(0)
    X = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    t = np.concatenate([rng.uniform(-5, 5, (C, 2)),
                        np.full((C, 1), 20.0)], 1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    cam_id, pt_id = _obs_table(C, P, O, local, rng)
    tp_cap = int(np.bincount(pt_id).max())
    tp_cap = -(-tp_cap // 4) * 4
    wc = segsum.compute_cam_window(pt_id, cam_id, P, C, tp_cap)
    print(f"local={local}: tp_cap={tp_cap} cam_window={wc}")
    Xc = X[pt_id] + t[cam_id]
    uv = ((Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.asarray([320.0, 240.0])
          + 0.5 * rng.standard_normal((O, 2))).astype(np.float32)
    intr = np.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0]], np.float32)
    fixed = jnp.zeros(C, bool).at[0].set(True)
    argsba = (jnp.asarray(intr), jnp.zeros(C, jnp.int32), jnp.asarray(R),
              jnp.asarray(t), jnp.asarray(X), jnp.asarray(cam_id),
              jnp.asarray(pt_id), jnp.asarray(uv), jnp.ones(O, jnp.float32),
              fixed)
    for dense in (False, True, "windowed"):
        kw = dict(iters=iters, cg_iters=cg_iters)
        if dense:
            kw.update(tp_cap=tp_cap, dense_cg=True)
        if dense == "windowed":
            kw.update(cam_window=wc)
        t0 = time.time()
        out = lm.ba_solve(*argsba, **kw)
        _force(out[3])
        compile_s = time.time() - t0
        t0 = time.time()
        out = lm.ba_solve(*argsba, **kw)
        _force(out[3])
        dt = time.time() - t0
        print(f"ba dense_cg={dense} tp_cap={tp_cap if dense else '-'}: "
              f"{iters / dt:.2f} LM iters/s ({dt / iters * 1e3:.1f} ms/iter), "
              f"cost {float(out[3][0]):.4f}->{float(out[3][-1]):.4f}, "
              f"compile {compile_s:.1f}s")


def matvec_kernel():
    from sfmx.kernels import segsum

    P, O, C = 20000, 200000, 512
    rng = np.random.default_rng(0)
    pt_id = np.sort(rng.integers(0, P, O).astype(np.int32))
    cam_id = rng.integers(0, C, O).astype(np.int32)
    tp = int(np.bincount(pt_id).max())
    tp = -(-tp // 4) * 4
    dense = segsum.build_dense_obs(jnp.asarray(pt_id), jnp.asarray(cam_id),
                                   P, C, tp)
    pp = dense.rows.shape[1]
    Wp = jnp.asarray(rng.standard_normal((tp * 18, pp)), jnp.float32)
    Vinv = jnp.asarray(rng.standard_normal((16, pp)), jnp.float32)
    cp = -(-C // 128) * 128
    x8 = jnp.asarray(rng.standard_normal((8, cp)), jnp.float32)
    out = segsum.schur_cross_matvec(Wp, dense.camp, Vinv, x8, tp=tp)
    _force(out[0])
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = segsum.schur_cross_matvec(Wp, dense.camp, Vinv, x8, tp=tp)
    _force(out[0])
    dt = (time.time() - t0) / reps
    nbytes = (Wp.nbytes + dense.camp.nbytes + Vinv.nbytes + 8 * pp * 4
              + out[1].size * 4 + 2 * x8.nbytes)
    print(f"matvec kernel tp={tp} pp={pp}: {dt * 1e3:.3f} ms, "
          f"{nbytes / dt / 1e9:.1f} GB/s ({nbytes / 1e6:.1f} MB)")


def matcher():
    from sfmx.kernels import features, matching

    C, K, D = 64, 512, features.N_FLOAT_DIM
    rng = np.random.default_rng(0)
    descs = rng.standard_normal((C, K, D)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    masks = np.ones((C, K), bool)
    npairs = 512
    pairs = rng.integers(0, C, (npairs, 2)).astype(np.int32)
    descs, masks, pairs = map(jnp.asarray, (descs, masks, pairs))
    for kernel in ("dense", "pallas"):
        fn = jax.jit(lambda d, m, p, k=kernel: matching.match_pairs_float_auto(
            d, m, p, kernel=k))
        out = fn(descs, masks, pairs)
        _force(out.score)
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            out = fn(descs, masks, pairs)
        _force(out.score)
        dt = (time.time() - t0) / reps
        flops = npairs * 2.0 * K * K * D
        print(f"matcher kernel={kernel}: {npairs / dt:.0f} pairs/s, "
              f"{flops / dt / 1e12:.3f} TFLOP/s")


def streaming_localize():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_map
    from sfmx.localize.localize import localize_batch_streaming

    B, K = 16, 512
    lmap = _example_map(P=100_352, C=512, D=128, Kc=256)
    lmap = jax.device_put(lmap)
    rng = np.random.default_rng(1)
    q_desc = rng.standard_normal((B, K, 128)).astype(np.float32)
    q_desc /= np.linalg.norm(q_desc, axis=-1, keepdims=True)
    q_uv = rng.uniform(0, 640, (B, K, 2)).astype(np.float32)
    q_mask = np.ones((B, K), bool)
    intr = jnp.asarray([560.0, 560.0, 320.0, 240.0, 0, 0, 0], jnp.float32)
    fn = jax.jit(lambda d, u, m, k: localize_batch_streaming(
        lmap, d, u, m, intr, k, k_hypotheses=512))
    args = (jnp.asarray(q_desc), jnp.asarray(q_uv), jnp.asarray(q_mask))
    t0 = time.time()
    out = fn(*args, jax.random.PRNGKey(0))
    _force(out.confidence)
    compile_s = time.time() - t0
    reps = 5
    t0 = time.time()
    for i in range(reps):
        out = fn(*args, jax.random.PRNGKey(i))
    _force(out.confidence)
    dt = (time.time() - t0) / reps
    print(f"streaming localize (P=100352): {B / dt:.1f} q/s, "
          f"compile {compile_s:.1f}s")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    ba_dense()
    matvec_kernel()
    matcher()
    streaming_localize()
