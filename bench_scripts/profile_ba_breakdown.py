"""Per-stage timing of one BA LM iteration at config-3 scale.

Answers: where do the 190 ms/LM-iter go — Jacobians, assembly, Schur
reduction, or the 30 PCG iterations?  Drives the kernel-attack priorities
(VERDICT r2 item 1).

Run: python bench_scripts/profile_ba_breakdown.py [--platform cpu]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

p = argparse.ArgumentParser()
p.add_argument("--platform", default=None)
p.add_argument("--cg", type=int, default=30)
args = p.parse_args()

import jax  # noqa: E402

if args.platform:
    jax.config.update("jax_platforms", args.platform)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402

from sfmx.solvers import lm, schur  # noqa: E402


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))


def timeit(fn, *a, reps=5, **kw):
    out = fn(*a, **kw)
    _force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a, **kw)
    _force(out)
    return (time.time() - t0) / reps, out


def main():
    C, P, O = 512, 20000, 200000
    rng = np.random.default_rng(0)
    X = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    t = np.concatenate([rng.uniform(-5, 5, (C, 2)),
                        np.full((C, 1), 20.0)], 1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    cam_id = rng.integers(0, C, O).astype(np.int32)
    # bounded track lengths (exactly O/P obs per point): production obs
    # tables are track-capped by the track builder (max_track_views)
    pt_id = np.repeat(np.arange(P, dtype=np.int32), O // P)
    Xc = X[pt_id] + t[cam_id]
    uv = ((Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.asarray([320.0, 240.0])
          + 0.5 * rng.standard_normal((O, 2))).astype(np.float32)
    intr = jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0]], np.float32)
    k_idx = jnp.zeros(C, jnp.int32)
    w = jnp.ones(O, jnp.float32)
    fixed = jnp.zeros(C, bool).at[0].set(True)
    R, t, X = jnp.asarray(R), jnp.asarray(t), jnp.asarray(X)
    cam_id, pt_id, uv = jnp.asarray(cam_id), jnp.asarray(pt_id), jnp.asarray(uv)

    out = {}

    jac = jax.jit(lm._jacobians_planes)
    dt, (r, Jc, Jp) = timeit(jac, intr, k_idx, R, t, X, cam_id, pt_id, uv)
    out["jacobians_ms"] = round(dt * 1e3, 2)

    asm = jax.jit(lambda Jc, Jp, r, w: schur.assemble_planes(
        Jc, Jp, r, w, cam_id, pt_id, C, P, pt_sorted=True))
    dt, nb = timeit(asm, Jc, Jp, r, w)
    out["assemble_ms"] = round(dt * 1e3, 2)

    red = jax.jit(lambda nb: schur.reduce_system_planes(nb, 1e-4,
                                                        pt_sorted=True))
    dt, sysp = timeit(red, nb)
    out["reduce_ms"] = round(dt * 1e3, 2)

    for n in (1, args.cg):
        pcg = jax.jit(lambda s: schur.pcg_planes(
            s, iters=n, fixed_cam_mask=fixed, pt_sorted=True))
        dt, _ = timeit(pcg, sysp)
        out[f"pcg{n}_ms"] = round(dt * 1e3, 2)
    per_cg = (out[f"pcg{args.cg}_ms"] - out["pcg1_ms"]) / (args.cg - 1)
    out["per_cg_iter_ms"] = round(per_cg, 3)

    # dense point-major CG with the fused Pallas matvec (kernels/segsum.py)
    from sfmx.kernels import segsum

    tp_cap = int(O // P + 2)
    dense = jax.jit(lambda p, c: segsum.build_dense_obs(p, c, P, C, tp_cap),
                    static_argnames=())(pt_id, cam_id)
    nbp = jax.jit(lambda Jc, Jp, r, w: schur.assemble_planes(
        Jc, Jp, r, w, cam_id, pt_id, C, P, pt_sorted=True))(Jc, Jp, r, w)
    redd = jax.jit(lambda nb, d: schur.reduce_system_dense(nb, d, 1e-4))
    dt, sysd = timeit(redd, nbp, dense)
    out["reduce_dense_ms"] = round(dt * 1e3, 2)
    for n in (1, args.cg):
        pcgd = jax.jit(lambda s: schur.pcg_dense(
            s, iters=n, fixed_cam_mask=fixed))
        dt, _ = timeit(pcgd, sysd)
        out[f"pcg_dense{n}_ms"] = round(dt * 1e3, 2)
    per_cg_d = (out[f"pcg_dense{args.cg}_ms"] - out["pcg_dense1_ms"]) \
        / (args.cg - 1)
    out["per_cg_iter_dense_ms"] = round(per_cg_d, 3)
    dxz = jnp.zeros((C, 6), jnp.float32)
    sold = jax.jit(lambda s, dx_: schur.solve_points_dense(s, dx_))
    dt, _ = timeit(sold, sysd, dxz)
    out["backsub_dense_ms"] = round(dt * 1e3, 2)

    ba_d = lambda: lm.ba_solve(intr, k_idx, R, t, X, cam_id, pt_id, uv, w,
                               fixed, iters=5, cg_iters=args.cg,
                               tp_cap=tp_cap, dense_cg=True)
    dt, outs = timeit(ba_d, reps=2)
    out["full_lm_iter_dense_ms"] = round(dt / 5 * 1e3, 2)
    out["dense_final_cost"] = float(np.asarray(outs[3])[-1])

    sol = jax.jit(lambda s, dx: schur.solve_points_planes(s, dx,
                                                          pt_sorted=True))
    dx = jnp.zeros((C, 6), jnp.float32)
    dt, _ = timeit(sol, sysp, dx)
    out["backsub_ms"] = round(dt * 1e3, 2)

    # full LM iteration for reference (includes 4-point line search)
    ba = lambda: lm.ba_solve(intr, k_idx, R, t, X, cam_id, pt_id, uv, w,
                             fixed, iters=5, cg_iters=args.cg)
    dt, outs_p = timeit(ba, reps=2)
    out["full_lm_iter_ms"] = round(dt / 5 * 1e3, 2)
    out["final_cost"] = float(np.asarray(outs_p[3])[-1])
    out["backend"] = jax.default_backend()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
