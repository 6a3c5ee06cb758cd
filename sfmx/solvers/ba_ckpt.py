"""Checkpointed bundle adjustment (SURVEY §5.3/§5.4).

The reference's only checkpoint is the serialized scene between pipeline
stages; for long multi-host BA runs this module adds LM-state checkpoints
every k iterations so a lost host resumes from the last checkpoint instead
of restarting the solve (fault-injection test kills mid-run and resumes).

State = (R, t, X, lam, iter) in a versioned npz next to the map.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

CKPT_VERSION = 1


def save_ckpt(path: str | Path, R, t, X, lam: float, it: int):
    # temp name must end in .npz or np.savez appends the extension itself
    tmp = Path(str(path) + ".tmp.npz")
    np.savez(tmp, version=CKPT_VERSION, R=np.asarray(R), t=np.asarray(t),
             X=np.asarray(X), lam=np.float32(lam), it=np.int64(it))
    tmp.replace(path)  # atomic on POSIX


def load_ckpt(path: str | Path):
    with np.load(path) as z:
        if int(z["version"]) > CKPT_VERSION:
            raise ValueError("checkpoint from a newer format")
        return (jnp.asarray(z["R"]), jnp.asarray(z["t"]), jnp.asarray(z["X"]),
                float(z["lam"]), int(z["it"]))


def ba_solve_checkpointed(
    intr, k_idx, R, t, X, cam_id, pt_id, uv, w_valid, fixed_cam_mask, *,
    total_iters: int = 40, ckpt_every: int = 10, ckpt_path: str | Path,
    cg_iters: int = 30, huber_px: float = 4.0, ba_fn=None, **ba_kwargs,
):
    """Run BA in ckpt_every-sized chunks, checkpointing between chunks.

    Resumes automatically if ckpt_path exists; the LM damping (trust-region
    state) is threaded through every chunk AND through resume, so a resumed
    solve continues exactly where the crashed one left off.

    ba_fn defaults to lm.ba_solve; a custom ba_fn must accept
    ``(intr, k_idx, R, t, X, cam_id, pt_id, uv, w_valid, fixed_cam_mask,
    iters=n, init_lambda=lam)`` and return ``(R, t, X, costs, lam)``.
    (dist.block_ba.ba_solve_blocked has checkpointing built in — pass it a
    ckpt_path directly rather than wrapping it here.)
    """
    from . import lm

    ckpt_path = Path(ckpt_path)
    start = 0
    lam = 1e-4
    if ckpt_path.exists():
        R, t, X, lam, start = load_ckpt(ckpt_path)

    costs_all = []
    it = start
    while it < total_iters:
        n = min(ckpt_every, total_iters - it)
        if ba_fn is None:
            R, t, X, costs, lam = lm.ba_solve(
                intr, k_idx, R, t, X, cam_id, pt_id, uv, w_valid,
                fixed_cam_mask, iters=n, cg_iters=cg_iters, huber_px=huber_px,
                init_lambda=lam, return_lam=True, **ba_kwargs,
            )
        else:
            R, t, X, costs, lam = ba_fn(intr, k_idx, R, t, X, cam_id, pt_id,
                                        uv, w_valid, fixed_cam_mask,
                                        iters=n, init_lambda=lam)
        lam = float(lam)
        costs_all.extend(np.asarray(costs).tolist())
        it += n
        save_ckpt(ckpt_path, R, t, X, lam, it)
    return R, t, X, np.asarray(costs_all), it - start
