"""BA checkpoint/resume + fault injection (SURVEY §5.3)."""
import numpy as np
import pytest
import jax.numpy as jnp

from sfmx.solvers import ba_ckpt, lm

from .synthetic import make_scene
from .test_ba import build_obs_table


def _problem():
    sc = make_scene(n_cams=6, n_points=60, noise_px=0.3)
    cam_id, pt_id, uv, w = build_obs_table(sc)
    intr = jnp.asarray(sc.intrinsics, jnp.float32)[None]
    k_idx = jnp.zeros(6, jnp.int32)
    fixed = jnp.zeros(6, bool).at[0].set(True)
    # perturb
    R0 = jnp.asarray(sc.Rs, jnp.float32)
    t0 = jnp.asarray(sc.ts, jnp.float32) + 0.05
    X0 = jnp.asarray(sc.points, jnp.float32) + 0.05
    return (intr, k_idx, R0, t0, X0, cam_id, pt_id, jnp.asarray(uv),
            jnp.asarray(w), fixed)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    args = _problem()
    p1 = tmp_path / "a.ckpt.npz"
    R_a, t_a, X_a, costs_a, ran_a = ba_ckpt.ba_solve_checkpointed(
        *args, total_iters=12, ckpt_every=4, ckpt_path=p1, cg_iters=20)
    assert ran_a == 12

    # simulate a crash: run only the first chunk, then "resume" from disk
    p2 = tmp_path / "b.ckpt.npz"
    ba_ckpt.ba_solve_checkpointed(*args, total_iters=4, ckpt_every=4,
                                  ckpt_path=p2, cg_iters=20)
    # process dies here; a new run resumes from p2
    R_b, t_b, X_b, costs_b, ran_b = ba_ckpt.ba_solve_checkpointed(
        *args, total_iters=12, ckpt_every=4, ckpt_path=p2, cg_iters=20)
    assert ran_b == 8  # only the remaining iterations ran

    # resumed and uninterrupted solves agree (same chunking => same math;
    # lambda restart at chunk boundaries makes them bitwise-comparable)
    final_a = lm.reprojection_rmse(args[0], args[1], R_a, t_a, X_a,
                                   args[5], args[6], args[7], args[8])
    final_b = lm.reprojection_rmse(args[0], args[1], R_b, t_b, X_b,
                                   args[5], args[6], args[7], args[8])
    np.testing.assert_allclose(float(final_a), float(final_b), rtol=1e-3)


def test_ckpt_roundtrip(tmp_path):
    p = tmp_path / "c.npz"
    R = np.random.default_rng(0).standard_normal((4, 3, 3)).astype(np.float32)
    ba_ckpt.save_ckpt(p, R, R[:, 0], R[:, :, 0], 3e-4, 7)
    R2, t2, X2, lam, it = ba_ckpt.load_ckpt(p)
    np.testing.assert_array_equal(np.asarray(R2), R)
    assert lam == np.float32(3e-4) and it == 7


@pytest.mark.slow
def test_sigkill_fault_injection(tmp_path):
    """Real fault injection (SURVEY §5.3): SIGKILL a BA worker mid-solve,
    restart it, assert it resumes from the checkpoint and converges."""
    import os
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    worker = textwrap.dedent("""
        import os, sys, time
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import numpy as np
        import sfmx.solvers.ba_ckpt as bc
        from tests.test_ckpt import _problem

        ckpt = sys.argv[1]
        slow = len(sys.argv) > 2 and sys.argv[2] == "slow"
        orig_save = bc.save_ckpt
        def save_and_maybe_stall(*a, **kw):
            orig_save(*a, **kw)
            if slow:
                print("CKPT_WRITTEN", flush=True)
                time.sleep(60)   # window for the kill
        bc.save_ckpt = save_and_maybe_stall
        args = _problem()
        R, t, X, costs, ran = bc.ba_solve_checkpointed(
            *args, total_iters=12, ckpt_every=4, ckpt_path=ckpt, cg_iters=10)
        c = np.asarray(costs)
        print("RAN", ran, "FIRST", float(c[0]), "FINAL", float(c[-1]), flush=True)
    """)
    script = tmp_path / "worker.py"
    script.write_text(worker)
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))})
    ckpt = str(tmp_path / "ba.ckpt.npz")

    # run 1: stalls after the first checkpoint write; SIGKILL it there
    p = subprocess.Popen([sys.executable, str(script), ckpt, "slow"], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    t0 = time.time()
    line = ""
    while time.time() - t0 < 240:
        line = p.stdout.readline()
        if "CKPT_WRITTEN" in line:
            break
    try:
        assert "CKPT_WRITTEN" in line, "worker never wrote a checkpoint"
        assert os.path.exists(ckpt)
    finally:
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=30)

    # run 2: must resume from the checkpoint (ran < 12) and finish
    out = subprocess.run([sys.executable, str(script), ckpt], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    toks = out.stdout.split()
    ran = int(toks[toks.index("RAN") + 1])
    first = float(toks[toks.index("FIRST") + 1])
    final = float(toks[toks.index("FINAL") + 1])
    assert ran == 8, f"did not resume from checkpoint: ran {ran}"
    assert np.isfinite(final) and final <= first, (first, final)


@pytest.mark.slow
def test_sigkill_block_ba_resume(tmp_path):
    """SIGKILL a POINT-SHARDED block-BA worker mid-solve on the 8-device
    mesh, restart it, assert it resumes from the checkpoint and converges
    to the uninterrupted chunked result (SURVEY §5.3 distributed story)."""
    import os
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    worker = textwrap.dedent("""
        import os, sys, time
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import numpy as np
        import sfmx.solvers.ba_ckpt as bc
        from sfmx.dist import block_ba, mesh as meshlib
        from tests.test_block_ba import _corridor

        ckpt = sys.argv[1]
        slow = len(sys.argv) > 2 and sys.argv[2] == "slow"
        orig_save = bc.save_ckpt
        def save_and_maybe_stall(*a, **kw):
            orig_save(*a, **kw)
            if slow:
                print("CKPT_WRITTEN", flush=True)
                time.sleep(60)   # window for the kill
        bc.save_ckpt = save_and_maybe_stall  # block_ba resolves it by module attr
        mesh = meshlib.make_mesh(block_ba.AXIS)
        intr, R, t, X, cam_id, pt_id, uv, w = _corridor(C=32, P=800, obs_per_cam=40)
        rng = np.random.default_rng(5)
        X0 = X + 0.05 * rng.standard_normal(X.shape).astype(np.float32)
        t0 = t + 0.02 * rng.standard_normal(t.shape).astype(np.float32)
        fixed = np.zeros(len(R), bool); fixed[0] = True
        Rg, tg, Xg, costs, stats = block_ba.ba_solve_blocked(
            intr, np.zeros(len(R), np.int32), R, t0, X0, cam_id, pt_id, uv,
            w, fixed, mesh, iters=8, cg_iters=20, ckpt_path=ckpt, ckpt_every=4)
        c = np.asarray(costs)
        _, _, _, lam, it = bc.load_ckpt(ckpt)
        print("IT", it, "NCOSTS", len(c), "FIRST", float(c[0]),
              "FINAL", float(c[-1]), flush=True)
    """)
    script = tmp_path / "block_worker.py"
    script.write_text(worker)
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))})
    ckpt = str(tmp_path / "blockba.ckpt.npz")

    # run 1: stalls after the first chunk's checkpoint; SIGKILL it there
    p = subprocess.Popen([sys.executable, str(script), ckpt, "slow"], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    t0 = time.time()
    line = ""
    while time.time() - t0 < 300:
        line = p.stdout.readline()
        if "CKPT_WRITTEN" in line:
            break
    try:
        assert "CKPT_WRITTEN" in line, "worker never wrote a checkpoint"
        assert os.path.exists(ckpt)
    finally:
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=30)

    # run 2: must resume from the checkpoint (only the second chunk runs)
    out = subprocess.run([sys.executable, str(script), ckpt], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    toks = out.stdout.split()
    ncosts = int(toks[toks.index("NCOSTS") + 1])
    first = float(toks[toks.index("FIRST") + 1])
    final = float(toks[toks.index("FINAL") + 1])
    assert ncosts == 5, f"did not resume from checkpoint: {ncosts} costs"
    assert np.isfinite(final) and final <= first, (first, final)
