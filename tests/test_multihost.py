"""Multi-host bootstrap (SURVEY §4.2.4/§5.8): 2 processes over loopback.

Exercises jax.distributed.initialize + the obs-sharded BA collectives across
process boundaries — the code path configs 4-5 use across real hosts.  Runs
two CPU subprocesses (4 virtual devices each -> an 8-device global mesh).
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="localhost:12421",
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sfmx.dist import dist_ba, mesh as meshlib
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == 2

    mesh = meshlib.make_mesh("obs")
    rng = np.random.default_rng(0)
    C, Pn, O = 6, 48, 64
    intr = jnp.asarray([[100.0, 100.0, 32.0, 24.0, 0, 0, 0]], jnp.float32)
    k_idx = jnp.zeros(C, jnp.int32)
    X = jnp.asarray(rng.uniform(-1, 1, (Pn, 3)), jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3))
    t = jnp.asarray(np.concatenate([rng.uniform(-0.2, 0.2, (C, 2)),
                                    np.full((C, 1), 4.0)], 1), jnp.float32)
    cam_id = rng.integers(0, C, O).astype(np.int32)
    pt_id = rng.integers(0, Pn, O).astype(np.int32)
    Xc = np.asarray(X)[pt_id] + np.asarray(t)[cam_id]
    uv = (Xc[:, :2] / Xc[:, 2:3]) * 100.0 + np.asarray([32.0, 24.0])
    w = np.ones(O, np.float32)
    fixed = jnp.zeros(C, bool).at[0].set(True)

    sh = NamedSharding(mesh, P("obs"))
    def put(x):
        x = jnp.asarray(x)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    cam_id_s, pt_id_s = put(cam_id), put(pt_id)
    uv_s, w_s = put(uv.astype(np.float32)), put(w)

    step = dist_ba.make_ba_step(mesh, iters=2, cg_iters=5)
    R1, t1, X1, costs = step(intr, k_idx, R, t, X, cam_id_s, pt_id_s, uv_s, w_s, fixed)
    costs = np.asarray(costs)
    assert np.isfinite(costs).all(), costs
    assert costs[-1] <= costs[0] * 1.01, costs
    print(f"proc {pid} OK costs={costs.tolist()}")
""")


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PALLAS_AXON_POOL_IPS": "",   # keep the TPU relay out of subprocesses
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    })
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
