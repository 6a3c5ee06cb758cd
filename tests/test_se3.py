"""Golden tests for SO(3)/SE(3) vs scipy.spatial.transform (SURVEY §4.2.1)."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsc

from sfmx.core import se3


def random_rotvecs(rng, n=64):
    v = rng.normal(size=(n, 3))
    scale = rng.uniform(0.0, np.pi - 1e-3, size=(n, 1))
    return v / np.linalg.norm(v, axis=1, keepdims=True) * scale


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng).astype(np.float32)
    R = np.asarray(se3.so3_exp_b(jnp.asarray(w)))
    R_ref = Rsc.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng).astype(np.float32)
    R = Rsc.from_rotvec(w).as_matrix().astype(np.float32)
    w2 = np.asarray(se3.so3_log_b(jnp.asarray(R)))
    np.testing.assert_allclose(w2, w, atol=2e-5)


def test_so3_exp_near_zero():
    w = jnp.asarray([1e-9, -1e-9, 1e-10], dtype=jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    assert not np.any(np.isnan(np.asarray(R)))


def test_so3_log_near_pi(rng):
    axis = np.array([0.0, 1.0, 0.0])
    w = axis * (np.pi - 1e-4)
    R = Rsc.from_rotvec(w).as_matrix().astype(np.float32)
    w2 = np.asarray(se3.so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w2, w, atol=1e-3)


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng).astype(np.float32)
    R = Rsc.from_rotvec(w).as_matrix().astype(np.float32)
    q = se3.rot_to_quat_b(jnp.asarray(R))
    R2 = se3.quat_to_rot_b(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(scale=0.8, size=(32, 6)).astype(np.float32)
    for x in xi:
        R, t = se3.se3_exp(jnp.asarray(x))
        x2 = np.asarray(se3.se3_log(R, t))
        np.testing.assert_allclose(x2, x, atol=5e-4)


def test_compose_inverse(rng):
    w = random_rotvecs(rng, 2).astype(np.float32)
    R1 = Rsc.from_rotvec(w[0]).as_matrix().astype(np.float32)
    R2 = Rsc.from_rotvec(w[1]).as_matrix().astype(np.float32)
    t1 = rng.normal(size=3).astype(np.float32)
    t2 = rng.normal(size=3).astype(np.float32)
    Rc, tc = se3.compose(jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2))
    Ri, ti = se3.inverse(Rc, tc)
    Re, te = se3.compose(Ri, ti, Rc, tc)
    np.testing.assert_allclose(np.asarray(Re), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), np.zeros(3), atol=1e-5)


def test_perturb_zero_is_identity(rng):
    R = Rsc.random(rng=1).as_matrix().astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    R2, t2 = se3.perturb(jnp.asarray(R), jnp.asarray(t), jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)


def test_project_to_so3(rng):
    M = np.eye(3) + 0.1 * rng.normal(size=(3, 3))
    R = np.asarray(se3.project_to_so3(jnp.asarray(M, dtype=jnp.float32)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.9


def test_jit_vmap_composable(rng):
    w = random_rotvecs(rng, 16).astype(np.float32)
    f = jax.jit(se3.so3_exp_b)
    R = f(jnp.asarray(w))
    assert R.shape == (16, 3, 3)
