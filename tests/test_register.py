"""Verified sim3 registration (recon/register.py): recovery, gates, loud
failure on unregistrable inputs (VERDICT r4 item 1)."""
import jax
import numpy as np
import pytest

from sfmx.recon.register import (
    RegistrationError,
    register_landmarks_verified,
    register_points_verified,
)

from .synthetic import make_scene
from .test_merge import _session


def _rand_sim3(rng):
    s = float(rng.uniform(0.5, 2.0))
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.uniform(-3, 3, 3)
    return s, Q, t


def test_register_points_verified_recovers():
    rng = np.random.default_rng(3)
    Pb = rng.uniform(-2, 2, (200, 3)).astype(np.float32)
    s, R, t = _rand_sim3(rng)
    Pa = (s * (Pb @ R.T) + t).astype(np.float32)
    Pa += rng.normal(scale=0.002, size=Pa.shape).astype(np.float32)
    # 20% outliers
    out = rng.random(200) < 0.2
    Pa[out] = rng.uniform(-5, 5, (int(out.sum()), 3))
    reg = register_points_verified(Pa, Pb, key=jax.random.PRNGKey(0))
    assert abs(reg.s / s - 1.0) < 0.02
    assert np.allclose(reg.R, R, atol=0.02)
    assert reg.inliers.sum() >= 0.7 * (~out).sum()
    # recovered transform maps inliers onto their targets
    err = np.linalg.norm(
        reg.s * (Pb[reg.inliers] @ reg.R.T) + reg.t - Pa[reg.inliers], axis=1)
    assert np.median(err) < 0.05


def test_register_points_verified_rejects_garbage():
    rng = np.random.default_rng(4)
    Pa = rng.uniform(-2, 2, (120, 3)).astype(np.float32)
    Pb = rng.uniform(-2, 2, (120, 3)).astype(np.float32)  # unrelated
    with pytest.raises(RegistrationError) as ei:
        register_points_verified(Pa, Pb, key=jax.random.PRNGKey(1))
    assert ei.value.attempts  # diagnostics attached


def test_register_points_verified_too_few():
    with pytest.raises(RegistrationError):
        register_points_verified(np.zeros((2, 3), np.float32),
                                 np.zeros((2, 3), np.float32))


@pytest.fixture(scope="module")
def disjoint_sessions():
    """Two sessions of DIFFERENT worlds with unrelated descriptor universes
    — there is no overlap, and registration must refuse, not hallucinate."""
    rng = np.random.default_rng(0)
    sc1 = make_scene(n_cams=8, n_points=300, noise_px=0.3, seed=5,
                     arc_deg=150.0)
    sc2 = make_scene(n_cams=8, n_points=300, noise_px=0.3, seed=17,
                     arc_deg=150.0)
    s1 = _session(sc1, (0, 8), rng, base_desc_seed=99)
    s2 = _session(sc2, (0, 8), rng, base_desc_seed=123)
    return s1, s2


def test_register_landmarks_rejects_overlap_free_pair(disjoint_sessions):
    s1, s2 = disjoint_sessions
    from sfmx.recon.merge import landmark_descriptors

    d1 = landmark_descriptors(s1[0], s1[1], s1[4])
    d2 = landmark_descriptors(s2[0], s2[1], s2[4])
    with pytest.raises(RegistrationError):
        register_landmarks_verified(
            np.array(s1[0].X), d1, np.array(s1[0].X_alive),
            np.array(s2[0].X), d2, np.array(s2[0].X_alive),
            key=jax.random.PRNGKey(0))


def test_merge_scenes_disjoint_raises(disjoint_sessions):
    """merge_scenes must raise (graph disconnected), never silently ship a
    map stitched from unverifiable registrations."""
    from sfmx.recon.merge import merge_scenes

    s1, s2 = disjoint_sessions
    with pytest.raises(RegistrationError, match="disconnected|verification"):
        merge_scenes([s1, s2])


def _rand_rot(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_register_rigid_anchored_thin_region():
    """Rotation-anchored fusion: exact on a THIN shared region (corridor
    doorway) where point-only Umeyama is rotation-degenerate."""
    from sfmx.recon.register import register_rigid_anchored

    rng = np.random.default_rng(7)
    s, R, t = _rand_sim3(rng)
    # shared points clustered in a 0.3 m ball 10 m from the origin
    Pb = (rng.standard_normal((40, 3)) * 0.1 + np.array([10.0, 0, 0]))
    Pa = s * (Pb @ R.T) + t + 0.003 * rng.standard_normal((40, 3))
    # shared cameras: same rigid relation on their orientations
    Rb_c = np.stack([_rand_rot(rng) for _ in range(6)])
    Ra_c = np.einsum("cij,kj->cik", Rb_c, R)  # R_a = R_b R^T  (R_a^T R_b = R)
    reg = register_rigid_anchored(Ra_c, Rb_c, Pa, Pb)
    assert abs(reg.s / s - 1.0) < 0.01
    assert np.allclose(reg.R, R, atol=5e-3), np.abs(reg.R - R).max()
    err = np.linalg.norm(reg.s * (Pb @ reg.R.T) + reg.t - Pa, axis=1)
    assert np.median(err) < 0.02


def test_register_rigid_anchored_outlier_rotation():
    """One corrupted shared camera must be rejected by the rotation mode."""
    from sfmx.recon.register import register_rigid_anchored

    rng = np.random.default_rng(8)
    s, R, t = _rand_sim3(rng)
    Pb = rng.standard_normal((30, 3))
    Pa = s * (Pb @ R.T) + t
    Rb_c = np.stack([_rand_rot(rng) for _ in range(5)])
    Ra_c = np.einsum("cij,kj->cik", Rb_c, R)
    Ra_c[0] = _rand_rot(rng)  # corrupted
    reg = register_rigid_anchored(Ra_c, Rb_c, Pa, Pb)
    assert reg.diag["rot_inliers"] == 4
    assert np.allclose(reg.R, R, atol=1e-2)


def test_register_rigid_anchored_rejects_disagreement():
    from sfmx.recon.register import register_rigid_anchored

    rng = np.random.default_rng(9)
    Pa = rng.standard_normal((30, 3))
    Pb = rng.standard_normal((30, 3))
    Ra_c = np.stack([_rand_rot(rng) for _ in range(5)])
    Rb_c = np.stack([_rand_rot(rng) for _ in range(5)])  # unrelated
    with pytest.raises(RegistrationError):
        register_rigid_anchored(Ra_c, Rb_c, Pa, Pb)
