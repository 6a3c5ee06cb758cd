"""Golden tests for the camera model vs direct numpy / cv2."""
import jax.numpy as jnp
import numpy as np

from sfmx.core import cameras

from .synthetic import make_scene


def test_project_matches_synthetic_oracle():
    sc = make_scene(n_cams=4, n_points=100, k1=-0.1)
    k = jnp.asarray(sc.intrinsics, dtype=jnp.float32)
    for c in range(4):
        uv, z = cameras.project(
            k, jnp.asarray(sc.Rs[c], jnp.float32), jnp.asarray(sc.ts[c], jnp.float32),
            jnp.asarray(sc.points, jnp.float32),
        )
        vis = sc.visible[c]
        np.testing.assert_allclose(np.asarray(uv)[vis], sc.uv[c][vis], atol=1e-2)
        assert np.all(np.asarray(z)[vis] > 0)


def test_undistort_roundtrip():
    k = cameras.make_intrinsics(500.0, 500.0, 320.0, 240.0, k1=-0.25, k2=0.08)
    xn = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, size=(200, 2)), jnp.float32)
    xd = cameras.distort_radial(k, xn)
    xu = cameras.undistort_radial(k, xd)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-5)


def test_pixel_to_normalized_inverts_project():
    sc = make_scene(n_cams=2, n_points=50, k1=-0.15)
    k = jnp.asarray(sc.intrinsics, dtype=jnp.float32)
    c = 1
    uv, z = cameras.project(
        k, jnp.asarray(sc.Rs[c], jnp.float32), jnp.asarray(sc.ts[c], jnp.float32),
        jnp.asarray(sc.points, jnp.float32),
    )
    xn = cameras.pixel_to_normalized(k, uv)
    Xc = sc.points @ sc.Rs[c].T + sc.ts[c]
    xn_ref = Xc[:, :2] / Xc[:, 2:3]
    vis = sc.visible[c]
    np.testing.assert_allclose(np.asarray(xn)[vis], xn_ref[vis], atol=1e-5)


def test_bearing_unit_norm():
    k = cameras.make_intrinsics(500.0, 500.0, 320.0, 240.0)
    uv = jnp.asarray([[0.0, 0.0], [320.0, 240.0], [640.0, 480.0]], jnp.float32)
    b = cameras.bearing(k, uv)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(b), axis=1), 1.0, atol=1e-6)
