"""Debug subsystem (SURVEY §5.2): checkify wrappers + NaN trapping."""
import jax.numpy as jnp
import numpy as np
import pytest

from sfmx.utils.debug import SfmxNumericalError, checked


def test_checked_passes_clean_function():
    @checked
    def f(x):
        return jnp.sqrt(x) + 1.0

    out = f(jnp.asarray([1.0, 4.0]))
    np.testing.assert_allclose(np.asarray(out), [2.0, 3.0])


def test_checked_catches_nan():
    @checked
    def f(x):
        return jnp.sqrt(x)  # NaN for negative input

    with pytest.raises(SfmxNumericalError):
        f(jnp.asarray([-1.0]))


def test_checked_solver_entrypoint_clean():
    """A real solver stays NaN-clean under checkify (CI debug gate)."""
    from sfmx.solvers import triangulate

    rng = np.random.default_rng(0)
    X = jnp.asarray([1.0, 0.5, 4.0])
    R1 = jnp.eye(3); t1 = jnp.zeros(3)
    R2 = jnp.eye(3); t2 = jnp.asarray([-1.0, 0.0, 0.0])
    x1 = (X / X[2])[:2][None]          # (1,2)
    Xc2 = X + t2
    x2 = (Xc2 / Xc2[2])[:2][None]
    f = checked(lambda: triangulate.triangulate_two_view(R1, t1, R2, t2, x1, x2))
    Xt, ok = f()
    assert bool(np.asarray(ok)[0])
    np.testing.assert_allclose(np.asarray(Xt)[0], np.asarray(X), atol=1e-4)
