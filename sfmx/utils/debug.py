"""Debug mode: NaN trapping + functional error checking (SURVEY §5.2).

The reference relies on OpenMP correctness and crashes; here races are
designed out (pure functional JAX) and numerical failures are surfaced by:

  * ``SFMX_DEBUG=1`` in the environment (read at ``import sfmx``) or
    :func:`enable_debug` — turns on ``jax_debug_nans`` so any NaN produced
    inside a jitted computation raises at the op that made it (JAX re-runs
    the failing computation op-by-op outside jit).
  * :func:`checked` — wraps a function with ``jax.experimental.checkify``
    (nan + index + div checks) and raises ``SfmxNumericalError`` with the
    original check message.  Used around solver entry points in debug
    builds / CI; zero overhead when not wrapped.

CI runs the unit suite with ``SFMX_DEBUG=1`` to keep the whole numeric core
NaN-clean (see tests/test_debug.py).
"""
from __future__ import annotations

import functools
import os

import jax
from jax.experimental import checkify as _checkify


class SfmxNumericalError(RuntimeError):
    """A checkify-detected numerical fault (NaN, OOB index, div-by-zero)."""


def enable_debug(nans: bool = True) -> None:
    """Turn on op-level NaN trapping for every subsequent computation."""
    jax.config.update("jax_debug_nans", bool(nans))


def debug_enabled() -> bool:
    return os.environ.get("SFMX_DEBUG", "") not in ("", "0", "false")


def checked(fn=None, *, errors=None):
    """Wrap ``fn`` with checkify; raises SfmxNumericalError on any fault.

    Works on jitted and unjitted functions; the checked variant is compiled
    separately, so production call sites keep the unchecked executable.
    """
    if fn is None:
        return functools.partial(checked, errors=errors)
    errs = errors if errors is not None else (
        _checkify.float_checks | _checkify.index_checks | _checkify.div_checks)
    cfn = _checkify.checkify(fn, errors=errs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        try:
            _checkify.check_error(err)
        except Exception as e:  # checkify raises JaxRuntimeError subclasses
            raise SfmxNumericalError(str(e)) from e
        return out

    return wrapper


if debug_enabled():  # pragma: no cover - env-dependent
    enable_debug()
