"""Test config: force CPU backend with 8 virtual devices (SURVEY.md §4.2.4).

The session image's ``sitecustomize`` imports jax and registers the axon TPU
plugin at interpreter startup, with JAX_PLATFORMS=axon bound from the
environment — so mutating ``os.environ`` here is too late.  Instead we flip
the (still-lazy) platform selection through ``jax.config`` before any backend
is initialized.  Unit tests must never touch the TPU tunnel: it serializes
across processes and turns second-long CPU tests into minutes.
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: the suite is dominated by cold XLA:CPU compiles
# (test_ba alone ~60 s).  Cached executables bring a full rerun under the
# CI timeout; first run populates the cache.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
