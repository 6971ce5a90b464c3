"""Test harness: force an 8-virtual-device CPU backend BEFORE jax imports so
distributed (shard_map / pjit) paths get real multi-device coverage without TPU
hardware (SURVEY.md §4 — we test distribution for real, unlike the reference)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The sandbox sitecustomize force-sets a TPU-relay-first jax_platforms in every
# process, which would silently route "CPU" tests over the TPU tunnel. Pin the
# config back to cpu before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: CPU compiles on this box are slow and dominate
# test wall-clock; cache them across pytest runs
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
