"""Test harness: force CPU with 8 virtual devices BEFORE jax initializes.

Multi-chip sharding tests run on this virtual mesh (the SURVEY §4 plan's
replacement for multi-node fixtures); real-TPU behavior is covered by
bench.py / the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the ambient env sets 'axon'
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize imports jax and registers/initializes the
# 'axon' TPU backend before this file runs; drop those backends so the
# CPU + 8-virtual-device settings above take effect.
jax.config.update("jax_platforms", "cpu")
if jax.devices()[0].platform != "cpu" or len(jax.devices()) != 8:
    from jax.extend import backend as _jexb
    _jexb.clear_backends()
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: CPU jit compiles dominate test wall-clock.
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(704)  # the reference's manual_seed (train.py:52)
