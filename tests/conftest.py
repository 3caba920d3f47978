"""Test configuration: force CPU backend with an 8-device virtual mesh.

This runs before any test module imports jax/gpmpc_tpu. The environment may
pre-register a remote-TPU PJRT plugin via sitecustomize (JAX_PLATFORMS=axon);
``jax.config.update('jax_platforms', 'cpu')`` after the jax import overrides
it, and the XLA_FLAGS tweak (set before the import) gives the sharding tests
8 virtual CPU devices.
"""

import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is compile-bound (L-BFGS scan +
# unrolled rollout + vjp programs); re-runs hit the disk cache.
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
