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
# NO persistent compilation cache on CPU: jaxlib 0.9.0's XLA:CPU AOT cache
# entries are written with the prefer-no-scatter/prefer-no-gather tuning
# pseudo-features in the target-machine list, and the loader's host-feature
# check then REJECTS every entry (cpu_aot_loader "Target machine feature
# +prefer-no-scatter is not supported on the host machine") at ~1.2 s of
# logging/retry per executable load — measured turning each eager primitive
# into ~1 s and a 30 s test into a >500 s hang. Recompiling per run is far
# cheaper than the broken reload path. (TPU scripts keep their cache —
# .jax_cache — where Mosaic compiles are minutes and reload works.)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
