"""Test config: run everything on a virtual 8-device CPU mesh.

XLA_FLAGS must be set before jax initializes a backend; the axon
sitecustomize force-registers the TPU platform, so we also override
jax_platforms via jax.config (env vars alone are ignored once
``axon.register`` has run).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-dominated on CPU too
_cache = os.path.join(os.path.expanduser("~"), ".cache", "dasr_tpu", "jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
