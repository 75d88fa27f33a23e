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
# NO persistent compile cache for the suite: on this image, XLA:CPU
# executable (de)serialization segfaults the interpreter for at least one
# of the suite's programs (SRGANTrainer.train_multi_step) once enough of
# the suite has run first — observed deterministically on both the cache
# read and the cache write path (r4; four crashes, all inside
# jax/_src/compilation_cache get/put_executable_and_time). A cold suite
# costs ~15 extra minutes; a segfaulting suite costs the round.
# The comment above is not enough by itself: CLI tests call
# utils/runtime.setup_runtime, which sets jax_compilation_cache_dir and
# re-enables caching mid-suite (r5: the full suite died with a fatal
# interpreter error once this round's CLI tests had filled the default
# cache dir). Hard-disable the cache for the whole suite; setup_runtime's
# cache_dir update is inert while this flag is False.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Periodically drop every compiled executable: with the r5 additions the
# single-process suite started segfaulting INSIDE a fresh XLA:CPU compile
# around the ~200th test (jax compiler.backend_compile_and_load, during
# test_trainers_registry — twice, same place) — classic long-lived-JIT
# resource exhaustion, not the (separately handled) cache-serialization
# crash. Clearing jax's caches every N tests bounds the number of live
# executables; cleared jits transparently recompile on next use.
_CLEAR_EVERY = 25
_test_count = [0]


@pytest.fixture(autouse=True)
def _bounded_live_executables():
    yield
    _test_count[0] += 1
    if _test_count[0] % _CLEAR_EVERY == 0:
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
