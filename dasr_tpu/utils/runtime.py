"""Runtime setup shared by the CLIs.

* Persistent XLA compilation cache: through the remote-TPU tunnel a single
  jit compile costs minutes; the cache makes reruns instant. Users can
  override with JAX_COMPILATION_CACHE_DIR.
* Quiet the extremely chatty orbax/absl INFO logging.
"""

from __future__ import annotations

import logging
import os


def setup_runtime(cache_dir: str = None) -> None:
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "dasr_tpu", "jax_cache"
    )
    os.makedirs(cache, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    for name in ("absl", "orbax", "orbax.checkpoint"):
        logging.getLogger(name).setLevel(logging.WARNING)
    try:
        from absl import logging as absl_logging

        absl_logging.set_verbosity(absl_logging.WARNING)
    except Exception:
        pass
