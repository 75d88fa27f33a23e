from dasr_tpu.core import config, mesh, prng  # noqa: F401
