from dasr_tpu.models.registry import create_model, define_G  # noqa: F401
