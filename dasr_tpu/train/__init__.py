from dasr_tpu.train import checkpoints, schedules  # noqa: F401
