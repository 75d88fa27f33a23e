from dasr_tpu.eval.evaluate import (  # noqa: F401
    im2tensor_range,
    sr_metrics,
    to_uint8,
)
