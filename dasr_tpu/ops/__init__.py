from dasr_tpu.ops.resize import imresize, bilinear_resize  # noqa: F401
from dasr_tpu.ops.dwt import haar_dwt, haar_bands, dwt_init  # noqa: F401
from dasr_tpu.ops.filters import (  # noqa: F401
    gaussian_kernel,
    filter_low,
    filter_high,
    wavelet_high_cat,
    wavelet_ll,
)
from dasr_tpu.ops.metrics import calculate_psnr, calculate_ssim, bgr2ycbcr, rgb2ycbcr  # noqa: F401
from dasr_tpu.ops.rf_splat import receptive_field, ddm_splat  # noqa: F401
from dasr_tpu.ops.tiled import tiled_apply, forward_chop  # noqa: F401
from dasr_tpu.ops.spatial_shard import spatially_sharded_apply  # noqa: F401
