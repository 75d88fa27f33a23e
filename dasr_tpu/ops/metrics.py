"""Quality metrics: PSNR, SSIM (MATLAB-equivalent), YCbCr conversions, modcrop.

Numerics match the reference's host-side metric kernels:
  * PSNR on [0,255] arrays (reference: codes/SRN/utils/util.py:240-247)
  * SSIM with an 11x11 gaussian window, sigma 1.5, valid-cropped 5px border
    (reference: codes/SRN/utils/util.py:250-291 — note the reference's
    3-channel path averages the *full-color* ssim three times, which equals
    the per-channel mean; we compute that directly)
  * MATLAB rgb2ycbcr / bgr2ycbcr / ycbcr2rgb (reference: codes/SRN/data/
    util.py:145-210)

Both a numpy (host, float64 — exact parity with the reference) and a jnp
(device, batched, jit-friendly) SSIM/PSNR are provided; evaluation CLIs use
the numpy path for bit-parity, training val loops use the device path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import correlate


@functools.lru_cache(maxsize=8)
def _ssim_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel(size, sigma) outer product."""
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR on [0,255] images (reference: SRN/utils/util.py:240-247)."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _valid_filter(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Valid-region gaussian filtering of HW or HWC float64 arrays."""
    if img.ndim == 3:
        out = np.stack(
            [correlate(img[:, :, c], window)[5:-5, 5:-5] for c in range(img.shape[2])],
            axis=2,
        )
        return out
    return correlate(img, window)[5:-5, 5:-5]


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    window = _ssim_window()
    mu1 = _valid_filter(img1, window)
    mu2 = _valid_filter(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _valid_filter(img1**2, window) - mu1_sq
    sigma2_sq = _valid_filter(img2**2, window) - mu2_sq
    sigma12 = _valid_filter(img1 * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-equivalent SSIM on [0,255] images (SRN/utils/util.py:273-291)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            return _ssim_single(img1, img2)
        if img1.shape[2] == 1:
            return _ssim_single(img1[:, :, 0], img2[:, :, 0])
    raise ValueError("Wrong input image dimensions.")


# ---------------------------------------------------------------------------
# Device-side (jit/batch-friendly) variants
# ---------------------------------------------------------------------------


@jax.jit
def psnr_device(img1: jax.Array, img2: jax.Array, peak: float = 1.0) -> jax.Array:
    """Batched PSNR over ...HWC in [0, peak]; returns per-image values."""
    axes = tuple(range(img1.ndim - 3, img1.ndim))
    mse = jnp.mean((img1 - img2) ** 2, axis=axes)
    return 20.0 * jnp.log10(peak) - 10.0 * jnp.log10(mse)


@jax.jit
def ssim_device(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Batched SSIM over NHWC in [0,255] (bf16-safe: computed in f32)."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    w = jnp.asarray(_ssim_window(), dtype=jnp.float32)

    def filt(x):
        c = x.shape[-1]
        k = jnp.tile(w[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x,
            k,
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1, mu2 = filt(x), filt(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = filt(x * x) - mu1_sq
    s2 = filt(y * y) - mu2_sq
    s12 = filt(x * y) - mu1_mu2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# Masked (shape-bucketed) device metrics: images are zero-padded to a shared
# bucket shape so varied-size pairs reuse ONE compiled program; the true
# (h, w) arrive as dynamic scalars. EXACT, not approximate — PSNR/mean sums
# are masked, and SSIM's VALID-conv map positions that fit entirely inside
# the original image never read a padded pixel.
# ---------------------------------------------------------------------------


def _hw_mask(H: int, W: int, h, w):
    rows = jnp.arange(H)[:, None] < h
    cols = jnp.arange(W)[None, :] < w
    return (rows & cols)[None, :, :, None].astype(jnp.float32)


def psnr_device_masked(img1, img2, h, w, peak: float = 1.0):
    """Batched PSNR over NHWC zero-padded images; true size (h, w)."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mask = _hw_mask(x.shape[-3], x.shape[-2], h, w)
    sse = jnp.sum(((x - y) ** 2) * mask, axis=(-3, -2, -1))
    mse = sse / jnp.asarray(h * w * x.shape[-1], jnp.float32)
    return 20.0 * jnp.log10(peak) - 10.0 * jnp.log10(mse)


def mean_color_device_masked(img, h, w):
    """Per-channel spatial mean of a zero-padded NHWC image (for PSNR_col)."""
    x = img.astype(jnp.float32)
    mask = _hw_mask(x.shape[-3], x.shape[-2], h, w)
    return jnp.sum(x * mask, axis=(-3, -2)) / jnp.asarray(h * w, jnp.float32)


def ssim_device_masked(img1, img2, h, w):
    """Batched SSIM over zero-padded NHWC in [0,255]; true size (h, w).

    Identical to ``ssim_device`` on the unpadded image: the 11x11 VALID
    window means map position (i, j) depends only on pixels
    [i:i+11, j:j+11], so positions with i <= h-11 and j <= w-11 are
    untouched by padding; the mean runs over exactly those."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    w_k = jnp.asarray(_ssim_window(), dtype=jnp.float32)

    def filt(x):
        c = x.shape[-1]
        k = jnp.tile(w_k[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1, mu2 = filt(x), filt(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = filt(x * x) - mu1_sq
    s2 = filt(y * y) - mu2_sq
    s12 = filt(x * y) - mu1_mu2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    k = w_k.shape[0]  # 11
    oh, ow = h - (k - 1), w - (k - 1)
    mask = _hw_mask(m.shape[-3], m.shape[-2], oh, ow)
    return jnp.sum(m * mask, axis=(1, 2, 3)) / jnp.asarray(
        oh * ow * m.shape[-1], jnp.float32
    )


# ---------------------------------------------------------------------------
# Color conversions (MATLAB parity, host numpy)
# ---------------------------------------------------------------------------

_Y_RGB = np.array([65.481, 128.553, 24.966])
_FULL_RGB = np.array(
    [[65.481, -37.797, 112.0], [128.553, -74.203, -93.786], [24.966, 112.0, -18.214]]
)


def _ycbcr(img: np.ndarray, coef_y: np.ndarray, coef_full: np.ndarray, only_y: bool):
    in_type = img.dtype
    img = img.astype(np.float64)
    if in_type != np.uint8:
        img = img * 255.0
    if only_y:
        rlt = img @ coef_y / 255.0 + 16.0
    else:
        rlt = img @ coef_full / 255.0 + np.array([16, 128, 128])
    if in_type == np.uint8:
        rlt = rlt.round()
    else:
        rlt = rlt / 255.0
    return rlt.astype(in_type)


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """MATLAB rgb2ycbcr (reference: SRN/data/util.py:145-166)."""
    return _ycbcr(img, _Y_RGB, _FULL_RGB, only_y)


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """BGR variant (reference: SRN/data/util.py:169-190)."""
    return _ycbcr(img, _Y_RGB[::-1], _FULL_RGB[::-1], only_y)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """MATLAB ycbcr2rgb (reference: SRN/data/util.py:193-210)."""
    in_type = img.dtype
    x = img.astype(np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    mat = np.array(
        [
            [0.00456621, 0.00456621, 0.00456621],
            [0, -0.00153632, 0.00791071],
            [0.00625893, -0.00318811, 0],
        ]
    )
    rlt = x @ mat * 255.0 + np.array([-222.921, 135.576, -276.836])
    if in_type == np.uint8:
        rlt = rlt.round()
    else:
        rlt = rlt / 255.0
    return rlt.astype(in_type)


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W to multiples of scale (reference: SRN/data/util.py:213-226)."""
    h, w = img.shape[0], img.shape[1]
    return img[: h - h % scale, : w - w % scale, ...]
