"""Fixed (non-learned) frequency-separation filter bank.

TPU-native equivalents of the reference's ``GaussianFilter`` / ``FilterLow``
/ ``FilterHigh`` modules (reference: codes/DSN/model.py:227-293, duplicated
at codes/SRN/models/modules/architecture.py:1177-1244): depthwise convs and
average pools with *exactly* the reference's boundary semantics —

  * gaussian low-pass: depthwise conv with zero padding (torch Conv2d
    default), so borders darken exactly as in the reference;
  * avg-pool low-pass: ``count_include_pad=False`` (the reference passes
    ``include_pad=False`` for discriminator inputs), i.e. border windows
    average only valid pixels;
  * loss-side low-pass uses VALID padding (``padding=False`` in
    GeneratorLoss, reference: codes/DSN/loss.py:50-55).

All are stateless functions of NHWC arrays; XLA fuses them into neighbouring
work, no library call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.ops.dwt import haar_dwt


@functools.lru_cache(maxsize=16)
def gaussian_kernel(kernel_size: int = 5) -> np.ndarray:
    """2D gaussian window, reference arithmetic (DSN/model.py:230-243)."""
    mean = (kernel_size - 1) / 2.0
    variance = (kernel_size / 6.0) ** 2.0
    coords = np.arange(kernel_size, dtype=np.float64)
    xx, yy = np.meshgrid(coords, coords, indexing="xy")
    k = np.exp(-((xx - mean) ** 2 + (yy - mean) ** 2) / (2 * variance))
    return (k / k.sum()).astype(np.float32)


def _depthwise_conv(x: jax.Array, kernel2d: np.ndarray, stride: int, pad: int):
    c = x.shape[-1]
    k = jnp.asarray(kernel2d, dtype=x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with I=1 (depthwise)
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def _avg_pool(x: jax.Array, k: int, stride: int, pad: int, include_pad: bool):
    # windowed sums as a depthwise ones-conv: differentiable and MXU-fusible
    ones_k = np.ones((k, k), dtype=np.float32)
    sums = _depthwise_conv(x, ones_k, stride, pad)
    if include_pad:
        return sums / (k * k)
    counts = _depthwise_conv(
        jnp.ones((1,) + x.shape[-3:-1] + (1,), x.dtype), ones_k, stride, pad
    )
    return sums / jax.lax.stop_gradient(counts)


def filter_low(
    x: jax.Array,
    kernel_size: int = 5,
    stride: int = 1,
    recursions: int = 1,
    padding: bool = True,
    include_pad: bool = True,
    gaussian: bool = False,
) -> jax.Array:
    """Low-pass, reference FilterLow parity (DSN/model.py:258-274)."""
    pad = (kernel_size - 1) // 2 if padding else 0
    for _ in range(recursions):
        if gaussian:
            x = _depthwise_conv(x, gaussian_kernel(kernel_size), stride, pad)
        else:
            x = _avg_pool(x, kernel_size, stride, pad, include_pad)
    return x


def filter_high(
    x: jax.Array,
    kernel_size: int = 5,
    stride: int = 1,
    recursions: int = 1,
    include_pad: bool = True,
    normalize: bool = True,
    gaussian: bool = False,
) -> jax.Array:
    """High-pass = x - low(x), reference FilterHigh parity (DSN/model.py:277-293).

    With ``normalize`` the result is remapped to [0,1] as ``0.5 + 0.5*hf``.
    Note the inner low-pass always uses SAME padding (FilterHigh constructs
    FilterLow with default padding=True).
    """
    low = lambda v: filter_low(
        v, kernel_size, stride, 1, True, include_pad, gaussian
    )
    if recursions > 1:
        for _ in range(recursions - 1):
            x = low(x)
    x = x - low(x)
    return 0.5 + x * 0.5 if normalize else x


def wavelet_high_cat(x: jax.Array, norm: bool = True, cs: str = "cat") -> jax.Array:
    """High-band discriminator input via Haar DWT (DSN/model.py:108-118)."""
    from dasr_tpu.ops.dwt import haar_bands

    _, high = haar_bands(x, norm=norm, cs=cs)
    return high


def wavelet_ll(x: jax.Array, norm: bool = True) -> jax.Array:
    """LL sub-band for the DSN color loss (reference: DSN/loss.py:103-107)."""
    ll, _, _, _ = haar_dwt(x)
    return ll * 0.5 if norm else ll
