"""Image resampling as separable matrix products.

``imresize`` reproduces MATLAB's antialiased bicubic resize bit-for-bit with
the reference's implementation (reference: codes/DSN/utils.py:37-166 and
codes/SRN/data/util.py:298-434) but TPU-natively: instead of per-output-row
Python loops doing ``mv`` products, we precompute one dense resampling matrix
per axis (output_len x input_len, symmetric boundary folded in) on the host
and apply them as two einsums — large, static-shape matmuls that XLA tiles
onto the MXU and fuses with surrounding work.

``bilinear_resize`` matches ``torch.nn.functional.interpolate(...,
mode='bilinear', align_corners=False)``, used by the reference to resize
domain-distance maps (reference: codes/SRN/models/DASR_model.py:173-174).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB's bicubic kernel (a = -0.5), reference: DSN/utils.py:37-43."""
    absx = np.abs(x)
    absx2 = absx**2
    absx3 = absx**3
    return (1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1) + (
        -0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2
    ) * ((absx > 1) & (absx <= 2))


def _symmetric_index(idx: np.ndarray, n: int) -> np.ndarray:
    """Map out-of-range indices to MATLAB 'symmetric' boundary indices.

    Equivalent to the reference's explicit mirrored-patch copies
    (DSN/utils.py:122-133): position -1 -> 0, -2 -> 1, n -> n-1, ...
    """
    idx = np.asarray(idx, dtype=np.int64)
    period = 2 * n
    idx = np.mod(idx, period)
    return np.where(idx >= n, period - 1 - idx, idx)


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_length: int, out_length: int, scale: float, antialiasing: bool):
    """Dense (out_length, in_length) MATLAB-bicubic resampling matrix.

    Same weight/index arithmetic as the reference's
    ``calculate_weights_indices`` (DSN/utils.py:46-98), with the symmetric
    padding folded into the matrix columns.
    """
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(math.ceil(kernel_width)) + 2

    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)

    # Drop an all-zero first/last column (reference: DSN/utils.py:86-92).
    zero_cols = (weights == 0).sum(axis=0)
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        indices = indices[:, 1:]
        weights = weights[:, 1:]
    if not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        indices = indices[:, :-1]
        weights = weights[:, :-1]

    src = _symmetric_index(indices - 1, in_length)  # 1-based -> 0-based
    mat = np.zeros((out_length, in_length), dtype=np.float32)
    rows = np.repeat(np.arange(out_length), src.shape[1])
    np.add.at(mat, (rows, src.ravel()), weights.astype(np.float32).ravel())
    return mat


def _apply_separable(img: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """Apply per-axis resampling matrices to ...HWC images via einsum."""
    mh = jnp.asarray(mh, dtype=img.dtype)
    mw = jnp.asarray(mw, dtype=img.dtype)
    hi = jax.lax.Precision.HIGHEST  # bicubic parity needs true-f32 matmuls
    out = jnp.einsum("oh,...hwc->...owc", mh, img, precision=hi)
    return jnp.einsum("pw,...hwc->...hpc", mw, out, precision=hi)


@functools.partial(jax.jit, static_argnames=("scale", "antialiasing", "clip"))
def imresize(
    img: jax.Array, scale: float, antialiasing: bool = True, clip: bool = True
) -> jax.Array:
    """MATLAB-parity bicubic resize of ...HWC images in [0, 1].

    Matches the reference's ``imresize`` (DSN/utils.py:101-166) including the
    final clamp to [0, 1]; pass ``clip=False`` for the SRN's ``imresize_np``
    behaviour (codes/SRN/data/util.py:355-434, no clamp).
    """
    h, w = img.shape[-3], img.shape[-2]
    out_h, out_w = math.ceil(h * scale), math.ceil(w * scale)
    mh = _resize_matrix(h, out_h, scale, antialiasing)
    mw = _resize_matrix(w, out_w, scale, antialiasing)
    out = _apply_separable(img, mh, mw)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def imresize_np(img: np.ndarray, scale: float, antialiasing: bool = True,
                clip: bool = True) -> np.ndarray:
    """Host-side (numpy) MATLAB bicubic for data pipelines.

    Same cached matrices as ``imresize``; used by dataloader workers so the
    on-the-fly LR generation (reference: codes/SRN/data/LRHR_dataset.py
    calling util.imresize_np) never touches the device.
    """
    img = np.asarray(img)
    h, w = img.shape[-3], img.shape[-2]
    out_h, out_w = math.ceil(h * scale), math.ceil(w * scale)
    mh = _resize_matrix(h, out_h, scale, antialiasing)
    mw = _resize_matrix(w, out_w, scale, antialiasing)
    out = np.einsum("oh,...hwc->...owc", mh, img, optimize=True)
    out = np.einsum("pw,...hwc->...hpc", mw, out, optimize=True)
    return np.clip(out, 0.0, 1.0) if clip else out


@functools.lru_cache(maxsize=256)
def _bilinear_matrix(in_length: int, out_length: int):
    """torch F.interpolate(mode='bilinear', align_corners=False) weights."""
    mat = np.zeros((out_length, in_length), dtype=np.float32)
    if in_length == 1:
        mat[:, 0] = 1.0
        return mat
    ratio = in_length / out_length
    dst = np.arange(out_length, dtype=np.float64)
    src = (dst + 0.5) * ratio - 0.5
    src = np.clip(src, 0, in_length - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_length - 1)
    frac = src - i0
    rows = np.arange(out_length)
    np.add.at(mat, (rows, i0), (1.0 - frac).astype(np.float32))
    np.add.at(mat, (rows, i1), frac.astype(np.float32))
    return mat


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def bilinear_resize(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of ...HWC images, torch align_corners=False parity."""
    mh = _bilinear_matrix(img.shape[-3], out_h)
    mw = _bilinear_matrix(img.shape[-2], out_w)
    return _apply_separable(img, mh, mw)
