"""MATLAB-bicubic and bilinear resize parity tests.

Oracles:
  * an independent per-output-pixel brute force of MATLAB's antialiased
    bicubic (kernel a=-0.5, symmetric boundary), written directly from the
    published algorithm;
  * torch.nn.functional.interpolate for bilinear (align_corners=False) —
    the exact op the reference uses on DDMs (DASR_model.py:173-174).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dasr_tpu.ops.resize import bilinear_resize, imresize


def _cubic_scalar(x):
    ax = abs(x)
    if ax <= 1:
        return 1.5 * ax**3 - 2.5 * ax**2 + 1
    if ax <= 2:
        return -0.5 * ax**3 + 2.5 * ax**2 - 4 * ax + 2
    return 0.0


def _sym(idx, n):
    # MATLAB 'symmetric' boundary: ...2,1,0 | 0..n-1 | n-1,n-2...
    period = 2 * n
    idx = idx % period
    return period - 1 - idx if idx >= n else idx


def _brute_resize_1d(signal, out_len, scale, antialias=True):
    """Direct MATLAB imresize along axis 0 of a 1D array."""
    n = len(signal)
    kw = 4.0 / scale if (scale < 1 and antialias) else 4.0
    out = np.zeros(out_len)
    for k in range(out_len):
        u = (k + 1) / scale + 0.5 * (1 - 1 / scale)
        left = math.floor(u - kw / 2)
        total, acc = 0.0, 0.0
        for j in range(left, left + int(math.ceil(kw)) + 2):
            d = u - j
            wgt = scale * _cubic_scalar(d * scale) if (scale < 1 and antialias) else _cubic_scalar(d)
            acc += wgt * signal[_sym(j - 1, n)]
            total += wgt
        out[k] = acc / total
    return out


def _brute_resize(img, scale, antialias=True):
    h, w, c = img.shape
    oh, ow = math.ceil(h * scale), math.ceil(w * scale)
    tmp = np.zeros((oh, w, c))
    for j in range(w):
        for ch in range(c):
            tmp[:, j, ch] = _brute_resize_1d(img[:, j, ch], oh, scale, antialias)
    out = np.zeros((oh, ow, c))
    for i in range(oh):
        for ch in range(c):
            out[i, :, ch] = _brute_resize_1d(tmp[i, :, ch], ow, scale, antialias)
    return np.clip(out, 0, 1)


@pytest.mark.parametrize("scale", [0.25, 0.5, 2.0, 1 / 3])
def test_imresize_matches_matlab_brute_force(rng, scale):
    img = rng.random((24, 20, 3)).astype(np.float32)
    got = np.asarray(imresize(jnp.asarray(img), scale))
    want = _brute_resize(img.astype(np.float64), scale)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_imresize_constant_preserved():
    img = jnp.full((16, 16, 3), 0.37)
    out = imresize(img, 0.25)
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-6)


def test_imresize_batched_matches_single(rng):
    imgs = rng.random((2, 16, 12, 3)).astype(np.float32)
    batched = np.asarray(imresize(jnp.asarray(imgs), 0.5))
    singles = np.stack([np.asarray(imresize(jnp.asarray(i), 0.5)) for i in imgs])
    np.testing.assert_allclose(batched, singles, atol=1e-6)


@pytest.mark.parametrize("shape_out", [(32, 32), (17, 23), (64, 48)])
def test_bilinear_matches_torch(rng, shape_out):
    img = rng.random((2, 9, 13, 1)).astype(np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(img), *shape_out))
    t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    want = F.interpolate(t, size=shape_out, mode="bilinear", align_corners=False)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)
