"""Filter-bank parity tests against torch (the reference's backend)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dasr_tpu.ops.filters import filter_high, filter_low, gaussian_kernel


def _to_torch(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def _to_np(t):
    return t.numpy().transpose(0, 2, 3, 1)


def test_gaussian_kernel_reference_arithmetic():
    k = gaussian_kernel(5)
    # reference formula (DSN/model.py:230-243)
    mean, var = 2.0, (5 / 6.0) ** 2
    want = np.zeros((5, 5))
    for i in range(5):
        for j in range(5):
            want[i, j] = np.exp(-((i - mean) ** 2 + (j - mean) ** 2) / (2 * var))
    want /= want.sum()
    np.testing.assert_allclose(k, want, atol=1e-7)
    assert abs(k.sum() - 1.0) < 1e-6


def test_gaussian_low_matches_torch_depthwise(rng):
    x = rng.random((2, 12, 14, 3)).astype(np.float32)
    got = np.asarray(filter_low(jnp.asarray(x), kernel_size=5, gaussian=True))
    w = torch.from_numpy(np.tile(gaussian_kernel(5)[None, None], (3, 1, 1, 1)))
    want = _to_np(F.conv2d(_to_torch(x), w, padding=2, groups=3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avgpool_count_include_pad_false_matches_torch(rng):
    x = rng.random((1, 10, 11, 3)).astype(np.float32)
    got = np.asarray(
        filter_low(jnp.asarray(x), kernel_size=5, include_pad=False)
    )
    pool = torch.nn.AvgPool2d(5, stride=1, padding=2, count_include_pad=False)
    want = _to_np(pool(_to_torch(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avgpool_include_pad_true_matches_torch(rng):
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(filter_low(jnp.asarray(x), kernel_size=5, include_pad=True))
    pool = torch.nn.AvgPool2d(5, stride=1, padding=2, count_include_pad=True)
    want = _to_np(pool(_to_torch(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_valid_padding_low_pass(rng):
    """GeneratorLoss color filter uses padding=False (DSN/loss.py:50-55)."""
    x = rng.random((1, 12, 12, 3)).astype(np.float32)
    got = filter_low(jnp.asarray(x), kernel_size=5, padding=False)
    assert got.shape == (1, 8, 8, 3)
    pool = torch.nn.AvgPool2d(5, stride=1, padding=0)
    want = _to_np(pool(_to_torch(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_filter_high_is_residual_and_normalized(rng):
    x = rng.random((1, 12, 12, 3)).astype(np.float32)
    xj = jnp.asarray(x)
    low = filter_low(xj, kernel_size=5, include_pad=False)
    hf = filter_high(xj, kernel_size=5, include_pad=False, normalize=False)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(xj - low), atol=1e-6)
    hf_n = filter_high(xj, kernel_size=5, include_pad=False, normalize=True)
    np.testing.assert_allclose(np.asarray(hf_n), 0.5 + np.asarray(hf) * 0.5, atol=1e-6)
