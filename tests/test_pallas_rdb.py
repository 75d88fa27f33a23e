"""Fused Pallas RDB kernel vs the XLA scatter formulation (interpret mode —
the CPU test mesh can't run Mosaic; the kernel logic including halo DMA,
boundary masks and scatter matmuls is identical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.ops.pallas_rdb import _fused_rdb_impl, _scatter_reference


def _params(rng, nc=64, gc=32):
    kernels = tuple(
        jnp.asarray(
            rng.normal(0, 0.05, (3, 3, nc + k * gc, gc if k < 4 else nc)),
            jnp.float32,
        )
        for k in range(5)
    )
    biases = tuple(
        jnp.asarray(rng.normal(0, 0.01, (gc if k < 4 else nc,)), jnp.float32)
        for k in range(5)
    )
    return kernels, biases


def test_fused_rdb_matches_scatter_interpret(rng):
    kernels, biases = _params(rng)
    x = jnp.asarray(rng.random((2, 128, 128, 64)), jnp.float32)
    want = _scatter_reference(x, kernels, biases)
    got = _fused_rdb_impl(x, kernels, biases, tile=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )


def test_fused_rdb_border_semantics(rng):
    """Boundary masks must reproduce SAME-zero-padding exactly at edges."""
    kernels, biases = _params(rng)
    x = jnp.asarray(rng.random((1, 64, 64, 64)), jnp.float32)
    want = np.asarray(_scatter_reference(x, kernels, biases))
    got = np.asarray(_fused_rdb_impl(x, kernels, biases, tile=64, interpret=True))
    # check the 5px border band specifically
    np.testing.assert_allclose(got[:, :5, :, :], want[:, :5, :, :], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[:, :, -5:, :], want[:, :, -5:, :], atol=2e-4, rtol=1e-3)


def test_fused_rdb_gradients_via_scatter_vjp(rng):
    from dasr_tpu.ops.pallas_rdb import fused_rdb

    kernels, biases = _params(rng, nc=32, gc=16)
    x = jnp.asarray(rng.random((1, 64, 64, 32)), jnp.float32)

    # VJP is defined as the scatter path's VJP; verify it matches the
    # numerical gradient of the scatter forward
    def loss_scatter(x):
        return jnp.sum(_scatter_reference(x, kernels, biases) ** 2)

    g_want = jax.grad(loss_scatter)(x)
    _, vjp = jax.vjp(lambda v: _scatter_reference(v, kernels, biases), x)
    (g_got,) = vjp(2 * _scatter_reference(x, kernels, biases))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)
