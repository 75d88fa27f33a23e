"""ops/packed_trunk: the 2x2 space-to-depth DeResnet trunk rewrite must be
the SAME function as the plain trunk (same parameter tree, float-rounding
tolerance — the per-conv accumulation order changes).

Covers the kernel-packing algebra (SAME conv, stride-2 conv), the
pack/unpack bijection, the full DeResnet(packed_trunk=True) forward at
every scale, and gradients (the DSN train step differentiates through the
trunk, so forward-only parity is not enough)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.nn.generators import DeResnet
from dasr_tpu.ops.packed_trunk import (
    pack_bias,
    pack_kernel,
    pack_kernel_strided,
    pack_space_to_depth,
    packed_conv,
    packed_resblock_chain,
    resblock_chain,
    unpack_depth_to_space,
)


def _conv(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        pad if isinstance(pad, str) else ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    xp = pack_space_to_depth(x)
    assert xp.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(unpack_depth_to_space(xp), x)
    # phase-major layout: channel (p*2+q)*C + c holds pixel (2i+p, 2j+q)
    np.testing.assert_array_equal(xp[0, 1, 2, 5], x[0, 2, 5, 0])  # phase (0,1)
    np.testing.assert_array_equal(xp[0, 1, 2, 10], x[0, 3, 4, 0])  # phase (1,0)


@pytest.mark.parametrize("cin,cout", [(3, 7), (6, 6)])
def test_packed_conv_matches_same_conv(rng, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, 10, 8, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = _conv(x, w) + b
    got = unpack_depth_to_space(
        packed_conv(pack_space_to_depth(x), pack_kernel(w), pack_bias(b))
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_packed_strided_conv_matches_stride2(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 10, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 9)), jnp.float32)
    ref = _conv(x, w, stride=2, pad=1)
    got = _conv(pack_space_to_depth(x), pack_kernel_strided(w), stride=1, pad=1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_packed_resblock_chain(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    params = []
    for _ in range(3):
        # 0.2-scaled weights: unit-normal 3-deep chains reach 1e4-magnitude
        # activations where float32 rounding alone exceeds tiny abs tols
        params.append(tuple(
            jnp.asarray(0.2 * rng.standard_normal(s), jnp.float32)
            for s in [(3, 3, 4, 4), (4,), (3, 3, 4, 4), (4,), ()]
        ))
    ref = resblock_chain(x, params)
    got = packed_resblock_chain(x, params)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)


@pytest.mark.parametrize("scale", [1, 2, 4])
def test_deresnet_packed_trunk_forward(rng, scale):
    """Same params -> same output, every supported scale."""
    plain = DeResnet(n_res_blocks=2, scale=scale)
    packed = DeResnet(n_res_blocks=2, scale=scale, packed_trunk=True)
    x = jnp.asarray(rng.random((2, 24, 16, 3)), jnp.float32)
    params = plain.init(jax.random.key(0), x)
    # identical parameter tree (the shells mirror names, shapes, inits)
    params_p = packed.init(jax.random.key(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_p)):
        assert a.shape == b.shape and a.dtype == b.dtype
    ref = plain.apply(params, x)
    got = packed.apply(params, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_deresnet_packed_trunk_grads(rng):
    """The DSN step takes grads through the trunk: d(mean output)/d(params)
    must agree between the two formulations."""
    plain = DeResnet(n_res_blocks=2, scale=4)
    packed = DeResnet(n_res_blocks=2, scale=4, packed_trunk=True)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    params = plain.init(jax.random.key(1), x)

    g_ref = jax.grad(lambda p: jnp.mean(plain.apply(p, x) ** 2))(params)
    g_got = jax.grad(lambda p: jnp.mean(packed.apply(p, x) ** 2))(params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_got = jax.tree.leaves(g_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5)


def test_deresnet_packed_trunk_odd_size_asserts(rng):
    packed = DeResnet(n_res_blocks=1, scale=2, packed_trunk=True)
    with pytest.raises(AssertionError):
        packed.init(jax.random.key(0), jnp.zeros((1, 15, 16, 3)))
