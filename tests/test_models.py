"""Architecture shape/jit tests (SURVEY.md §4: jit-shape tests for every net)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.losses.lpips import LPIPS
from dasr_tpu.nn.discriminators import (
    DiscriminatorBasic,
    DiscriminatorVGG,
    FSDiscriminator,
    NLayerDiscriminator,
)
from dasr_tpu.nn.generators import DSGANGenerator, DeResnet, RRDBNet, SRResNet


def _init_apply(model, *xs, **kw):
    key = jax.random.key(0)
    variables = model.init(key, *xs, **kw)
    out = model.apply(variables, *xs, **kw)
    return variables, out


def _nparams(variables):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))


def test_dsgan_generator_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    m = DSGANGenerator(n_res_blocks=2)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 32, 32, 3)
    assert float(y.min()) >= 0 and float(y.max()) <= 1  # sigmoid out


@pytest.mark.parametrize("scale", [2, 4])
def test_deresnet_downscale(scale):
    x = jnp.zeros((1, 64, 64, 3))
    m = DeResnet(n_res_blocks=2, scale=scale)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 64 // scale, 64 // scale, 3)


def test_rrdbnet_x4_shapes_and_param_count():
    x = jnp.zeros((1, 16, 16, 3))
    m = RRDBNet(nf=64, nb=23, gc=32, upscale=4)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 64, 64, 3)
    # exact ESRGAN x4 parameter count (nf64 nb23 gc32)
    assert _nparams(v) == 16_697_987


def test_rrdbnet_small_jit():
    m = RRDBNet(nf=32, nb=2, gc=16, upscale=4)
    x = jnp.zeros((1, 8, 8, 3))
    v = m.init(jax.random.key(0), x)
    y = jax.jit(m.apply)(v, x)
    assert y.shape == (1, 32, 32, 3)


def test_srresnet_shapes():
    m = SRResNet(nf=16, nb=2, upscale=4, norm_type=None, mode="CNA")
    x = jnp.zeros((1, 12, 12, 3))
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == (1, 48, 48, 3)


def test_discriminator_basic_patch_output():
    for norm in ("Batch", "Instance"):
        m = DiscriminatorBasic(norm_layer=norm)
        x = jnp.zeros((2, 32, 32, 3))
        v = m.init(jax.random.key(0), x)
        y = m.apply(v, x, mutable=["batch_stats"])[0] if norm == "Batch" else m.apply(v, x)
        assert y.shape == (2, 32, 32, 1)


def test_nlayer_discriminator_strides():
    x = jnp.zeros((1, 64, 64, 9))
    # SRN variant: stride 2, n_layers 2 (the DASR D_target config)
    m = NLayerDiscriminator(in_ch=9, n_layers=2, stride=2, use_bias_middle=False)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape[0] == 1 and y.shape[-1] == 1
    assert y.shape[1] == 64 // 4 - 2  # two stride-2 convs then two k4s1 convs
    # DSN stride-1 variant keeps resolution-ish
    m1 = NLayerDiscriminator(in_ch=3, n_layers=2, stride=1)
    x1 = jnp.zeros((1, 32, 32, 3))
    v1 = m1.init(jax.random.key(0), x1)
    assert m1.apply(v1, x1).shape[-1] == 1


@pytest.mark.parametrize("ft", ["gau", "avg_pool", "wavelet"])
def test_fs_discriminator_filters(ft):
    m = FSDiscriminator(d_arch="FSD", filter_type=ft, norm_layer="Instance")
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    exp_hw = 16 if ft == "wavelet" else 32
    assert y.shape == (2, exp_hw, exp_hw, 1)
    assert float(y.min()) >= 0 and float(y.max()) <= 1  # sigmoid (not wgan)


def test_fs_discriminator_relativistic_y():
    m = FSDiscriminator(d_arch="FSD", filter_type="avg_pool", norm_layer="Instance")
    x = jnp.ones((2, 16, 16, 3)) * 0.5
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x, x)
    assert y.shape == (2, 16, 16, 1)


def test_discriminator_vgg128():
    m = DiscriminatorVGG(input_size=128)
    x = jnp.zeros((2, 128, 128, 3))
    v = m.init(jax.random.key(0), x)
    y, _ = m.apply(v, x, mutable=["batch_stats"])
    assert y.shape == (2, 1)


def test_lpips_zero_for_identical_and_shapes(rng):
    m = LPIPS(net="alex")
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    v = m.init(jax.random.key(0), x, x)
    d_same = m.apply(v, x, x)
    assert d_same.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.3, -1, 1)
    d_diff = m.apply(v, x, y)
    assert float(d_diff.min()) > 0


def test_rdb5c_fused_matches_literal_chain(rng):
    """The scatter formulation must equal the literal 5-conv chain in f32."""
    from dasr_tpu.nn.blocks import RDB5C

    x = jnp.asarray(rng.random((1, 16, 16, 32)).astype(np.float32))
    fused = RDB5C(nc=32, gc=16, fused=True)
    plain = RDB5C(nc=32, gc=16, fused=False)
    v = fused.init(jax.random.key(0), x)
    out_f = fused.apply(v, x)
    out_p = plain.apply(v, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-5)
