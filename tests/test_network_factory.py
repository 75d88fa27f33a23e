"""define_G/define_D/define_pairD/define_patchD factory coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.models.registry import define_D, define_G, define_pairD, define_patchD


def _fwd(model, *xs, mutable=False):
    v = model.init(jax.random.key(0), *xs)
    if mutable:
        out, _ = model.apply(v, *xs, mutable=["batch_stats"])
        return out
    return model.apply(v, *xs)


@pytest.mark.parametrize(
    "which,extra",
    [
        ("RRDB_net", {}),
        ("RRDB_mask", {}),
        ("sr_resnet", {}),
        ("DSGAN", {}),
    ],
)
def test_define_g_sr_family(which, extra):
    opt = {"scale": 4, "bf16": False,
           "network_G": {"which_model_G": which, "nf": 8, "nb": 1, "gc": 4, **extra}}
    g = define_G(opt)
    x = jnp.zeros((1, 8, 8, 3))
    y = _fwd(g, x)
    exp = 8 if which == "DSGAN" else 32
    assert y.shape == (1, exp, exp, 3)


def test_define_g_deresnet_and_adaptive():
    opt = {"scale": 4, "bf16": False,
           "network_G": {"which_model_G": "De_Resnet", "nb": 1}}
    g = define_G(opt)
    assert _fwd(g, jnp.zeros((1, 16, 16, 3))).shape == (1, 4, 4, 3)

    opt = {"scale": 4, "bf16": False,
           "network_G": {"which_model_G": "RRDB_Residual_conv", "nf": 8, "nb": 1,
                          "gc": 4, "ada_nb": 1}}
    g = define_G(opt)
    y = _fwd(g, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 1)))
    assert y.shape == (1, 32, 32, 3)


def test_define_g_sft():
    opt = {"scale": 4, "bf16": False, "network_G": {"which_model_G": "sft_arch"}}
    g = define_G(opt)
    img = jnp.zeros((1, 8, 8, 3))
    seg = jnp.zeros((1, 32, 32, 8))
    assert _fwd(g, img, seg).shape == (1, 32, 32, 3)


@pytest.mark.parametrize(
    "which,size,out_patch",
    [
        ("discriminator_vgg_128", 128, False),
        ("discriminator_vgg_96", 96, False),
        ("discriminator_vgg_192", 192, False),
        ("discriminator_vgg_48", 48, False),
        ("discriminator_vgg_96_patch", 96, True),
        ("DSGAN", 32, True),
    ],
)
def test_define_d_variants(which, size, out_patch):
    opt = {"bf16": False,
           "network_D": {"which_model_D": which, "nf": 16, "in_nc": 3,
                          "norm_type": "batch", "act_type": "leakyrelu",
                          "mode": "CNA", "n_layers": 2}}
    d = define_D(opt)
    x = jnp.zeros((2, size, size, 3))
    y = _fwd(d, x, mutable=True)
    if out_patch:
        assert y.ndim == 4 and y.shape[0] == 2
    else:
        assert y.shape == (2, 1)


def test_define_d_sn():
    opt = {"bf16": False, "network_D": {"which_model_D": "discriminator_vgg_128_SN"}}
    d = define_D(opt)
    x = jnp.zeros((1, 128, 128, 3))
    v = d.init(jax.random.key(0), x)
    y = d.apply(v, x)
    assert y.shape == (1, 1)


def test_define_patchd():
    opt = {"network_patchD": {"which_patchD": "FSD", "FS_type": "avg_pool",
                               "kernel_size": 5, "norm_layer": "Instance"}}
    d = define_patchD(opt)
    x = jnp.zeros((1, 16, 16, 3))
    y = _fwd(d, x)
    assert y.shape == (1, 16, 16, 1)


def test_define_paird_falls_back():
    opt = {"bf16": False,
           "network_D": {"which_model_pairD": "discriminator_patch", "in_nc": 9,
                          "nf": 16, "n_layers": 2}}
    d = define_pairD(opt)
    y = _fwd(d, jnp.zeros((1, 32, 32, 9)))
    assert y.shape[-1] == 1


def test_acd_discriminator():
    opt = {"bf16": False, "network_D": {"which_model_D": "dis_acd"}}
    d = define_D(opt)
    x = jnp.zeros((1, 96, 96, 3))
    v = d.init(jax.random.key(0), x)
    (gan, cls), _ = d.apply(v, x, mutable=["batch_stats"])
    assert gan.shape == (1, 1) and cls.shape == (1, 8)