"""Shape smoke tests for the conditioning/attention/misc block zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.nn.adaptive_blocks import (
    AdaptiveModule,
    AffineModule,
    CALayer,
    CARRDB,
    RCAB,
    RRDBAda,
    RRDBAffine,
    RRDBSEAN,
    SEANModule,
)
from dasr_tpu.nn.misc_nets import (
    EDSRResBlock,
    MeanShift,
    MINCNet,
    ResidualBlockNoBN,
    ResnetGenerator,
    ResNet101Features,
    Upsampler,
    flow_warp,
)

X = jnp.zeros((2, 16, 16, 32))
DDM = jnp.zeros((2, 16, 16, 1))


@pytest.mark.parametrize(
    "mod,args",
    [
        (AffineModule(nf=32), (X, DDM)),
        (SEANModule(nf=32), (X, DDM)),
        (RRDBAffine(nc=32, gc=16), (X, DDM)),
        (RRDBSEAN(nc=32, gc=16), (X, DDM)),
        (RRDBAda(nc=32, gc=16), (X, DDM)),
        (CALayer(channel=32), (X,)),
        (RCAB(nf=32), (X,)),
        (CARRDB(nc=32, gc=16), (X,)),
    ],
)
def test_conditioned_blocks_preserve_shape(mod, args):
    v = mod.init(jax.random.key(0), *args)
    out = mod.apply(v, *args)
    assert out.shape == X.shape


def test_adaptive_module_routes_by_mask(rng):
    m = AdaptiveModule(nf=32, ada_nb=1)
    x = jnp.asarray(rng.random((4, 8, 8, 32)).astype(np.float32))
    mask = jnp.array([0.0, 0.0, 1.0, 1.0])
    v = m.init(jax.random.key(0), x, mask)
    out = m.apply(v, x, mask)
    assert out.shape == x.shape
    # real half and fake half must use different branches
    out_flipped = m.apply(v, x, 1 - mask)
    assert float(jnp.abs(out - out_flipped).max()) > 0


def test_edsr_commons():
    x = jnp.zeros((1, 8, 8, 3))
    ms = MeanShift()
    assert ms.apply(ms.init(jax.random.key(0), x), x).shape == x.shape
    f = jnp.zeros((1, 8, 8, 64))
    rb = EDSRResBlock()
    assert rb.apply(rb.init(jax.random.key(0), f), f).shape == f.shape
    up = Upsampler(scale=4)
    assert up.apply(up.init(jax.random.key(0), f), f).shape == (1, 32, 32, 64)
    nb = ResidualBlockNoBN()
    assert nb.apply(nb.init(jax.random.key(0), f), f).shape == f.shape


def test_flow_warp_identity(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    flow = jnp.zeros((1, 8, 8, 2))
    np.testing.assert_allclose(np.asarray(flow_warp(x, flow)), np.asarray(x), atol=1e-6)
    # unit shift right: output col j samples col j+1
    flow1 = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(1.0)
    out = np.asarray(flow_warp(x, flow1))
    np.testing.assert_allclose(out[:, :, :-1], np.asarray(x)[:, :, 1:], atol=1e-5)


def test_feature_extractors_and_cyclegan():
    x = jnp.zeros((1, 32, 32, 3))
    minc = MINCNet()
    y = minc.apply(minc.init(jax.random.key(0), x), x)
    assert y.shape == (1, 2, 2, 512)
    rn = ResNet101Features()
    v = rn.init(jax.random.key(0), x)
    assert rn.apply(v, x).shape == (1, 8, 8, 256)
    g = ResnetGenerator(n_blocks=2)
    vg = g.init(jax.random.key(0), x)
    assert g.apply(vg, x).shape == (1, 32, 32, 3)


def test_rrdb_cat_input_and_feature_out():
    from dasr_tpu.nn.adaptive_blocks import RRDBCatInput, RRDBWithFeatureOut

    x = jnp.zeros((1, 8, 8, 32))
    cond = jnp.zeros((1, 8, 8, 4))
    m = RRDBCatInput(nc=32, gc=16)
    v = m.init(jax.random.key(0), x, cond)
    assert m.apply(v, x, cond).shape == x.shape

    stream = jnp.zeros((1, 8, 8, 8))
    m2 = RRDBWithFeatureOut(nc=32, gc=16, tap_ch=16)
    v2 = m2.init(jax.random.key(0), x, stream)
    out, new_stream = m2.apply(v2, x, stream)
    assert out.shape == x.shape
    assert new_stream.shape == (1, 8, 8, 24)
