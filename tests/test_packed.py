"""Phase-major packed ops + grouped-scatter RDB + fused-tail RRDBNet.

These are the v5e throughput reformulations (ops/packed.py, nn/blocks.py
grouped scatter): all must be mathematically exact rewrites of the plain
formulations, with IDENTICAL parameter trees (apply-time transforms only).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.nn.blocks import RDB5C
from dasr_tpu.nn.generators import RRDBNet
from dasr_tpu.ops.packed import fused_upconv2, pack22, packed_conv22, unpack22


def _conv(v, k):
    return jax.lax.conv_general_dilated(
        v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12, 5))
    np.testing.assert_array_equal(np.asarray(unpack22(pack22(x))), np.asarray(x))


def test_packed_conv22_matches_same_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7))
    b = jax.random.normal(jax.random.PRNGKey(2), (7,))
    want = _conv(x, w) + b
    got = unpack22(packed_conv22(pack22(x), w, bias=b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_upconv2_matches_repeat_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7))
    b = jax.random.normal(jax.random.PRNGKey(2), (7,))
    rep = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    want = _conv(rep, w) + b
    got = fused_upconv2(x, w, bias=b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # keep-packed output unpacks to the same thing
    got_packed = fused_upconv2(x, w, bias=b, unpack=False)
    np.testing.assert_allclose(
        np.asarray(unpack22(got_packed)), np.asarray(want), atol=1e-5
    )


def test_grouped_scatter_rdb_matches_literal_chain():
    m_fast = RDB5C(nc=16, gc=8)
    m_ref = RDB5C(nc=16, gc=8, fused=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 16))
    v = m_fast.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_ref.init(jax.random.PRNGKey(1), x)
    )
    np.testing.assert_allclose(
        np.asarray(m_fast.apply(v, x)), np.asarray(m_ref.apply(v, x)), atol=2e-5
    )


def test_rrdbnet_fused_tail_matches_plain():
    m1 = RRDBNet(nf=16, nb=2, gc=8, upscale=4)
    m2 = RRDBNet(nf=16, nb=2, gc=8, upscale=4, fused_tail=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 12, 3))
    v1 = m1.init(jax.random.PRNGKey(1), x)
    v2 = m2.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    assert jax.tree_util.tree_map(lambda a: a.shape, v1) == jax.tree_util.tree_map(
        lambda a: a.shape, v2
    )
    y1 = m1.apply(v1, x)
    y2 = m2.apply(v1, x)
    assert y2.shape == (1, 64, 48, 3)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)


def test_rrdbnet_scan_blocks_matches_unrolled():
    m1 = RRDBNet(nf=16, nb=3, gc=8, upscale=4)
    m2 = RRDBNet(nf=16, nb=3, gc=8, upscale=4, scan_blocks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 12, 3))
    v1 = m1.init(jax.random.PRNGKey(1), x)
    v2 = m2.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    np.testing.assert_allclose(
        np.asarray(m1.apply(v1, x)), np.asarray(m2.apply(v1, x)), atol=3e-5
    )
    g1 = jax.grad(lambda p: jnp.mean(m1.apply(p, x) ** 2))(v1)
    g2 = jax.grad(lambda p: jnp.mean(m2.apply(p, x) ** 2))(v1)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_rrdbnet_fused_tail_grads_match():
    m1 = RRDBNet(nf=8, nb=1, gc=4, upscale=2)
    m2 = RRDBNet(nf=8, nb=1, gc=4, upscale=2, fused_tail=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    v = m1.init(jax.random.PRNGKey(1), x)

    def loss(m):
        return lambda p: jnp.mean(m.apply(p, x) ** 2)

    g1 = jax.grad(loss(m1))(v)
    g2 = jax.grad(loss(m2))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dasr_facade_train_step_with_scan_fused_matches_plain(rng):
    """network_G.scan_blocks/fused_tail now reach the TRAINING generator
    through the DASR facade (registry DASRModel -> define_G). The rewrites
    are exact (same param tree), so two facades initialized from the same
    seed must produce the same 2-step loss trajectory."""
    from dasr_tpu.models.registry import create_model

    def opt(extra):
        return {
            "model": "DASR", "scale": 4, "bf16": False, "multiweights": True,
            "network_G": {"which_model_G": "RRDB_net", "nf": 16, "nb": 2,
                          "gc": 8, "in_nc": 3, "out_nc": 3,
                          "norm_type": None, **extra},
            "network_D": {"nf": 16, "in_nc": 9, "n_layers": 2},
            "train": {"lr_G": 1e-4, "lr_D": 1e-4, "lr_steps": [10 ** 6],
                      "gan_H_target": 0.005, "gan_H_source": 0},
        }

    m_plain = create_model(opt({})).init(lr_size=8)
    m_fast = create_model(
        opt({"scan_blocks": True, "fused_tail": True})
    ).init(lr_size=8)

    batches = [
        {
            "LR_fake": rng.random((2, 8, 8, 3)).astype(np.float32),
            "LR_real": rng.random((2, 8, 8, 3)).astype(np.float32),
            "HR": rng.random((2, 32, 32, 3)).astype(np.float32),
            "HR_unpair": rng.random((2, 32, 32, 3)).astype(np.float32),
            "fake_w": rng.random((2, 4, 4, 1)).astype(np.float32),
        }
        for _ in range(2)
    ]
    for i, b in enumerate(batches):
        got = m_fast.train_step(dict(b))
        want = m_plain.train_step(dict(b))
        for k, v in want.items():
            np.testing.assert_allclose(
                got[k], v, rtol=1e-4, atol=1e-6, err_msg=f"step {i}: {k}"
            )
