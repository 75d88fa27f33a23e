"""Tiled inference: seam-free reassembly, forward_chop parity, sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.core.mesh import make_mesh
from dasr_tpu.ops.tiled import forward_chop, tiled_apply


def _upscale2(x):
    """A local x2 'model': nearest upsample + 3x3 box blur (local op)."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    k = jnp.ones((3, 3, 1, 1), up.dtype) / 9.0
    k = jnp.tile(k, (1, 1, 1, up.shape[-1]))
    return jax.lax.conv_general_dilated(
        up, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=up.shape[-1],
    )


def test_tiled_apply_matches_full_image(rng):
    img = jnp.asarray(rng.random((1, 96, 80, 3)).astype(np.float32))
    full = _upscale2(img)
    tiled = tiled_apply(img, _upscale2, scale=2, tile=32, halo=4)
    assert tiled.shape == full.shape
    # interior must match exactly; borders differ only by pad semantics of
    # the blur (reflect pad from tiling vs zero pad of conv SAME)
    np.testing.assert_allclose(
        np.asarray(tiled)[:, 8:-8, 8:-8], np.asarray(full)[:, 8:-8, 8:-8], atol=1e-5
    )


def test_tiled_apply_non_multiple_size(rng):
    img = jnp.asarray(rng.random((1, 70, 54, 3)).astype(np.float32))
    out = tiled_apply(img, _upscale2, scale=2, tile=32, halo=4)
    assert out.shape == (1, 140, 108, 3)


def test_tiled_apply_sharded_matches_unsharded(rng):
    mesh = make_mesh(n_data=8)
    img = jnp.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))
    plain = tiled_apply(img, _upscale2, scale=2, tile=32, halo=4)
    sharded = tiled_apply(img, _upscale2, scale=2, tile=32, halo=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=1e-6)


def test_forward_chop_identity_model(rng):
    """With an elementwise model, chopping must be exactly lossless.

    Sizes chosen so every recursion level stays even: the reference's
    even-rounding (utils/util.py:127-128) shifts content by one row for odd
    intermediate sizes — a quirk we reproduce, not fix.
    """
    img = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32))
    out = forward_chop(
        img, scale=1, model=lambda x: x * 2.0, shave=4, min_size=500
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 2.0, atol=1e-6)


def test_forward_chop_odd_size_even_rounding(rng):
    """Odd scaled sizes are rounded up to even (reference quirk)."""
    img = jnp.asarray(rng.random((1, 25, 31, 3)).astype(np.float32))
    out = forward_chop(img, scale=1, model=lambda x: x, shave=2, min_size=10**9)
    assert out.shape == (1, 26, 32, 3)


def test_forward_chop_scale_and_shapes(rng):
    img = jnp.asarray(rng.random((1, 40, 40, 3)).astype(np.float32))

    def up2(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    out = forward_chop(img, scale=2, model=up2, shave=4, min_size=300)
    assert out.shape == (1, 80, 80, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(up2(img)), atol=1e-6)
