"""Halo-exchange spatial sharding must match the unsharded forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.core.mesh import make_mesh
from dasr_tpu.nn.generators import RRDBNet
from dasr_tpu.ops.spatial_shard import spatially_sharded_apply


def test_sharded_rrdb_matches_unsharded(rng):
    mesh = make_mesh(n_data=8)
    model = RRDBNet(nf=16, nb=1, gc=8, upscale=4)
    # receptive influence of nb=1: fea + 15 RDB convs + trunk conv + tail
    # ~ 19 LR px; halo must exceed it
    x = jnp.asarray(rng.random((1, 192, 32, 3)).astype(np.float32))
    v = model.init(jax.random.key(0), x)

    want = np.asarray(model.apply(v, x))
    got = np.asarray(
        spatially_sharded_apply(
            x, lambda t: model.apply(v, t), scale=4, halo=20, mesh=mesh
        )
    )
    assert got.shape == want.shape == (1, 768, 128, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sharded_uneven_h_matches_unsharded(rng):
    """H not divisible by the mesh axis: reflect-pad + crop + bottom-edge
    recompute must still be exact (VERDICT r2 item #4's uneven-H case)."""
    mesh = make_mesh(n_data=8)
    model = RRDBNet(nf=16, nb=1, gc=8, upscale=4)
    x = jnp.asarray(rng.random((1, 180, 32, 3)).astype(np.float32))  # 180 % 8 != 0
    v = model.init(jax.random.key(0), x)

    want = np.asarray(model.apply(v, x))
    got = np.asarray(
        spatially_sharded_apply(
            x, lambda t: model.apply(v, t), scale=4, halo=20, mesh=mesh
        )
    )
    assert got.shape == want.shape == (1, 720, 128, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sharded_identity_scale1(rng):
    mesh = make_mesh(n_data=8)
    x = jnp.asarray(rng.random((2, 64, 16, 3)).astype(np.float32))

    def blur(t):
        k = jnp.ones((3, 3, 1, 1), t.dtype) / 9.0
        k = jnp.tile(k, (1, 1, 1, t.shape[-1]))
        return jax.lax.conv_general_dilated(
            t, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=t.shape[-1],
        )

    want = np.asarray(blur(x))
    got = np.asarray(
        spatially_sharded_apply(x, blur, scale=1, halo=2, mesh=mesh)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
