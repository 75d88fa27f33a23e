"""LPIPS linear-head import from the reference's bundled v0.1 weights."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.losses.lpips import (
    LPIPS,
    load_lpips_params,
    reference_lin_weights_path,
)

LIN = reference_lin_weights_path("alex")


@pytest.mark.skipif(LIN is None, reason="reference weights not mounted")
def test_lin_head_import_shapes_and_values():
    import torch

    lpips = LPIPS(net="alex")
    z = jnp.zeros((1, 64, 64, 3))
    base = lpips.init(jax.random.key(0), z, z)
    params = load_lpips_params("alex", lin_path=LIN, base_params=base)

    sd = torch.load(LIN, map_location="cpu", weights_only=True)
    for k in range(5):
        w_ref = sd[f"lin{k}.model.1.weight"].numpy()[0, :, 0, 0]
        w_got = np.asarray(params["params"][f"lin{k}"])[:, 0]
        np.testing.assert_allclose(w_got, w_ref, atol=1e-7)
        assert (w_ref >= 0).all()  # published heads are nonnegative


@pytest.mark.skipif(LIN is None, reason="reference weights not mounted")
def test_lpips_with_imported_heads_on_reference_images(rng):
    """Run the metric on the reference's bundled example images; with
    random backbones the absolute value is meaningless, but the metric must
    be 0 on identical inputs and positive otherwise."""
    from dasr_tpu.data.io import read_img

    imgs_dir = "/root/reference/codes/PerceptualSimilarity/imgs"
    ref = read_img(os.path.join(imgs_dir, "ex_ref.png"))
    p0 = read_img(os.path.join(imgs_dir, "ex_p0.png"))

    lpips = LPIPS(net="alex")
    z = jnp.zeros((1,) + ref.shape)
    base = lpips.init(jax.random.key(0), z, z)
    params = load_lpips_params("alex", lin_path=LIN, base_params=base)

    a = jnp.asarray(ref)[None] * 2 - 1
    b = jnp.asarray(p0)[None] * 2 - 1
    d_same = float(lpips.apply(params, a, a)[0, 0, 0, 0])
    d_diff = float(lpips.apply(params, a, b)[0, 0, 0, 0])
    assert abs(d_same) < 1e-6
    assert d_diff > 0
