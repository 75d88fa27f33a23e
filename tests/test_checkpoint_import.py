"""Torch-checkpoint import parity.

Oracles are torch *functional* pipelines written here from the documented
layer semantics (not reference module code), driven by the same weights the
importer consumes. This simultaneously validates:
  * the state-dict -> flax param mapping, and
  * numerical torch-parity of RRDBNet / DeResnet / FSD forwards.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dasr_tpu.nn.discriminators import FSDiscriminator
from dasr_tpu.nn.generators import DeResnet, RRDBNet
from dasr_tpu.train.checkpoints import (
    import_deresnet_params,
    import_fsd_discriminator_params,
    import_rrdbnet_params,
    load_dsn_tar,
)

REF_TAR = "/root/reference/codes/DSN/test.tar"


def _rand_conv(key, cin, cout, k=3):
    g = torch.Generator().manual_seed(key)
    return (
        torch.randn(cout, cin, k, k, generator=g) * 0.05,
        torch.randn(cout, generator=g) * 0.01,
    )


def _make_rrdb_sd(nb=2, nf=16, gc=8):
    sd = {}
    idx = 0

    def add(name, cin, cout, k=3):
        nonlocal idx
        w, b = _rand_conv(idx, cin, cout, k)
        sd[name + ".weight"] = w
        sd[name + ".bias"] = b
        idx += 1

    add("model.0", 3, nf)
    for i in range(nb):
        for j in (1, 2, 3):
            for k in range(1, 6):
                cin = nf + (k - 1) * gc
                cout = gc if k < 5 else nf
                add(f"model.1.sub.{i}.RDB{j}.conv{k}.0", cin, cout)
    add(f"model.1.sub.{nb}", nf, nf)
    add("model.3", nf, nf)
    add("model.6", nf, nf)
    add("model.8", nf, nf)
    add("model.10", nf, 3)
    return sd


def _torch_rrdb_forward(sd, x, nb=2, nf=16, gc=8):
    """Functional ESRGAN forward per architecture.py:174-205 semantics."""

    def lrelu(v):
        return F.leaky_relu(v, 0.2)

    def c(p, v, pad=1):
        return F.conv2d(v, sd[p + ".weight"], sd[p + ".bias"], padding=pad)

    def rdb(prefix, v):
        x1 = lrelu(c(prefix + ".conv1.0", v))
        x2 = lrelu(c(prefix + ".conv2.0", torch.cat([v, x1], 1)))
        x3 = lrelu(c(prefix + ".conv3.0", torch.cat([v, x1, x2], 1)))
        x4 = lrelu(c(prefix + ".conv4.0", torch.cat([v, x1, x2, x3], 1)))
        x5 = c(prefix + ".conv5.0", torch.cat([v, x1, x2, x3, x4], 1))
        return v + 0.2 * x5

    fea = c("model.0", x)
    h = fea
    for i in range(nb):
        inner = h
        for j in (1, 2, 3):
            inner = rdb(f"model.1.sub.{i}.RDB{j}", inner)
        h = h + 0.2 * inner
    h = fea + c(f"model.1.sub.{nb}", h)
    for p in ("model.3", "model.6"):
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = lrelu(c(p, h))
    h = lrelu(c("model.8", h))
    return c("model.10", h)


def test_rrdbnet_import_matches_torch_oracle(rng):
    nb, nf, gc = 2, 16, 8
    sd = _make_rrdb_sd(nb, nf, gc)
    x = rng.random((1, 12, 12, 3)).astype(np.float32)

    want = _torch_rrdb_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), nb, nf, gc
    ).numpy().transpose(0, 2, 3, 1)

    params = import_rrdbnet_params({k: v.numpy() for k, v in sd.items()}, nb=nb)
    model = RRDBNet(nf=nf, nb=nb, gc=gc, upscale=4)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _make_deresnet_sd(n_blocks=2, scale=4):
    sd = {}
    idx = 100

    def add_conv(name, cin, cout):
        nonlocal idx
        w, b = _rand_conv(idx, cin, cout)
        sd[name + ".weight"] = w
        sd[name + ".bias"] = b
        idx += 1

    def add_prelu(name):
        sd[name + ".weight"] = torch.tensor([0.21])

    add_conv("block_input.0", 3, 16)
    add_prelu("block_input.1")
    for i in range(n_blocks):
        add_conv(f"res_blocks.{i}.conv1", 16, 16)
        add_prelu(f"res_blocks.{i}.prelu")
        add_conv(f"res_blocks.{i}.conv2", 16, 16)
    for d in range(2):
        add_conv(f"down_sample.{2 * d}", 16, 16)
        add_prelu(f"down_sample.{2 * d + 1}")
    add_conv("block_output", 16, 3)
    return sd


def test_rrdbnet_gradient_matches_torch_oracle(rng):
    """Autodiff parity of the grouped-scatter trunk: d(sum(RRDBNet(x)))/dx
    must match the torch chain's input gradient — validates the backward
    (conv-transpose) path of the production trunk rewrite, not just the
    forward."""
    nb, nf, gc = 2, 16, 8
    sd = _make_rrdb_sd(nb, nf, gc)
    x = rng.random((1, 12, 12, 3)).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    _torch_rrdb_forward(sd, xt, nb, nf, gc).sum().backward()
    want = xt.grad.numpy().transpose(0, 2, 3, 1)

    params = import_rrdbnet_params({k: v.numpy() for k, v in sd.items()}, nb=nb)
    model = RRDBNet(nf=nf, nb=nb, gc=gc, upscale=4)

    got = np.asarray(
        jax.grad(lambda xi: model.apply(params, xi).sum())(jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)

    # the scanned trunk must backprop identically too
    model_s = RRDBNet(nf=nf, nb=nb, gc=gc, upscale=4, scan_blocks=True)
    got_s = np.asarray(
        jax.grad(lambda xi: model_s.apply(params, xi).sum())(jnp.asarray(x))
    )
    np.testing.assert_allclose(got_s, want, rtol=1e-4, atol=2e-4)


def _torch_deresnet_forward(sd, x, n_blocks=2):
    def prelu(v, key):
        return F.prelu(v, sd[key + ".weight"])

    def c(p, v, stride=1):
        return F.conv2d(v, sd[p + ".weight"], sd[p + ".bias"], stride=stride, padding=1)

    h = prelu(c("block_input.0", x), "block_input.1")
    for i in range(n_blocks):
        r = prelu(c(f"res_blocks.{i}.conv1", h), f"res_blocks.{i}.prelu")
        h = h + c(f"res_blocks.{i}.conv2", r)
    for d in range(2):
        h = prelu(c(f"down_sample.{2 * d}", h, stride=2), f"down_sample.{2 * d + 1}")
    return torch.sigmoid(c("block_output", h))


def test_deresnet_import_matches_torch_oracle(rng):
    sd = _make_deresnet_sd()
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    want = _torch_deresnet_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)

    np_sd = {k: v.numpy() for k, v in sd.items()}
    # flax DeResnet(features=16) matches this sd's channel plan
    params = import_deresnet_params(np_sd, n_res_blocks=2, scale=4)
    model = DeResnet(n_res_blocks=2, scale=4, features=16)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_TAR), reason="reference not mounted")
def test_fsd_import_from_reference_tar(rng):
    """Import the reference's bundled D state dict and parity-check vs a
    torch functional replica (gaussian high-pass + FSD body, BatchNorm eval)."""
    sd = {
        k: v.numpy()
        for k, v in torch.load(REF_TAR, map_location="cpu", weights_only=False).items()
    }
    variables = import_fsd_discriminator_params(sd, norm_layer="Batch")
    model = FSDiscriminator(
        d_arch="FSD", filter_type="gau", norm_layer="Batch",
        use_running_average=True,
    )
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))

    # torch functional oracle
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    gk = torch.from_numpy(sd["filter.filter_low.filter.gaussian_filter.weight"])
    low = F.conv2d(t, gk, padding=2, groups=3)
    hf = 0.5 + (t - low) * 0.5

    def bn(v, p):
        return F.batch_norm(
            v,
            torch.from_numpy(sd[p + ".running_mean"]),
            torch.from_numpy(sd[p + ".running_var"]),
            torch.from_numpy(sd[p + ".weight"]),
            torch.from_numpy(sd[p + ".bias"]),
            training=False,
        )

    def c(v, p, pad):
        return F.conv2d(
            v, torch.from_numpy(sd[p + ".weight"]), torch.from_numpy(sd[p + ".bias"]),
            padding=pad,
        )

    v = F.leaky_relu(c(hf, "net.net.0", 2), 0.2)
    v = F.leaky_relu(bn(c(v, "net.net.2", 2), "net.net.3"), 0.2)
    v = F.leaky_relu(bn(c(v, "net.net.5", 2), "net.net.6"), 0.2)
    want = torch.sigmoid(c(v, "net.net.8", 0)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.skipif(not os.path.exists(REF_TAR), reason="reference not mounted")
def test_load_dsn_tar_shape():
    d = load_dsn_tar(REF_TAR)
    # test.tar is a bare D state dict (no wrapper keys); loader passes it through
    assert isinstance(d, dict)
