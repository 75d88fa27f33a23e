"""Two-way reference checkpoint interop (VERDICT round-1 item #3).

Round-trip strategy: export flax params with the key-map exporters, drive
torch *functional* oracles (written here from documented semantics) with the
exported state dicts, and assert the torch forward equals the flax forward.
The reverse direction (torch sd -> importer -> flax) shares the same key
maps, plus exact export->import round trips and Adam .state mapping tests.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dasr_tpu.nn.discriminators import DiscriminatorVGG, NLayerDiscriminator
from dasr_tpu.nn.generators import RRDBNet
from dasr_tpu.train import checkpoints as ck


def test_rrdbnet_export_drives_torch_oracle(rng):
    """save here -> load in torch oracle -> identical forward."""
    from test_checkpoint_import import _torch_rrdb_forward

    nb, nf, gc = 2, 16, 8
    model = RRDBNet(nf=nf, nb=nb, gc=gc, upscale=4)
    x = rng.random((1, 12, 12, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x))
    want = np.asarray(model.apply(variables, jnp.asarray(x)))

    sd = ck.export_params_to_state_dict(variables, ck.rrdbnet_key_map(nb))
    got = _torch_rrdb_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), nb, nf, gc
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5)

    # export -> import round trip is exact
    back = ck.import_params_from_key_map(
        {k: v.numpy() for k, v in sd.items()}, ck.rrdbnet_key_map(nb)
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _torch_nlayer_forward(sd, x, n_layers):
    """Functional NLayerDiscriminator (architecture.py:983-1024): conv s2 +
    lrelu, then (conv s2 nobias + InstanceNorm + lrelu) x (n_layers-1), a
    stride-1 block, and a 1-channel conv head."""

    def inorm(v):
        return F.instance_norm(v, eps=1e-5)

    def c(i, v, s):
        w = sd[f"model.{i}.weight"]
        b = sd.get(f"model.{i}.bias")
        return F.conv2d(v, w, b, stride=s, padding=1)

    idxs = [0] + [2 + 3 * (n - 1) for n in range(1, n_layers)]
    idxs.append(2 + 3 * (n_layers - 1))
    idxs.append(idxs[-1] + 3)
    v = F.leaky_relu(c(idxs[0], x, 2), 0.2)
    for i in idxs[1:-2]:
        v = F.leaky_relu(inorm(c(i, v, 2)), 0.2)
    v = F.leaky_relu(inorm(c(idxs[-2], v, 1)), 0.2)
    return c(idxs[-1], v, 1)


def test_nlayer_d_interop(rng):
    n_layers, in_ch = 2, 9
    model = NLayerDiscriminator(
        in_ch=in_ch, ndf=16, n_layers=n_layers, norm_layer="Instance",
        stride=2, use_bias_middle=False,
    )
    x = rng.random((2, 16, 16, in_ch)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(model.apply(variables, jnp.asarray(x)))

    sd = ck.export_params_to_state_dict(variables, ck.nlayer_d_key_map(n_layers))
    # middle convs are bias-free in the reference; exporter emits biases for
    # flax's always-bias convs — zero biases make the oracle equivalent
    got = _torch_nlayer_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), n_layers
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5)

    back = ck.import_nlayer_d_params(
        {k: v.numpy() for k, v in sd.items()}, n_layers=n_layers
    )
    got2 = np.asarray(model.apply(back, jnp.asarray(x)))
    np.testing.assert_allclose(got2, want, atol=1e-6)


def _torch_vgg128_forward(sd, x):
    def bn(v, p):
        return F.batch_norm(
            v, sd[p + ".running_mean"], sd[p + ".running_var"],
            sd[p + ".weight"], sd[p + ".bias"], training=False,
        )

    def c(p, v, s):
        return F.conv2d(v, sd[p + ".weight"], sd.get(p + ".bias"), stride=s, padding=1)

    v = F.leaky_relu(c("conv0_0", x, 1), 0.2)
    v = F.leaky_relu(bn(c("conv0_1", v, 2), "bn0_1"), 0.2)
    for i in range(1, 5):
        v = F.leaky_relu(bn(c(f"conv{i}_0", v, 1), f"bn{i}_0"), 0.2)
        v = F.leaky_relu(bn(c(f"conv{i}_1", v, 2), f"bn{i}_1"), 0.2)
    v = v.reshape(v.size(0), -1)
    v = F.leaky_relu(F.linear(v, sd["linear1.weight"], sd["linear1.bias"]), 0.2)
    return F.linear(v, sd["linear2.weight"], sd["linear2.bias"])


def test_vgg128_d_interop(rng):
    model = DiscriminatorVGG(input_size=128, nf=64, use_running_average=True)
    x = rng.random((1, 128, 128, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    # randomize batch stats so the BN mapping is actually exercised
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(0).standard_normal(a.shape).astype(a.dtype)
        if a.ndim == 1 else a,
        variables,
    )
    want = np.asarray(model.apply(variables, jnp.asarray(x)))

    sd = ck.export_params_to_state_dict(variables, ck.vgg128_d_key_map())
    got = _torch_vgg128_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy()
    np.testing.assert_allclose(got, want, atol=3e-4)

    back = ck.import_vgg128_d_params({k: v.numpy() for k, v in sd.items()})
    got2 = np.asarray(model.apply(back, jnp.asarray(x)))
    np.testing.assert_allclose(got2, want, atol=1e-5)


def test_adam_state_round_trip(tmp_path):
    """optax adam state -> torch .state -> optax state is exact, and torch
    indices line up with the key-map registration order."""
    import optax

    nb = 1
    model = RRDBNet(nf=8, nb=nb, gc=4, upscale=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    tx = optax.adam(1e-4)
    opt_state = tx.init(variables)

    # run two real steps so moments are nonzero
    def loss(v):
        return jnp.mean(model.apply(v, jnp.ones((1, 8, 8, 3))) ** 2)

    params = variables
    for _ in range(2):
        g = jax.grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, upd)

    kmap = ck.rrdbnet_key_map(nb)
    sd = ck.export_adam_state(opt_state, kmap, params)
    assert sd["state"][0]["step"] == 2
    path = str(tmp_path / "5.state")
    ck.save_reference_training_state(path, epoch=1, it=5, optimizer_sds=[sd])
    st = ck.load_reference_training_state(path)
    assert st["iter"] == 5 and len(st["optimizers"]) == 1

    fresh = tx.init(params)
    restored = ck.import_adam_state(st["optimizers"][0], kmap, params, fresh)
    adam_orig = [p for p in opt_state if hasattr(p, "mu")][0]
    adam_back = [p for p in restored if hasattr(p, "mu")][0]
    assert int(adam_back.count) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(adam_orig.mu), jax.tree_util.tree_leaves(adam_back.mu)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(
        jax.tree_util.tree_leaves(adam_orig.nu), jax.tree_util.tree_leaves(adam_back.nu)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_dsn_tar_round_trip(tmp_path, rng):
    """save_dsn_tar output re-imports through the existing DSN importers."""
    from dasr_tpu.nn.discriminators import FSDiscriminator
    from dasr_tpu.nn.generators import DeResnet

    g = DeResnet(n_res_blocks=2, scale=4, features=64)
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    d = FSDiscriminator(d_arch="FSD", filter_type="avg_pool", norm_layer="Instance")
    dv = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))

    path = str(tmp_path / "last_iteration.tar")
    ck.save_dsn_tar(path, gv, dv, epoch=3, iteration=77, n_res_blocks=2)
    tar = ck.load_dsn_tar(path)
    assert tar["epoch"] == 3 and tar["iteration"] == 77
    gback = ck.import_deresnet_params(tar["model_g_state_dict"], n_res_blocks=2, scale=4)
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(g.apply(gback, jnp.asarray(x))),
        np.asarray(g.apply(gv, jnp.asarray(x))), atol=1e-6,
    )
    dback = ck.import_fsd_discriminator_params(
        tar["models_d_state_dict"], norm_layer="Instance"
    )
    xl = rng.random((1, 8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(d.apply(dback, jnp.asarray(xl))),
        np.asarray(d.apply(dv, jnp.asarray(xl))), atol=1e-6,
    )
