"""1-step training tests on synthetic data (SURVEY.md §4) + SPMD checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.core import mesh as meshlib
from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer
from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer

TINY_DSN = DSNConfig(num_res_blocks=1, kernel_size=5, w_tex=0.005, w_per=0.01)
TINY_SRN = SRNConfig(nf=16, nb=1, gc=8, d_nf=16)


def _dsn_batch(rng, b=2, hr=128):
    lr = hr // 4
    return {
        "input": jnp.asarray(rng.random((b, hr, hr, 3)).astype(np.float32)),
        "bicubic": jnp.asarray(rng.random((b, lr, lr, 3)).astype(np.float32)),
        "disc": jnp.asarray(rng.random((b, lr, lr, 3)).astype(np.float32)),
    }


def _srn_batch(rng, b=2, lr=8, scale=4, ddm_half=True):
    hr = lr * scale
    ddm_hw = lr // 2 if ddm_half else lr
    return {
        "LR_fake": jnp.asarray(rng.random((b, lr, lr, 3)).astype(np.float32)),
        "LR_real": jnp.asarray(rng.random((b, lr, lr, 3)).astype(np.float32)),
        "HR": jnp.asarray(rng.random((b, hr, hr, 3)).astype(np.float32)),
        "HR_unpair": jnp.asarray(rng.random((b, hr, hr, 3)).astype(np.float32)),
        "fake_w": jnp.asarray(rng.random((b, ddm_hw, ddm_hw, 1)).astype(np.float32)),
    }


def _tree_l2_diff(a, b):
    d = jax.tree.map(lambda x, y: float(jnp.sum((x - y) ** 2)), a, b)
    return sum(jax.tree.leaves(d))


def test_dsn_one_step_updates_and_finite(rng):
    tr = DSNTrainer(TINY_DSN)
    state = tr.init_state(jax.random.key(0), lr_size=32, hr_size=128)
    batch = _dsn_batch(rng)
    new_state, metrics = tr.train_step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert new_state.step == 1
    assert _tree_l2_diff(new_state.g.params, state.g.params) > 0
    assert _tree_l2_diff(new_state.d_target.params, state.d_target.params) > 0


def test_dsn_multi_step_matches_sequential(rng):
    tr = DSNTrainer(TINY_DSN)
    state0 = tr.init_state(jax.random.key(0), lr_size=32, hr_size=128)
    b1, b2 = _dsn_batch(rng), _dsn_batch(rng)

    s_seq, _ = tr.train_step(state0, b1)
    s_seq, m2 = tr.train_step(s_seq, b2)

    stacked = {k: jnp.stack([b1[k], b2[k]]) for k in b1}
    s_multi, m_stacked = tr.train_multi_step(state0, stacked)

    assert int(s_multi.step) == int(s_seq.step) == 2
    for k in m2:
        np.testing.assert_allclose(
            np.asarray(m_stacked[k][-1]), float(m2[k]),
            rtol=2e-5, atol=2e-6, err_msg=k,
        )
    for a, b in zip(
        jax.tree.leaves(s_multi.g.params), jax.tree.leaves(s_seq.g.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)


def test_dsn_device_bicubic_matches_host(rng):
    """Omitting "bicubic" makes the step compute the MATLAB downscale on
    device — must match feeding the host-computed one (same matrices)."""
    tr = DSNTrainer(TINY_DSN)
    state0 = tr.init_state(jax.random.key(0), lr_size=32, hr_size=128)
    batch = _dsn_batch(rng)
    from dasr_tpu.ops.resize import imresize_np

    batch = dict(batch)
    batch["bicubic"] = jnp.asarray(
        np.stack([imresize_np(np.asarray(x), 0.25) for x in batch["input"]])
    )
    s_host, m_host = tr.train_step(state0, batch)

    no_bic = {k: v for k, v in batch.items() if k != "bicubic"}
    s_dev, m_dev = tr.train_step(state0, no_bic)
    for k in m_host:
        np.testing.assert_allclose(
            float(m_dev[k]), float(m_host[k]), rtol=2e-4, atol=2e-5, err_msg=k
        )
    for a, b in zip(
        jax.tree.leaves(s_dev.g.params), jax.tree.leaves(s_host.g.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_dsn_gating():
    tr = DSNTrainer(TINY_DSN)
    state = tr.init_state(jax.random.key(0), lr_size=32, hr_size=128)
    batch = _dsn_batch(np.random.default_rng(1))
    s2, _ = tr.train_step(state, batch, do_g=False, do_d=True)
    assert _tree_l2_diff(s2.g.params, state.g.params) == 0
    assert _tree_l2_diff(s2.d_target.params, state.d_target.params) > 0


def test_srn_dasr_one_step(rng):
    tr = SRNTrainer(TINY_SRN)
    state = tr.init_state(jax.random.key(0), lr_size=8)
    batch = _srn_batch(rng)
    new_state, metrics = tr.train_step(state, batch)
    for k in (
        "loss/l_g_pix",
        "loss/l_g_LL_pix",
        "loss/l_g_fea",
        "loss/l_g_gan_target_Hf",
        "loss/l_d_target_total",
    ):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert _tree_l2_diff(new_state.g.params, state.g.params) > 0
    assert _tree_l2_diff(new_state.d_target.params, state.d_target.params) > 0


def test_srn_multi_step_matches_sequential(rng):
    """lax.scan multi-step (one dispatch) must equal K sequential steps."""
    tr = SRNTrainer(TINY_SRN)
    state0 = tr.init_state(jax.random.key(0), lr_size=8)
    b1, b2 = _srn_batch(rng), _srn_batch(rng)

    s_seq, m1 = tr.train_step(state0, b1)
    s_seq, m2 = tr.train_step(s_seq, b2)

    stacked = {k: jnp.stack([b1[k], b2[k]]) for k in b1}
    s_multi, m_stacked = tr.train_multi_step(state0, stacked)

    assert int(s_multi.step) == int(s_seq.step) == 2
    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m_stacked[k]),
            np.asarray([float(m1[k]), float(m2[k])]),
            rtol=2e-5, atol=2e-6, err_msg=k,
        )
    for a, b in zip(
        jax.tree.leaves(s_multi.g.params), jax.tree.leaves(s_seq.g.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)


def test_srn_dual_domain_and_ragan(rng):
    cfg = SRNConfig(nf=16, nb=1, gc=8, d_nf=16, gan_H_source=0.005, ragan=True)
    tr = SRNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=8)
    batch = _srn_batch(rng)
    new_state, metrics = tr.train_step(state, batch)
    assert "loss/l_g_gan_source_H" in metrics
    assert "loss/l_d_total" in metrics
    assert _tree_l2_diff(new_state.d_source.params, state.d_source.params) > 0


def test_srn_step_sharded_matches_single_device(rng):
    """The same step under an 8-way data mesh must match 1-device numerics."""
    mesh = meshlib.make_mesh(n_data=8)
    batch = _srn_batch(rng, b=8)

    tr1 = SRNTrainer(TINY_SRN)
    state1 = tr1.init_state(jax.random.key(0), lr_size=8)
    out1, m1 = tr1.train_step(state1, batch)

    tr8 = SRNTrainer(TINY_SRN, mesh=mesh, lpips_variables=tr1.lpips_variables)
    state8 = tr8.init_state(jax.random.key(0), lr_size=8)
    sharded = meshlib.shard_batch(mesh, batch)
    out8, m8 = tr8.train_step(state8, sharded)

    # CPU matmul reassociation across shards costs a few ULPs; the params
    # themselves must agree tightly.
    diff = _tree_l2_diff(out1.g.params, out8.g.params)
    assert diff < 1e-8, diff
    np.testing.assert_allclose(
        float(m1["loss/l_g_total"]), float(m8["loss/l_g_total"]), rtol=1e-4
    )


def test_dsn_dsgan_generator_mode(rng):
    """DSGAN mode: G operates on the bicubic LR, target is the input
    (reference: DSN/train.py:215-218, loss vs input_img)."""
    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer

    cfg = DSNConfig(generator="DSGAN", num_res_blocks=1, use_per_loss=False)
    tr = DSNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=16, hr_size=64)
    batch = {
        "input": np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32),
        "bicubic": np.random.default_rng(1).random((2, 16, 16, 3)).astype(np.float32),
        "disc": np.random.default_rng(2).random((2, 16, 16, 3)).astype(np.float32),
    }
    new_state, metrics = tr.train_step(state, batch)
    assert np.isfinite(float(metrics["loss/g_overall_loss"]))
    assert _tree_l2_diff(new_state.g.params, state.g.params) > 0


def test_srn_overfits_single_batch(rng):
    """Functional learning check: 40 steps on one batch must cut the
    pixel loss substantially (gradients + optimizers wired correctly)."""
    cfg = SRNConfig(nf=16, nb=1, gc=8, d_nf=16, feature_weight=0.0,
                    gan_H_target=0.0, multiweights=False)
    tr = SRNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=8)
    batch = _srn_batch(rng)
    first = None
    for _ in range(40):
        state, metrics = tr.train_step(state, batch)
        if first is None:
            first = float(metrics["loss/l_g_pix"])
    last = float(metrics["loss/l_g_pix"])
    assert last < first * 0.7, (first, last)


def test_dsn_uint8_sharded_matches_f32(rng):
    """--transfer_uint8 on a multi-device mesh: raw uint8 batches go through
    shard_batch (no packed-upload pre-cast), so the trainer itself must
    cast u8 -> f32/255. Regression for the round-2 advisor finding: the
    sharded path trained on 0-255-scale inputs."""
    mesh = meshlib.make_mesh(n_data=8)
    u8 = {
        "input": (rng.random((8, 64, 64, 3)) * 255).astype(np.uint8),
        "bicubic": (rng.random((8, 16, 16, 3)) * 255).astype(np.uint8),
        "disc": (rng.random((8, 16, 16, 3)) * 255).astype(np.uint8),
    }
    f32 = {k: v.astype(np.float32) / 255.0 for k, v in u8.items()}

    cfg = DSNConfig(num_res_blocks=1, use_per_loss=False)
    tr = DSNTrainer(cfg, mesh=mesh)
    state = tr.init_state(jax.random.key(0), lr_size=16, hr_size=64)

    s_u8, m_u8 = tr.train_step(state, meshlib.shard_batch(mesh, u8))
    s_f32, m_f32 = tr.train_step(state, meshlib.shard_batch(mesh, f32))
    np.testing.assert_allclose(
        float(m_u8["loss/g_overall_loss"]),
        float(m_f32["loss/g_overall_loss"]),
        rtol=1e-6,
    )
    # in-graph u8/255 fuses differently than the precomputed host division
    # (reassociation ULPs); anything near 255x-scale wrongness would be huge
    assert _tree_l2_diff(s_u8.g.params, s_f32.g.params) < 1e-6


def test_dsn_ragan_mode(rng):
    """RaGAN DSN: D scores are relativistic pairs (DSN/train.py:220-223)."""
    cfg = DSNConfig(num_res_blocks=1, ragan=True, use_per_loss=False)
    tr = DSNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=16, hr_size=64)
    batch = {
        "input": jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)), jnp.float32),
        "bicubic": jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 3)), jnp.float32),
        "disc": jnp.asarray(np.random.default_rng(2).random((2, 16, 16, 3)), jnp.float32),
    }
    new_state, metrics = tr.train_step(state, batch)
    assert np.isfinite(float(metrics["loss/d_tex_loss"]))
    assert _tree_l2_diff(new_state.d_target.params, state.d_target.params) > 0
