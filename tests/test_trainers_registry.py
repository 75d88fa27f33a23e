"""1-step tests for every registry trainer (SURVEY.md §4: a 1-step train
test per model on synthetic data)."""

import jax
import numpy as np
import pytest

from dasr_tpu.models.registry import create_model

BASE_NET_G = {"which_model_G": "RRDB_net", "nf": 16, "nb": 1, "gc": 8,
              "in_nc": 3, "out_nc": 3, "norm_type": None, "mode": "CNA"}


def _paired_batch(rng, b=2, lr=8, scale=4):
    hr = lr * scale
    return {
        "LR": rng.random((b, lr, lr, 3)).astype(np.float32),
        "HR": rng.random((b, hr, hr, 3)).astype(np.float32),
    }


def _unpaired_batch(rng, b=2, lr=8, scale=4):
    hr = lr * scale
    return {
        "LR_fake": rng.random((b, lr, lr, 3)).astype(np.float32),
        "LR_real": rng.random((b, lr, lr, 3)).astype(np.float32),
        "HR": rng.random((b, hr, hr, 3)).astype(np.float32),
        "HR_unpair": rng.random((b, hr, hr, 3)).astype(np.float32),
        "fake_w": rng.random((b, lr // 2, lr // 2, 1)).astype(np.float32),
    }


def test_sr_model(rng):
    opt = {"model": "sr", "scale": 4, "network_G": BASE_NET_G,
           "train": {"lr_G": 1e-4, "lr_steps": [10], "pixel_criterion": "l1"}}
    m = create_model(opt).init(lr_size=8)
    metrics = m.train_step(_paired_batch(rng))
    assert np.isfinite(metrics["loss/l_pix"])
    sr = m.test(rng.random((8, 8, 3)).astype(np.float32))
    assert sr.shape == (32, 32, 3)


@pytest.mark.parametrize("name", ["srgan", "srragan"])
def test_srgan_models(rng, name):
    opt = {
        "model": name, "scale": 4, "network_G": BASE_NET_G,
        "network_D": {"nf": 16},
        "datasets": {"train": {"HR_size": 32}},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "lr_steps": [10],
                  "pixel_weight": 1e-2, "feature_weight": 1.0,
                  "gan_type": "vanilla", "gan_weight": 5e-3},
    }
    m = create_model(opt).init(lr_size=8)
    metrics = m.train_step(_paired_batch(rng))
    for k in ("loss/l_g_pix", "loss/l_g_fea", "loss/l_g_gan", "loss/l_d_total"):
        assert k in metrics and np.isfinite(metrics[k]), k


def test_degradation_model(rng):
    opt = {"model": "De_Resnet", "scale": 4,
           "network_G": {"which_model_G": "De_Resnet", "nb": 1},
           "train": {"lr_G": 1e-4, "lr_steps": [10]}}
    m = create_model(opt).init(lr_size=8)
    metrics = m.train_step(_paired_batch(rng))
    assert np.isfinite(metrics["loss/l_pix"])
    lr = m.test(rng.random((32, 32, 3)).astype(np.float32))
    assert lr.shape == (8, 8, 3)


def test_depatch_model(rng):
    opt = {"model": "De_patch_wavelet_GAN", "scale": 4,
           "network_G": {"which_model_G": "De_Resnet", "nb": 1},
           "train": {"lr_G": 1e-4, "lr_D": 1e-4, "lr_steps": [10],
                     "feature_weight": 0.0}}
    m = create_model(opt).init(lr_size=16)
    batch = {
        "HR": rng.random((2, 64, 64, 3)).astype(np.float32),
        "LR": rng.random((2, 16, 16, 3)).astype(np.float32),
    }
    metrics = m.train_step(batch)
    for k in ("loss/l_g_pix", "loss/l_g_gan", "loss/l_d_total"):
        assert k in metrics and np.isfinite(metrics[k]), k
    rmap = m.realness_map(rng.random((16, 16, 3)).astype(np.float32))
    assert rmap.shape == (8, 8)  # wavelet half-res
    assert np.isfinite(rmap).all()


def test_dasr_adaptive_model(rng):
    opt = {
        "model": "DASR_Adaptive_Model", "scale": 4, "adaptive_weights": True,
        "network_G": {"which_model_G": "RRDB_Residual_conv", "nf": 16, "nb": 1,
                      "gc": 8, "ada_nb": 1},
        "network_D": {"nf": 16, "in_nc": 9, "n_layers": 2},
        "network_patchD": {"which_patchD": "FSD", "FS_type": "avg_pool",
                           "kernel_size": 5, "norm_layer": "Instance"},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "lr_steps": [10],
                  "fs": "wavelet", "norm": True, "sup_LL": True,
                  "pixel_weight": 1, "pixel_LL_weight": 1,
                  "feature_criterion": "LPIPS", "feature_weight": 1,
                  "gan_type": "vanilla", "gan_H_target": 0.005,
                  "use_patchD_opt": True},
    }
    m = create_model(opt).init(lr_size=8)
    metrics = m.train_step(_unpaired_batch(rng))
    for k in ("loss/l_g_pix", "loss/l_g_fea", "loss/l_g_gan_target_Hf",
              "loss/l_d_target_total", "loss/patch_D_gan_loss"):
        assert k in metrics and np.isfinite(metrics[k]), k
    sr = m.test(rng.random((8, 8, 3)).astype(np.float32))
    assert sr.shape == (32, 32, 3)


def test_dasr_adaptive_multi_step_matches_sequential(rng):
    import copy

    import jax

    opt = {
        "model": "DASR_Adaptive_Model", "scale": 4, "adaptive_weights": True,
        "network_G": {"which_model_G": "RRDB_Residual_conv", "nf": 16, "nb": 1,
                      "gc": 8, "ada_nb": 1},
        "network_D": {"nf": 16, "in_nc": 9, "n_layers": 2},
        "network_patchD": {"which_patchD": "FSD", "FS_type": "avg_pool",
                           "kernel_size": 5, "norm_layer": "Instance"},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "lr_steps": [10],
                  "fs": "wavelet", "norm": True, "sup_LL": True,
                  "pixel_weight": 1, "pixel_LL_weight": 1,
                  "feature_criterion": "LPIPS", "feature_weight": 1,
                  "gan_type": "vanilla", "gan_H_target": 0.005,
                  "use_patchD_opt": True},
    }
    m_seq = create_model(opt).init(lr_size=8)
    m_multi = create_model(copy.deepcopy(opt)).init(lr_size=8)
    # identical init: copy the sequential model's state
    m_multi.state = m_seq.state
    b1, b2 = _unpaired_batch(rng), _unpaired_batch(rng)

    m_seq.train_step(b1)
    m2 = m_seq.train_step(b2)
    mm = m_multi.train_multi_step([b1, b2])
    assert m_multi.supports_multi_step
    for k in m2:
        # mm is the K-mean; compare the params instead for exactness
        assert np.isfinite(mm[k]), k
    for a, b in zip(
        jax.tree.leaves(m_multi.state.base.g.params),
        jax.tree.leaves(m_seq.state.base.g.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_srgan_trainer_multi_step_matches_sequential(rng):
    import jax
    import jax.numpy as jnp

    from dasr_tpu.train.srgan_trainer import SRGANConfig, SRGANTrainer

    cfg = SRGANConfig(nf=16, nb=1, gc=8, d_nf=16, d_input_size=32,
                      feature_weight=0.0, d_update_ratio=1, d_init_iters=0)
    tr = SRGANTrainer(cfg)
    state0 = tr.init_state(jax.random.key(0), lr_size=8)

    def mk():
        return {
            "LR": jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32)),
            "HR": jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32)),
        }

    b1, b2 = mk(), mk()
    rngs = jax.random.split(jax.random.key(7), 2)
    s_seq, _ = tr.train_step(state0, b1, rng=rngs[0])
    s_seq, _ = tr.train_step(s_seq, b2, rng=rngs[1])
    stacked = {k: jnp.stack([b1[k], b2[k]]) for k in b1}
    s_multi, _ = tr.train_multi_step(state0, stacked, rng=jax.random.key(7))
    # same per-step rngs -> identical params
    for a, b in zip(
        jax.tree.leaves(s_multi.g.params), jax.tree.leaves(s_seq.g.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_adaptive_concat_variant(rng):
    import jax.numpy as jnp

    from dasr_tpu.nn.generators import RRDBNetResidualConv

    m = RRDBNetResidualConv(nf=16, nb=1, gc=8, nb_ada=1, concat=True, upscale=4)
    x = jnp.zeros((1, 8, 8, 3))
    w = jnp.zeros((1, 8, 8, 1))
    v = m.init(jax.random.key(0), x, w)
    assert m.apply(v, x, w).shape == (1, 32, 32, 3)


def test_batched_val_matches_per_image(rng):
    """`test_batch_async` (srn_train val_batch path) must be numerically
    identical to the per-image plain forward — same `_apply_g`, just
    stacked (VERDICT r2 weak #2 follow-on: batched validation)."""
    opt = {"model": "sr", "scale": 4, "network_G": BASE_NET_G,
           "train": {"lr_G": 1e-4, "lr_steps": [10], "pixel_criterion": "l1"}}
    m = create_model(opt).init(lr_size=8)
    imgs = [rng.random((8, 8, 3)).astype(np.float32) for _ in range(3)]
    batched = np.asarray(m.test_batch_async(imgs))
    for j, im in enumerate(imgs):
        np.testing.assert_array_equal(batched[j], m.test(im))
    # uint8 inputs follow the same /255 wire convention as test()
    u8 = [(im * 255).astype(np.uint8) for im in imgs]
    batched_u8 = np.asarray(m.test_batch_async(u8))
    for j, im in enumerate(u8):
        np.testing.assert_array_equal(batched_u8[j], m.test(im))
