"""DASR trainer frequency-separation variants (gau / avgpool) and
no-multiweights path — config coverage beyond the shipped wavelet default."""

import jax
import numpy as np
import pytest

from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer


def _batch(rng, b=2, lr=8, scale=4, ddm_half=False):
    hr = lr * scale
    ddm = lr // 2 if ddm_half else lr
    return {
        "LR_fake": rng.random((b, lr, lr, 3)).astype(np.float32),
        "LR_real": rng.random((b, lr, lr, 3)).astype(np.float32),
        "HR": rng.random((b, hr, hr, 3)).astype(np.float32),
        "HR_unpair": rng.random((b, hr, hr, 3)).astype(np.float32),
        "fake_w": rng.random((b, ddm, ddm, 1)).astype(np.float32),
    }


@pytest.mark.parametrize("fs", ["gau", "avgpool"])
def test_fs_filter_variants(rng, fs):
    cfg = SRNConfig(nf=16, nb=1, gc=8, d_nf=16, fs=fs, d_in_nc=3)
    tr = SRNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=8)
    state, metrics = tr.train_step(state, _batch(rng))
    for k in ("loss/l_g_pix", "loss/l_g_gan_target_Hf", "loss/l_d_target_total"):
        assert np.isfinite(float(metrics[k])), k


def test_no_multiweights_plain_l1(rng):
    cfg = SRNConfig(nf=16, nb=1, gc=8, d_nf=16, multiweights=False)
    tr = SRNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=8)
    state, metrics = tr.train_step(state, _batch(rng, ddm_half=True))
    assert np.isfinite(float(metrics["loss/l_g_pix"]))


def test_l2_pixel_and_no_feature(rng):
    cfg = SRNConfig(nf=16, nb=1, gc=8, d_nf=16, pixel_criterion="l2",
                    feature_weight=0.0, multiweights=False)
    tr = SRNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=8)
    state, metrics = tr.train_step(state, _batch(rng, ddm_half=True))
    assert "loss/l_g_fea" not in metrics
    assert np.isfinite(float(metrics["loss/l_g_pix"]))
