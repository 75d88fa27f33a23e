"""Torch-oracle trajectory tests for the remaining registry trainers.

With these, EVERY trainer in the reference's model registry
(codes/SRN/models/__init__.py:5-26) has a multi-step torch-oracle parity
test: DASR (test_dasr_step_oracle), DASR_Adaptive
(test_adaptive_step_oracle), srgan/srragan (test_srgan_step_oracle), DSN
(test_dsn_step_oracle), and here:

  * ``sr`` — SRModel pixel-only step (codes/SRN/models/SR_model.py:60-86);
  * ``De_Resnet`` — supervised degradation step
    (codes/SRN/models/Degradation_Resnet.py:61-84);
  * ``De_patch_wavelet_GAN`` — the DSN-recipe-in-SRN step
    (codes/SRN/models/DePatchGAN_wavelet_model.py:140-238). The reference's
    optimize_parameters always crashes as written (it passes
    ``wasserstein=True`` positionally to cri_gan_D and references the
    undefined ``grad_pen``, :211); the oracle replicates OUR documented
    repair — sigmoided -log losses, no grad penalty (see
    dasr_tpu/train/depatch_trainer.py docstring) — with the reference's
    update ordering (both nets' grads taken at pre-update params; the G
    gan term reuses the pre-update D scores, :229-238).
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from test_checkpoint_import import _torch_deresnet_forward, _torch_rrdb_forward
from test_dasr_step_oracle import _haar_bands_t, _lpips_alex_t, _lpips_params_t
from test_dsn_step_oracle import _fsd_body_t

from dasr_tpu.models.registry import create_model
from dasr_tpu.train import checkpoints as ck
from dasr_tpu.train.degradation_trainer import DegradationConfig, DegradationTrainer
from dasr_tpu.train.depatch_trainer import DePatchConfig, DePatchTrainer

EPS = 1e-8
B = 2


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


# Pixel-loss targets are offset by +2 so (prediction - target) never crosses
# zero: L1's gradient is sign(d), and elements where |d| ~ f32 noise get a
# framework-dependent sign — a test artifact (both sides are "right"), not
# a numerics delta. Off-range targets keep the L1 gradient path exact.
TARGET_OFFSET = 2.0


# --- 'sr' (SRModel): pixel-only Adam on RRDB ------------------------------


def test_sr_step_oracle(rng):
    nb, nf, gc, lr_size = 1, 16, 8, 8
    opt = {
        "model": "sr", "scale": 4,
        "bf16": False,  # oracle compares f32-vs-f32 (bf16 is the perf default)
        "network_G": {"which_model_G": "RRDB_net", "nf": nf, "nb": nb,
                      "gc": gc, "in_nc": 3, "out_nc": 3},
        "train": {"lr_G": 1e-4, "lr_steps": [10 ** 6],
                  "pixel_criterion": "l1"},
    }
    m = create_model(opt).init(lr_size=lr_size)

    g_map = ck.rrdbnet_key_map(nb)
    g_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_params_to_state_dict(m.params, g_map).items()
    }
    opt_g = torch.optim.Adam(list(g_sd.values()), lr=1e-4,
                             betas=(0.9, 0.999), eps=1e-8)

    for i in range(3):
        batch = {
            "LR": rng.random((B, lr_size, lr_size, 3)).astype(np.float32),
            "HR": TARGET_OFFSET
            + rng.random((B, 4 * lr_size, 4 * lr_size, 3)).astype(np.float32),
        }
        metrics = m.train_step(batch)
        sr = _torch_rrdb_forward(g_sd, _nchw(batch["LR"]), nb, nf, gc)
        loss = (sr - _nchw(batch["HR"])).abs().mean()
        opt_g.zero_grad()
        loss.backward()
        opt_g.step()
        np.testing.assert_allclose(
            metrics["loss/l_pix"], float(loss), rtol=2e-3, atol=2e-5,
            err_msg=f"step {i}",
        )

    ours = ck.export_params_to_state_dict(m.params, g_map)
    for k in g_sd:
        np.testing.assert_allclose(
            ours[k].detach().numpy(), g_sd[k].detach().numpy(),
            atol=2e-5, err_msg=f"G {k}",
        )


# --- 'De_Resnet' (DegradationTrainer): pixel-only Adam on DeResnet --------


def test_degradation_step_oracle(rng):
    nb, hr = 2, 32
    cfg = DegradationConfig(nb=nb)
    tr = DegradationTrainer(cfg)
    state = tr.init_state(jax.random.key(0), hr_size=hr)

    g_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_deresnet_state_dict(
            state.params, n_res_blocks=nb
        ).items()
    }
    opt_g = torch.optim.Adam(list(g_sd.values()), lr=cfg.lr_g,
                             betas=(cfg.beta1_g, 0.999), eps=1e-8)

    for i in range(3):
        batch = {
            "HR": rng.random((B, hr, hr, 3)).astype(np.float32),
            "LR": TARGET_OFFSET
            + rng.random((B, hr // 4, hr // 4, 3)).astype(np.float32),
        }
        state, metrics = tr.train_step(state, batch)
        fake = _torch_deresnet_forward(g_sd, _nchw(batch["HR"]), n_blocks=nb)
        loss = (fake - _nchw(batch["LR"])).abs().mean()
        opt_g.zero_grad()
        loss.backward()
        opt_g.step()
        np.testing.assert_allclose(
            float(metrics["loss/l_pix"]), float(loss), rtol=2e-3, atol=2e-5,
            err_msg=f"step {i}",
        )

    ours = ck.export_deresnet_state_dict(state.params, n_res_blocks=nb)
    for k in g_sd:
        np.testing.assert_allclose(
            ours[k].detach().numpy(), g_sd[k].detach().numpy(),
            atol=2e-5, err_msg=f"G {k}",
        )


# --- 'De_patch_wavelet_GAN' (DePatchTrainer) ------------------------------


def _torch_depatch_step(g_sd, d_sd, lp, batch, opt_g, opt_d, cfg, nb):
    var_h, var_l, var_ref = _nchw(batch["HR"]), _nchw(batch["LR"]), _nchw(batch["ref"])

    fake_l = _torch_deresnet_forward(g_sd, var_h, n_blocks=nb)
    lf_fake, hf_fake = _haar_bands_t(fake_l)
    _, hf_real = _haar_bands_t(var_ref)
    lf_bic, _ = _haar_bands_t(var_l)

    l_pix = cfg.pixel_weight * (lf_fake - lf_bic).abs().mean()
    l_fea = cfg.feature_weight * _lpips_alex_t(lp, fake_l, var_l).mean()
    fake_tex = _fsd_body_t(d_sd, hf_fake)
    l_gan = cfg.gan_weight * (-(fake_tex + EPS).log().mean())
    total = l_pix + l_fea + l_gan

    opt_g.zero_grad()
    opt_d.zero_grad()
    total.backward()
    # the G backward leaks grads into D through fake_tex; the reference's
    # optimizer zero_grad ordering discards them (DePatchGAN:236)
    opt_g.step()

    pr = _fsd_body_t(d_sd, hf_real)
    pf = _fsd_body_t(d_sd, hf_fake.detach())
    d_loss = -(pr + EPS).log().mean() - (1 - pf + EPS).log().mean()
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()

    return {
        "loss/l_g_pix": float(l_pix),
        "loss/l_g_fea": float(l_fea),
        "loss/l_g_gan": float(l_gan),
        "loss/l_g_total": float(total),
        "loss/l_d_total": float(d_loss),
    }


def test_depatch_step_oracle(rng):
    nb, hr = 2, 128  # LR 32: alex LPIPS collapses spatially below that
    cfg = DePatchConfig(nb=nb)
    tr = DePatchTrainer(cfg)
    state = tr.init_state(jax.random.key(0), hr_size=hr)

    g_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_deresnet_state_dict(
            state.g.params, n_res_blocks=nb
        ).items()
    }
    d_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_fsd_state_dict(
            state.d_target.params, norm_layer="Instance"
        ).items()
    }
    lp = _lpips_params_t(tr.lpips_variables)
    opt_g = torch.optim.Adam(list(g_sd.values()), lr=cfg.lr_g,
                             betas=(cfg.beta1_g, 0.999), eps=1e-8)
    opt_d = torch.optim.Adam(list(d_sd.values()), lr=cfg.lr_d,
                             betas=(cfg.beta1_d, 0.999), eps=1e-8)

    for i in range(3):
        batch = {
            "HR": rng.random((B, hr, hr, 3)).astype(np.float32),
            "LR": TARGET_OFFSET
            + rng.random((B, hr // 4, hr // 4, 3)).astype(np.float32),
            "ref": rng.random((B, hr // 4, hr // 4, 3)).astype(np.float32),
        }
        state, metrics = tr.train_step(state, batch)
        want = _torch_depatch_step(g_sd, d_sd, lp, batch, opt_g, opt_d, cfg, nb)
        for k, v in want.items():
            np.testing.assert_allclose(
                float(metrics[k]), v, rtol=2e-3, atol=2e-5,
                err_msg=f"step {i}: {k}",
            )

    ours_g = ck.export_deresnet_state_dict(state.g.params, n_res_blocks=nb)
    for k in g_sd:
        np.testing.assert_allclose(
            ours_g[k].detach().numpy(), g_sd[k].detach().numpy(),
            atol=2e-5, err_msg=f"G {k}",
        )
    ours_d = ck.export_fsd_state_dict(state.d_target.params, norm_layer="Instance")
    for k in d_sd:
        if k in ("net.net.2.bias", "net.net.5.bias"):
            # biases feeding a no-affine InstanceNorm: zero true gradient
            # (see test_dsn_step_oracle) — pin near zero instead
            assert np.abs(ours_d[k].detach().numpy()).max() < 1e-3
            continue
        np.testing.assert_allclose(
            ours_d[k].detach().numpy(), d_sd[k].detach().numpy(),
            atol=2e-5, err_msg=f"D {k}",
        )
