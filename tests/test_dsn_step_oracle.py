"""Full DSN train-step parity vs a torch functional oracle.

Companion to tests/test_dasr_step_oracle.py for the OTHER trainer the
Auto_Reproduce pipeline depends on: a from-scratch functional replica of
the reference's DSN iteration (reference: codes/DSN/train.py:199-262 —
G loss = w_col*L1(low(fake), low(bicubic)) + w_tex*(-log D(fake)) +
w_per*LPIPS(fake, bicubic), D loss = -log D(real) - log(1 - D(fake)),
Adam(0.5, 0.999) per net), with the FSD discriminator's avg-pool
high-pass front-end (codes/DSN/model.py:60-118, count_include_pad=False)
and the VALID-padding loss-side low-pass (codes/DSN/loss.py:50-55).

Both sides start from ONE flax init exported through the two-way interop
(export_deresnet_state_dict / export_fsd_state_dict); 3 steps on
identical batches must agree on every logged loss and on the updated
G/D params to f32 tolerance.
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from test_checkpoint_import import _torch_deresnet_forward
from test_dasr_step_oracle import _lpips_alex_t, _lpips_params_t

from dasr_tpu.train import checkpoints as ck
from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer

B = 2
HR, LR = 128, 32  # LR >= 32: alex LPIPS collapses spatially below that
NB = 2  # res blocks (reference default 8; width stays the full 64)
EPS = 1e-8


# --- torch replicas of the step's building blocks -------------------------


def _low_valid_t(x, k=5):
    """loss-side low-pass: VALID padding (filter_low(padding=False))."""
    return F.avg_pool2d(x, k, stride=1, padding=0)


def _high_t(x, k=5):
    """D front-end: 0.5 + 0.5*(x - low) with SAME padding and
    count_include_pad=False (FSDiscriminator avg_pool filter)."""
    low = F.avg_pool2d(x, k, stride=1, padding=k // 2, count_include_pad=False)
    return 0.5 + 0.5 * (x - low)


def _fsd_body_t(sd, x):
    """FSD body (no filter front-end): 3 convs 5x5 (+InstanceNorm without
    affine on 2nd/3rd), LeakyReLU 0.2, 1x1 conv, sigmoid."""

    def c(v, p, pad):
        return F.conv2d(v, sd[f"net.net.{p}.weight"], sd[f"net.net.{p}.bias"],
                        padding=pad)

    v = F.leaky_relu(c(x, 0, 2), 0.2)
    v = F.leaky_relu(F.instance_norm(c(v, 2, 2)), 0.2)
    v = F.leaky_relu(F.instance_norm(c(v, 5, 2)), 0.2)
    return torch.sigmoid(c(v, 8, 0))


def _fsd_t(sd, x):
    """FSD with the avg-pool high-pass front-end."""
    return _fsd_body_t(sd, _high_t(x))


def _torch_dsn_step(g_sd, d_sd, lp, batch, opt_g, opt_d, cfg):
    def t(name):
        return torch.from_numpy(
            np.ascontiguousarray(batch[name].transpose(0, 3, 1, 2))
        )

    hr, target, disc = t("input"), t("bicubic"), t("disc")

    fake = _torch_deresnet_forward(g_sd, hr, n_blocks=NB)
    l_col = (_low_valid_t(fake) - _low_valid_t(target)).abs().mean()
    l_tex = -(_fsd_t(d_sd, fake) + EPS).log().mean()
    l_per = _lpips_alex_t(lp, fake, target).mean()
    loss = cfg.w_col * l_col + cfg.w_tex * l_tex + cfg.w_per * l_per

    opt_g.zero_grad()
    opt_d.zero_grad()
    loss.backward()
    # G's backward leaks grads into D through l_tex, exactly like the
    # reference; opt_d.zero_grad() before the D backward discards them
    opt_g.step()

    fake_det = fake.detach()
    pr = _fsd_t(d_sd, disc)
    pf = _fsd_t(d_sd, fake_det)
    d_loss = -(pr + EPS).log().mean() - (1 - pf + EPS).log().mean()
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()

    return {
        "loss/color_loss": float(l_col),
        "loss/g_tex_loss": float(l_tex),
        "loss/perceptual_loss": float(l_per),
        "loss/g_overall_loss": float(loss),
        "loss/d_tex_loss": float(d_loss),
        "disc_score/real": float(pr.mean()),
        "disc_score/fake": float(pf.mean()),
    }


def _batch(rng):
    hr = rng.random((B, HR, HR, 3)).astype(np.float32)
    return {
        "input": hr,
        # host-supplied LR target: the in-step device bicubic has its own
        # parity test (test_train_steps.test_dsn_device_bicubic_matches_host)
        "bicubic": rng.random((B, LR, LR, 3)).astype(np.float32),
        "disc": rng.random((B, LR, LR, 3)).astype(np.float32),
    }


def test_dsn_three_step_trajectory_matches_torch(rng):
    cfg = DSNConfig(
        filter="avg_pool", norm_layer="Instance", num_res_blocks=NB,
        # defaults already: w_col=1.0, w_tex=0.005, w_per=0.01,
        # LPIPS perceptual, lr 1e-4, adam_beta_1=0.5, no wgan/ragan
    )
    tr = DSNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=LR, hr_size=HR)

    g_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_deresnet_state_dict(
            state.g.params, n_res_blocks=NB
        ).items()
    }
    d_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_fsd_state_dict(
            state.d_target.params, norm_layer="Instance"
        ).items()
    }
    lp = _lpips_params_t(tr.lpips_variables)
    opt_g = torch.optim.Adam(
        list(g_sd.values()), lr=cfg.learning_rate,
        betas=(cfg.adam_beta_1, 0.999), eps=1e-8,
    )
    opt_d = torch.optim.Adam(
        list(d_sd.values()), lr=cfg.learning_rate,
        betas=(cfg.adam_beta_1, 0.999), eps=1e-8,
    )

    for i, b in enumerate([_batch(rng) for _ in range(3)]):
        state, metrics = tr.train_step(state, b)
        want = _torch_dsn_step(g_sd, d_sd, lp, b, opt_g, opt_d, cfg)
        for k, v in want.items():
            np.testing.assert_allclose(
                float(metrics[k]), v, rtol=2e-3, atol=2e-5,
                err_msg=f"step {i}: {k}",
            )

    for side, export, params in (
        ("G", lambda p: ck.export_deresnet_state_dict(p, n_res_blocks=NB),
         state.g.params),
        ("D", lambda p: ck.export_fsd_state_dict(p, norm_layer="Instance"),
         state.d_target.params),
    ):
        ours = export(params)
        sd = g_sd if side == "G" else d_sd
        for k in sd:
            if k in ("net.net.2.bias", "net.net.5.bias"):
                # biases feeding a no-affine InstanceNorm: the norm's mean
                # subtraction cancels them, so their TRUE gradient is 0 and
                # Adam turns framework-specific float dust into ±lr random
                # walks (m/sqrt(v) -> ±1 for any nonzero noise). The
                # reference has the identical degeneracy (InstanceNorm2d
                # affine=False); the params are function-irrelevant. Just
                # pin them near zero.
                assert np.abs(ours[k].detach().numpy()).max() < 1e-3
                continue
            np.testing.assert_allclose(
                ours[k].detach().numpy(), sd[k].detach().numpy(),
                atol=2e-5, err_msg=f"{side} {k}",
            )
