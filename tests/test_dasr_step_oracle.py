"""Full DASR train-step parity vs a torch functional oracle (VERDICT r2 #2).

The torch side below is a from-scratch functional replica of the
reference's ``DASR_Model.optimize_parameters`` composite (reference:
codes/SRN/models/DASR_model.py:192-330): DDM-weighted L1 (with the double
``l_pix_w`` quirk, :214-218), LL-subband L1 (:220-222), LPIPS feature loss
(:224-233), vanilla GAN on the wavelet high bands vs D_target (:236-247),
D_target update on detached SR halves (:267-284), separate torch Adam per
net (:120-151).

Both sides start from ONE checkpoint — the flax init exported through the
two-way interop key maps — then run 3 steps on identical batches; loss
trajectories and the updated G/D params must agree to f32 tolerance.
This converts "quirks reproduced per docstring" into an executable proof
that the training math is parity-ready for the published weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from test_checkpoint_import import _torch_rrdb_forward
from test_checkpoint_interop import _torch_nlayer_forward

from dasr_tpu.train import checkpoints as ck
from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer

NB, NF, GC = 2, 16, 8
D_LAYERS = 2
B = 2       # per-half batch (effective 4 = fake + real halves)
LR_SIZE = 16
SCALE = 4
HR_SIZE = LR_SIZE * SCALE


# --- torch replicas of the step's building blocks -------------------------


def _haar_bands_t(x, norm=True):
    """wavelet_s semantics (DASR_model.py:442-452) on NCHW tensors."""
    a = x[..., 0::2, 0::2]
    b = x[..., 0::2, 1::2]
    c = x[..., 1::2, 0::2]
    d = x[..., 1::2, 1::2]
    ll = (a + b + c + d) * 0.5
    lh = (a + b - c - d) * 0.5
    hl = (a - b + c - d) * 0.5
    hh = (a - b - c + d) * 0.5
    if norm:
        ll = ll * 0.5
        lh, hl, hh = lh * 0.5 + 0.5, hl * 0.5 + 0.5, hh * 0.5 + 0.5
    return ll, torch.cat([lh, hl, hh], dim=1)


def _lpips_params_t(lvars):
    """flax LPIPS variables -> torch tensors (frozen, no grad)."""
    p = jax.tree.map(np.asarray, jax.device_get(lvars))["params"]
    stack = p["backbone"]["stack"]
    convs = []
    for i in range(5):
        w = torch.from_numpy(
            np.ascontiguousarray(
                np.transpose(stack[f"conv{i}"]["kernel"], (3, 2, 0, 1))
            )
        )
        b = torch.from_numpy(np.ascontiguousarray(stack[f"conv{i}"]["bias"]))
        convs.append((w, b))
    lins = [torch.from_numpy(np.asarray(p[f"lin{k}"])) for k in range(5)]
    return convs, lins


def _lpips_alex_t(lp, x0, x1):
    """net-lin alex forward (networks_basic.py:27-111) on NCHW in [0,1]:
    normalize -> v0.1 scaling -> 5 alex taps -> unit-norm -> sq diff ->
    lin head -> spatial mean -> sum."""
    convs, lins = lp
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(v):
        v = ((2 * v - 1) - shift) / scale
        outs = []
        spec = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]  # (stride, pad)
        for i, (s, pad) in enumerate(spec):
            w, b = convs[i]
            v = F.relu(F.conv2d(v, w, b, stride=s, padding=pad))
            outs.append(v)
            if i in (0, 1):
                v = F.max_pool2d(v, 3, 2)
        return outs

    total = 0.0
    for k, (f0, f1) in enumerate(zip(taps(x0), taps(x1))):
        n0 = f0.pow(2).sum(1, keepdim=True).sqrt()
        n1 = f1.pow(2).sum(1, keepdim=True).sqrt()
        diff = (f0 / (n0 + 1e-10) - f1 / (n1 + 1e-10)) ** 2
        d = (diff * lins[k].reshape(1, -1, 1, 1)).sum(1, keepdim=True)
        total = total + d.mean(dim=(2, 3), keepdim=True)
    return total


def _bce(pred, target_is_real):
    t = torch.ones_like(pred) if target_is_real else torch.zeros_like(pred)
    return F.binary_cross_entropy_with_logits(pred, t)


def _torch_dasr_step(g_sd, d_sd, lp, batch, opt_g, opt_d, cfg):
    """One optimize_parameters call (DASR_model.py:192-330), functional."""

    def t(name):
        return torch.from_numpy(
            np.ascontiguousarray(batch[name].transpose(0, 3, 1, 2))
        )

    var_l = torch.cat([t("LR_fake"), t("LR_real")], 0)
    var_h = torch.cat([t("HR"), t("HR_unpair")], 0)
    weights = F.interpolate(
        t("fake_w"), size=(HR_SIZE, HR_SIZE), mode="bilinear",
        align_corners=False,
    )

    fake_h = _torch_rrdb_forward(g_sd, var_l, NB, NF, GC)
    fake_ll, fake_hc = _haar_bands_t(fake_h)
    real_ll, real_hc = _haar_bands_t(var_h)
    sr_src, hr_src = fake_h[:B], var_h[:B]

    # G losses (source half) + GAN (target half)
    l_pix = cfg.pixel_weight * (weights * (sr_src - hr_src).abs()).mean()
    total = cfg.pixel_weight * l_pix  # the double l_pix_w quirk
    l_ll = (fake_ll[:B] - real_ll[:B]).abs().mean()
    total = total + cfg.pixel_LL_weight * l_ll
    l_fea = _lpips_alex_t(lp, sr_src, hr_src).mean()
    total = total + cfg.feature_weight * l_fea
    pred_fake = _torch_nlayer_forward(d_sd, fake_hc[B:], D_LAYERS)
    l_gan = _bce(pred_fake, True)
    total = total + cfg.gan_H_target * l_gan

    opt_g.zero_grad()
    opt_d.zero_grad()
    total.backward()
    # the G backward leaks grads into D through pred_fake, exactly like the
    # reference; optimizer_D.zero_grad() before the D backward discards them
    opt_g.step()

    hf_tgt_fake = fake_hc[B:].detach()
    pr = _torch_nlayer_forward(d_sd, real_hc[B:], D_LAYERS)
    pf = _torch_nlayer_forward(d_sd, hf_tgt_fake, D_LAYERS)
    d_loss = (_bce(pr, True) + _bce(pf, False)) / 2
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()

    return {
        "loss/l_g_pix": float(l_pix),
        "loss/l_g_LL_pix": float(l_ll),
        "loss/l_g_fea": float(l_fea),
        "loss/l_g_gan_target_Hf": float(l_gan),
        "loss/l_d_target_total": float(d_loss),
        "loss/l_g_total": float(total),
    }


def _batch(rng):
    return {
        "LR_fake": rng.random((B, LR_SIZE, LR_SIZE, 3)).astype(np.float32),
        "LR_real": rng.random((B, LR_SIZE, LR_SIZE, 3)).astype(np.float32),
        "HR": rng.random((B, HR_SIZE, HR_SIZE, 3)).astype(np.float32),
        "HR_unpair": rng.random((B, HR_SIZE, HR_SIZE, 3)).astype(np.float32),
        "fake_w": rng.random((B, LR_SIZE // 2, LR_SIZE // 2, 1)).astype(
            np.float32
        ),
    }


def test_dasr_three_step_trajectory_matches_torch(rng):
    cfg = SRNConfig(
        nf=NF, nb=NB, gc=GC, d_nf=16, d_n_layers=D_LAYERS,
        # defaults already: fs=wavelet, sup_LL, LPIPS feature, vanilla GAN,
        # gan_H_target=0.005, multiweights=True
    )
    tr = SRNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=LR_SIZE)

    # one checkpoint drives both sides (two-way interop key maps)
    g_map, d_map = ck.rrdbnet_key_map(NB), ck.nlayer_d_key_map(D_LAYERS)
    g_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_params_to_state_dict(state.g.params, g_map).items()
    }
    d_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_params_to_state_dict(
            state.d_target.params, d_map
        ).items()
    }
    lp = _lpips_params_t(tr.lpips_variables)
    opt_g = torch.optim.Adam(
        list(g_sd.values()), lr=cfg.lr_g, betas=(cfg.beta1_g, 0.999), eps=1e-8
    )
    opt_d = torch.optim.Adam(
        list(d_sd.values()), lr=cfg.lr_d, betas=(cfg.beta1_d, 0.999), eps=1e-8
    )

    batches = [_batch(rng) for _ in range(3)]
    for i, b in enumerate(batches):
        state, metrics = tr.train_step(state, b)
        want = _torch_dasr_step(g_sd, d_sd, lp, b, opt_g, opt_d, cfg)
        for k, v in want.items():
            np.testing.assert_allclose(
                float(metrics[k]), v, rtol=2e-3, atol=2e-5,
                err_msg=f"step {i}: {k}",
            )

    # updated params agree (Adam update scale is lr=1e-4/step)
    for side, params, sd, key_map in (
        ("G", state.g.params, g_sd, g_map),
        ("D", state.d_target.params, d_sd, d_map),
    ):
        ours = ck.export_params_to_state_dict(params, key_map)
        for k in sd:
            np.testing.assert_allclose(
                ours[k].detach().numpy(), sd[k].detach().numpy(),
                atol=2e-5, err_msg=f"{side} {k}",
            )
