"""Full DASR-Adaptive train-step parity vs a torch functional oracle.

Completes the oracle trio (DASR: tests/test_dasr_step_oracle.py, DSN:
tests/test_dsn_step_oracle.py) with the third trainer the reference ships
for the paper's ablations: a from-scratch functional replica of
``DASR_Adaptive_Model.optimize_parameters`` (reference:
codes/SRN/models/DASR_Adaptive_model.py:205-330):

  * online DDM from the FSD patch discriminator over the concatenated LR
    batch (:208), source half bilinearly upsampled to HR as the pixel-loss
    weight map (:212-216);
  * optional patchD update with the FSSR discriminator loss BEFORE the G
    step, on scores from the pre-update patchD forward (:217-222,
    ``retain_graph=True`` — downstream consumers keep the old-params
    values);
  * the full map conditions the generator's adaptive RRDB block
    (``netG(var_L, adaptive_weights)``, :227 — RRDB_Residual_conv,
    block.py:462-488: ``RDB3(RDB2(RDB1(x))) * (w*1.0) + res_conv(x)*0.1``);
  * G losses: DDM-weighted L1 with the double ``l_pix_w`` quirk (:248-252),
    LL-subband L1 (:254-256), LPIPS feature (:267-269), vanilla GAN on the
    wavelet high bands vs D_target (:273-283);
  * D_target update on detached halves (:305-323); separate Adams.

Both sides start from ONE flax init; 3 steps on identical batches must
agree on every logged loss and on the updated G / D / patchD params to
f32 tolerance.
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from test_checkpoint_interop import _torch_nlayer_forward
from test_dasr_step_oracle import _haar_bands_t, _lpips_alex_t, _lpips_params_t
from test_dsn_step_oracle import _fsd_t

from dasr_tpu.train import checkpoints as ck
from dasr_tpu.train.dasr_adaptive_trainer import AdaptiveConfig, DASRAdaptiveTrainer

NB, NF, GC, NB_ADA = 1, 16, 8, 1
D_LAYERS = 2
B = 2       # per-half batch (effective 4 = fake + real halves)
LR_SIZE = 16
SCALE = 4
HR_SIZE = LR_SIZE * SCALE
EPS = 1e-8


# --- generic flax<->torch param bridging (no key map needed: the adaptive
# generator has no published .pth format, so the oracle walks the tree) ----


def _g_tree_to_torch(params):
    """Flatten flax G params to {path: torch tensor}, kernels in OIHW."""
    tree = jax.tree.map(np.asarray, jax.device_get(params))["params"]
    flat = {}

    def rec(node, path):
        for k in sorted(node):
            v = node[k]
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                rec(v, p)
            else:
                a = np.asarray(v)
                if a.ndim == 4:
                    a = np.transpose(a, (3, 2, 0, 1))
                flat[p] = torch.from_numpy(np.ascontiguousarray(a))
        return flat

    return rec(tree, "")


def _cb_t(flat, prefix, v, act=False, pad=1):
    """conv_block (CNA, no norm): conv 3x3 + optional LeakyReLU 0.2."""
    v = F.conv2d(
        v, flat[f"{prefix}/Conv_0/kernel"], flat[f"{prefix}/Conv_0/bias"],
        padding=pad,
    )
    return F.leaky_relu(v, 0.2) if act else v


def _rdb5c_t(flat, prefix, x):
    """ResidualDenseBlock_5C (block.py:254-286), dense-concat form."""

    def cv(i, v):
        return F.conv2d(
            v, flat[f"{prefix}/conv{i}_kernel"], flat[f"{prefix}/conv{i}_bias"],
            padding=1,
        )

    x1 = F.leaky_relu(cv(0, x), 0.2)
    x2 = F.leaky_relu(cv(1, torch.cat([x, x1], 1)), 0.2)
    x3 = F.leaky_relu(cv(2, torch.cat([x, x1, x2], 1)), 0.2)
    x4 = F.leaky_relu(cv(3, torch.cat([x, x1, x2, x3], 1)), 0.2)
    x5 = cv(4, torch.cat([x, x1, x2, x3, x4], 1))
    return x + 0.2 * x5


def _rrdb_t(flat, prefix, x):
    o = _rdb5c_t(flat, f"{prefix}/RDB5C_0", x)
    o = _rdb5c_t(flat, f"{prefix}/RDB5C_1", o)
    o = _rdb5c_t(flat, f"{prefix}/RDB5C_2", o)
    return x + 0.2 * o


def _ada_g_forward(flat, x, w):
    """RRDBNet_Residual_conv forward (architecture.py:208-253)."""
    fea = _cb_t(flat, "conv_block_0", x)
    h = fea
    for i in range(NB_ADA):
        p = f"RRDBResidualConv_{i}"
        out = _rdb5c_t(flat, f"{p}/RDB5C_0", h)
        out = _rdb5c_t(flat, f"{p}/RDB5C_1", out)
        out = _rdb5c_t(flat, f"{p}/RDB5C_2", out)
        res = _cb_t(flat, f"{p}/conv_block_0", h, act=True)
        res = _cb_t(flat, f"{p}/conv_block_1", res, act=True)
        h = out * (w * 1.0) + res * 0.1  # resconv_scale=[0.1, 1]
    for i in range(NB):
        h = _rrdb_t(flat, f"RRDB_{i}", h)
    h = _cb_t(flat, "conv_block_1", h)
    h = fea + h
    for i in range(2):  # x4 = two nearest-x2 upconvs
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = _cb_t(flat, f"upconv_{i}/conv_block_0", h, act=True)
    h = _cb_t(flat, "conv_block_2", h, act=True)
    return _cb_t(flat, "conv_block_3", h)


def _bce(pred, target_is_real):
    t = torch.ones_like(pred) if target_is_real else torch.zeros_like(pred)
    return F.binary_cross_entropy_with_logits(pred, t)


def _torch_adaptive_step(g_flat, d_sd, pd_sd, lp, batch, opt_g, opt_d,
                         opt_pd, cfg):
    """One optimize_parameters call (DASR_Adaptive_model.py:205-330)."""

    def t(name):
        return torch.from_numpy(
            np.ascontiguousarray(batch[name].transpose(0, 3, 1, 2))
        )

    var_l = torch.cat([t("LR_fake"), t("LR_real")], 0)
    var_h = torch.cat([t("HR"), t("HR_unpair")], 0)

    # online DDM (old patchD params), then the optional patchD update;
    # downstream consumers keep the pre-update scores (retain_graph=True)
    ada_w = _fsd_t(pd_sd, var_l)
    pd_loss = -(ada_w[B:] + EPS).log().mean() - (1 - ada_w[:B] + EPS).log().mean()
    opt_pd.zero_grad()
    pd_loss.backward(retain_graph=True)
    opt_pd.step()
    ada_det = ada_w.detach()
    ddm = F.interpolate(
        ada_det[:B], size=(HR_SIZE, HR_SIZE), mode="bilinear",
        align_corners=False,
    )

    fake_h = _ada_g_forward(g_flat, var_l, ada_det)
    fake_ll, fake_hc = _haar_bands_t(fake_h)
    real_ll, real_hc = _haar_bands_t(var_h)
    sr_src, hr_src = fake_h[:B], var_h[:B]

    l_pix = cfg.pixel_weight * (ddm * (sr_src - hr_src).abs()).mean()
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
        "loss/patch_D_gan_loss": float(pd_loss),
        "loss/l_g_pix": float(l_pix),
        "loss/l_g_LL_pix": float(l_ll),
        "loss/l_g_fea": float(l_fea),
        "loss/l_g_gan_target_Hf": float(l_gan),
        "loss/l_g_total": float(total),
        "loss/l_d_target_total": float(d_loss),
    }


def _batch(rng):
    return {
        "LR_fake": rng.random((B, LR_SIZE, LR_SIZE, 3)).astype(np.float32),
        "LR_real": rng.random((B, LR_SIZE, LR_SIZE, 3)).astype(np.float32),
        "HR": rng.random((B, HR_SIZE, HR_SIZE, 3)).astype(np.float32),
        "HR_unpair": rng.random((B, HR_SIZE, HR_SIZE, 3)).astype(np.float32),
    }


def test_adaptive_three_step_trajectory_matches_torch(rng):
    cfg = AdaptiveConfig(
        nf=NF, nb=NB, gc=GC, nb_ada=NB_ADA, d_nf=16, d_n_layers=D_LAYERS,
        use_patchD_opt=True,
        # defaults already: fs=wavelet, sup_LL, LPIPS feature, vanilla GAN,
        # gan_H_target=0.005, use_domain_distance_map=True, concat=False,
        # patchd avg_pool/Instance
    )
    tr = DASRAdaptiveTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=LR_SIZE)

    g_flat = {k: v.clone().requires_grad_()
              for k, v in _g_tree_to_torch(state.base.g.params).items()}
    d_map = ck.nlayer_d_key_map(D_LAYERS)
    d_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_params_to_state_dict(
            state.base.d_target.params, d_map
        ).items()
    }
    pd_sd = {
        k: v.clone().requires_grad_()
        for k, v in ck.export_fsd_state_dict(
            state.patchd.params, norm_layer="Instance"
        ).items()
    }
    lp = _lpips_params_t(tr.lpips_variables)
    opt_g = torch.optim.Adam(
        list(g_flat.values()), lr=cfg.lr_g, betas=(cfg.beta1_g, 0.999), eps=1e-8
    )
    opt_d = torch.optim.Adam(
        list(d_sd.values()), lr=cfg.lr_d, betas=(cfg.beta1_d, 0.999), eps=1e-8
    )
    opt_pd = torch.optim.Adam(
        list(pd_sd.values()), lr=cfg.lr_patchd, betas=(cfg.beta1_d, 0.999),
        eps=1e-8,
    )

    for i, b in enumerate([_batch(rng) for _ in range(3)]):
        state, metrics = tr.train_step(state, b)
        want = _torch_adaptive_step(
            g_flat, d_sd, pd_sd, lp, b, opt_g, opt_d, opt_pd, cfg
        )
        for k, v in want.items():
            np.testing.assert_allclose(
                float(metrics[k]), v, rtol=2e-3, atol=2e-5,
                err_msg=f"step {i}: {k}",
            )

    # Updated params agree. Two-tier check: the multiplicative DDM
    # conditioning lets f32 summation-order dust flip the SIGN of isolated
    # near-zero gradient elements, and Adam turns a sign flip into a
    # ~lr(=1e-4)-sized step — so require 99.9% of elements within the
    # tight 2e-5 tolerance and ALL elements within the 3-step Adam walk
    # bound (a genuinely wrong gradient would blow both).
    ours_g = _g_tree_to_torch(state.base.g.params)
    for k in g_flat:
        d = np.abs(ours_g[k].numpy() - g_flat[k].detach().numpy())
        frac = float(np.mean(d > 2e-5))
        assert frac <= 1e-3, f"G {k}: {frac:.2%} elements beyond 2e-5"
        assert d.max() <= 3.2e-4, f"G {k}: max |d| {d.max():.2e}"
    ours_d = ck.export_params_to_state_dict(state.base.d_target.params, d_map)
    for k in d_sd:
        np.testing.assert_allclose(
            ours_d[k].detach().numpy(), d_sd[k].detach().numpy(),
            atol=2e-5, err_msg=f"D {k}",
        )
    ours_pd = ck.export_fsd_state_dict(state.patchd.params, norm_layer="Instance")
    for k in pd_sd:
        if k in ("net.net.2.bias", "net.net.5.bias"):
            # biases feeding a no-affine InstanceNorm: zero true gradient;
            # Adam walks them by float dust (see test_dsn_step_oracle). Pin.
            assert np.abs(ours_pd[k].detach().numpy()).max() < 1e-3
            continue
        np.testing.assert_allclose(
            ours_pd[k].detach().numpy(), pd_sd[k].detach().numpy(),
            atol=2e-5, err_msg=f"patchD {k}",
        )
