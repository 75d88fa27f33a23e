"""SRN/DASR trainer — the paper's domain-distance-aware SR training step.

Functional rework of the reference's ``DASR_Model.optimize_parameters``
(reference: codes/SRN/models/DASR_model.py:192-330):

* the reference concatenates [fake_LR ‖ real_LR] with a 0/1 mask and later
  gathers halves with ``b_split`` (codes/SRN/utils/util.py:150-163). The
  mask is always [0]*B/2 + [1]*B/2 (DASR_model.py:176-179), so here batches
  are *structured*: the fake (source) half and real (target) half are the
  two static halves of the leading axis — no dynamic gather, XLA-friendly;
* G runs once on the concatenated LR batch (one big conv batch for the MXU);
* frequency separation: Haar wavelet / gaussian / avg-pool split of SR and
  HR (DASR_model.py:442-458);
* G losses (source half): DDM-weighted L1 (multiweights), LL-subband L1
  (sup_LL), LPIPS or VGG feature loss; (target half): GAN on the
  high-frequency bands vs D_target; optional source-domain GAN
  (DASR_model.py:210-263);
* D updates use the same pre-update scores pattern as the reference
  (detached SR halves, DASR_model.py:267-302) so one fused step computes
  all gradients at the current params;
* separate Adam + MultiStepLR per network (DASR_model.py:120-151).

Known reference quirks reproduced (documented, gated by the same configs):
  * ``l_pix_w`` is applied twice in the multiweights path
    (DASR_model.py:213-218);
  * with RaGAN on, ``gan_H_target`` is applied twice on the G side
    (DASR_model.py:240-247) while the source-domain weight is applied once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dasr_tpu.core import mesh as meshlib
from dasr_tpu.data.device_bank import sample_dasr_batch
from dasr_tpu.losses.gan import gan_loss, ragan_pair_loss
from dasr_tpu.losses.lpips import LPIPS
from dasr_tpu.nn.discriminators import NLayerDiscriminator
from dasr_tpu.nn.generators import RRDBNet
from dasr_tpu.nn.vgg import VGG19Feature54
from dasr_tpu.ops.dwt import haar_bands
from dasr_tpu.ops.filters import filter_high, filter_low
from dasr_tpu.ops.resize import bilinear_resize
from dasr_tpu.train.state import GANTrainState, NetState, make_net_state


@dataclasses.dataclass(frozen=True)
class SRNConfig:
    """Mirrors the shipped DASR train JSON (train_DASR_auto_reproduce_*.json)."""

    scale: int = 4
    # network_G
    nf: int = 64
    nb: int = 23
    gc: int = 32
    # network_D (discriminator_patch on 9ch wavelet bands)
    d_in_nc: int = 9
    d_nf: int = 64
    d_n_layers: int = 2
    # train block
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    beta1_g: float = 0.9
    beta1_d: float = 0.9
    lr_steps: Sequence[int] = (35000, 80000, 100000, 150000)
    lr_gamma: float = 0.5
    fs: str = "wavelet"  # 'wavelet' | 'gau' | 'avgpool'
    fs_kernel_size: int = 5
    norm: bool = True
    sup_LL: bool = True
    pixel_weight: float = 1.0
    pixel_LL_weight: float = 1.0
    pixel_criterion: str = "l1"
    feature_criterion: str = "LPIPS"  # 'LPIPS' | 'l1' | 'l2'
    feature_weight: float = 1.0
    gan_type: str = "vanilla"
    ragan: bool = False
    gan_H_target: float = 0.005
    gan_H_source: float = 0.0
    multiweights: bool = True
    g_update_inter: int = 1
    d_update_inter: int = 1
    seed: int = 0  # folded into in-step PRNG draws (device-bank sampling)
    dtype: Any = None


class SRNTrainer:
    def __init__(self, cfg: SRNConfig, lpips_variables=None, vgg_variables=None,
                 mesh=None, g_model=None):
        self.cfg = cfg
        self.mesh = mesh
        self.g_model = g_model if g_model is not None else RRDBNet(
            nf=cfg.nf, nb=cfg.nb, gc=cfg.gc, upscale=cfg.scale, dtype=cfg.dtype
        )
        # D_target: SRN 'discriminator_patch' — NLayer, stride 2, instance
        # norm, bias-free middle convs (networks.py:184-185 + arch NLayer)
        self.d_model = NLayerDiscriminator(
            in_ch=cfg.d_in_nc, ndf=cfg.d_nf, n_layers=cfg.d_n_layers,
            norm_layer="Instance", stride=2, use_bias_middle=False,
            dtype=cfg.dtype,
        )
        self.lpips = LPIPS(net="alex", dtype=cfg.dtype)
        self.lpips_variables = lpips_variables
        self.vgg = VGG19Feature54(dtype=cfg.dtype)
        self.vgg_variables = vgg_variables

        sched_g = optax.piecewise_constant_schedule(
            cfg.lr_g, {int(m): cfg.lr_gamma for m in cfg.lr_steps}
        )
        sched_d = optax.piecewise_constant_schedule(
            cfg.lr_d, {int(m): cfg.lr_gamma for m in cfg.lr_steps}
        )
        self.tx_g = optax.adam(sched_g, b1=cfg.beta1_g, b2=0.999)
        self.tx_d = optax.adam(sched_d, b1=cfg.beta1_d, b2=0.999)

    # -- init -----------------------------------------------------------------

    def init_state(self, key, lr_size: int = 32) -> GANTrainState:
        c = self.cfg
        kg, kd, kd2, kl = jax.random.split(key, 4)
        hr = lr_size * c.scale
        params_g = self.g_model.init(kg, jnp.zeros((1, lr_size, lr_size, 3)))
        hf_hw = hr // 2 if c.fs == "wavelet" else hr
        params_d = self.d_model.init(kd, jnp.zeros((1, hf_hw, hf_hw, c.d_in_nc)))
        d_source = None
        if c.gan_H_source > 0:
            params_d2 = self.d_model.init(kd2, jnp.zeros((1, hf_hw, hf_hw, c.d_in_nc)))
            d_source = make_net_state(params_d2, self.tx_d)
        if c.feature_criterion == "LPIPS" and self.lpips_variables is None:
            z = jnp.zeros((1, hr, hr, 3))
            self.lpips_variables = self.lpips.init(kl, z, z)
        if c.feature_criterion in ("l1", "l2") and self.vgg_variables is None:
            self.vgg_variables = self.vgg.init(kl, jnp.zeros((1, hr, hr, 3)))
        state = GANTrainState(
            step=0,
            g=make_net_state(params_g, self.tx_g),
            d_target=make_net_state(params_d, self.tx_d),
            d_source=d_source,
        )
        if self.mesh is not None:
            state = meshlib.replicate(self.mesh, state)
        return state

    # -- frequency separation (DASR_model.py:442-458) --------------------------

    def _fs(self, x) -> Tuple[jax.Array, jax.Array]:
        c = self.cfg
        if c.fs == "wavelet":
            return haar_bands(x, norm=c.norm, cs="cat")
        low = filter_low(x, kernel_size=c.fs_kernel_size, gaussian=(c.fs == "gau"))
        high = filter_high(
            x, kernel_size=c.fs_kernel_size, gaussian=(c.fs == "gau"),
            normalize=False,
        )
        if c.norm:
            high = high * 0.5 + 0.5
        return low, high

    def _pix(self, a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        return jnp.mean(jnp.abs(d)) if self.cfg.pixel_criterion == "l1" else jnp.mean(d * d)

    # -- fused step -------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _train_step(self, state: GANTrainState, batch, frozen, do_g: bool = True,
                    do_d: bool = True):
        """batch keys: LR_fake, LR_real, HR, HR_unpair, fake_w (DDM).

        ``frozen`` carries the non-trained feature nets (LPIPS / VGG) as a
        runtime argument so their weights are device buffers, not baked
        compile-time constants.
        """
        c = self.cfg
        lpips_variables = frozen.get("lpips")
        vgg_variables = frozen.get("vgg")
        var_l = jnp.concatenate([batch["LR_fake"], batch["LR_real"]], axis=0)
        var_h = jnp.concatenate([batch["HR"], batch["HR_unpair"]], axis=0)
        b = batch["LR_fake"].shape[0]
        hr_h, hr_w = batch["HR"].shape[1], batch["HR"].shape[2]
        weights = bilinear_resize(batch["fake_w"], hr_h, hr_w)

        real_ll, real_hc = self._fs(var_h)
        hr_src, hr_ll_src = var_h[:b], real_ll[:b]
        hf_src_real, hf_tgt_real = real_hc[:b], real_hc[b:]

        def g_loss_fn(params_g):
            fake_h = self.g_model.apply(params_g, var_l)
            fake_ll, fake_hc = self._fs(fake_h)
            sr_src, sr_ll_src = fake_h[:b], fake_ll[:b]
            hf_src_fake, hf_tgt_fake = fake_hc[:b], fake_hc[b:]

            total = jnp.float32(0)
            aux = {}
            if c.pixel_weight > 0:
                if c.multiweights:
                    # NOTE reference quirk: l_pix_w applied twice
                    # (DASR_model.py:214-218)
                    l_pix = c.pixel_weight * jnp.mean(
                        weights.astype(jnp.float32)
                        * jnp.abs(sr_src.astype(jnp.float32) - hr_src.astype(jnp.float32))
                    )
                else:
                    l_pix = self._pix(sr_src, hr_src)
                total = total + c.pixel_weight * l_pix
                aux["loss/l_g_pix"] = l_pix
                if c.sup_LL:
                    l_ll = self._pix(sr_ll_src, hr_ll_src)
                    total = total + c.pixel_LL_weight * l_ll
                    aux["loss/l_g_LL_pix"] = l_ll

            if c.feature_weight > 0:
                if c.feature_criterion == "LPIPS":
                    l_fea = jnp.mean(
                        self.lpips.apply(
                            lpips_variables, sr_src, hr_src, normalize=True
                        )
                    )
                else:
                    f_real = jax.lax.stop_gradient(
                        self.vgg.apply(vgg_variables, hr_src)
                    )
                    f_fake = self.vgg.apply(vgg_variables, sr_src)
                    l_fea = self._pix(f_fake, f_real)
                total = total + c.feature_weight * l_fea
                aux["loss/l_g_fea"] = l_fea

            if c.gan_H_target > 0:
                pred_fake = self.d_model.apply(state.d_target.params, hf_tgt_fake)
                if c.ragan:
                    pred_real = jax.lax.stop_gradient(
                        self.d_model.apply(state.d_target.params, hf_tgt_real)
                    )
                    # NOTE reference quirk: weight applied twice with RaGAN
                    # (DASR_model.py:242-247)
                    l_gan_t = c.gan_H_target * ragan_pair_loss(
                        pred_fake, pred_real, c.gan_type
                    )
                else:
                    l_gan_t = gan_loss(pred_fake, True, c.gan_type)
                total = total + c.gan_H_target * l_gan_t
                aux["loss/l_g_gan_target_Hf"] = l_gan_t

            if c.gan_H_source > 0:
                pred_fake_s = self.d_model.apply(state.d_source.params, hf_src_fake)
                if c.ragan:
                    pred_real_s = jax.lax.stop_gradient(
                        self.d_model.apply(state.d_source.params, hf_src_real)
                    )
                    l_gan_s = c.gan_H_source * ragan_pair_loss(
                        pred_fake_s, pred_real_s, c.gan_type
                    )
                else:
                    l_gan_s = c.gan_H_source * gan_loss(pred_fake_s, True, c.gan_type)
                total = total + l_gan_s
                aux["loss/l_g_gan_source_H"] = l_gan_s

            return total, (aux, fake_hc)

        (g_total, (aux, fake_hc)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        hf_tgt_fake = jax.lax.stop_gradient(fake_hc[b:])
        hf_src_fake = jax.lax.stop_gradient(fake_hc[:b])

        metrics = dict(aux)

        # --- D_target ---
        new_dt = state.d_target
        if c.gan_H_target > 0:

            def dt_loss_fn(params_d):
                pr = self.d_model.apply(params_d, hf_tgt_real)
                pf = self.d_model.apply(params_d, hf_tgt_fake)
                if c.ragan:
                    l_real = gan_loss(pr - jnp.mean(pf, 0, keepdims=True), True, c.gan_type)
                    l_fake = gan_loss(pf - jnp.mean(pr, 0, keepdims=True), False, c.gan_type)
                else:
                    l_real = gan_loss(pr, True, c.gan_type)
                    l_fake = gan_loss(pf, False, c.gan_type)
                return (l_real + l_fake) / 2, (jnp.mean(pr), jnp.mean(pf))

            (dt_loss, (dt_r, dt_f)), dt_grads = jax.value_and_grad(
                dt_loss_fn, has_aux=True
            )(state.d_target.params)
            if do_d:
                upd, opt = self.tx_d.update(
                    dt_grads, state.d_target.opt_state, state.d_target.params
                )
                new_dt = NetState(optax.apply_updates(state.d_target.params, upd), opt)
            metrics.update(
                {
                    "loss/l_d_target_total": dt_loss,
                    "disc_Score/D_real_target_H": dt_r,
                    "disc_Score/D_fake_target_H": dt_f,
                }
            )

        # --- D_source ---
        new_ds = state.d_source
        if c.gan_H_source > 0:

            def ds_loss_fn(params_d):
                pr = self.d_model.apply(params_d, hf_src_real)
                pf = self.d_model.apply(params_d, hf_src_fake)
                if c.ragan:
                    l_real = gan_loss(pr - jnp.mean(pf, 0, keepdims=True), True, c.gan_type)
                    l_fake = gan_loss(pf - jnp.mean(pr, 0, keepdims=True), False, c.gan_type)
                else:
                    l_real = gan_loss(pr, True, c.gan_type)
                    l_fake = gan_loss(pf, False, c.gan_type)
                return (l_real + l_fake) / 2, (jnp.mean(pr), jnp.mean(pf))

            (ds_loss, (ds_r, ds_f)), ds_grads = jax.value_and_grad(
                ds_loss_fn, has_aux=True
            )(state.d_source.params)
            if do_d:
                upd, opt = self.tx_d.update(
                    ds_grads, state.d_source.opt_state, state.d_source.params
                )
                new_ds = NetState(optax.apply_updates(state.d_source.params, upd), opt)
            metrics.update(
                {
                    "loss/l_d_total": ds_loss,
                    "disc_Score/D_real_source_H": ds_r,
                    "disc_Score/D_fake_source_H": ds_f,
                }
            )

        new_g = state.g
        if do_g:
            upd, opt = self.tx_g.update(g_grads, state.g.opt_state, state.g.params)
            new_g = NetState(optax.apply_updates(state.g.params, upd), opt)
        metrics["loss/l_g_total"] = g_total

        return (
            GANTrainState(
                step=state.step + 1, g=new_g, d_target=new_dt, d_source=new_ds
            ),
            metrics,
        )

    def _frozen(self):
        """The non-trained feature nets (LPIPS / VGG) as a runtime arg dict."""
        frozen = {}
        if self.cfg.feature_weight > 0 and self.cfg.feature_criterion == "LPIPS":
            frozen["lpips"] = self.lpips_variables
        if self.cfg.feature_weight > 0 and self.cfg.feature_criterion in ("l1", "l2"):
            frozen["vgg"] = self.vgg_variables
        return frozen

    def train_step(self, state: GANTrainState, batch, do_g: bool = True,
                   do_d: bool = True):
        return self._train_step(state, batch, self._frozen(), do_g=do_g, do_d=do_d)

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _train_multi(self, state: GANTrainState, batches, frozen,
                     do_g: bool = True, do_d: bool = True):
        def body(st, bt):
            return self._train_step(st, bt, frozen, do_g=do_g, do_d=do_d)

        return jax.lax.scan(body, state, batches)

    def train_multi_step(self, state: GANTrainState, batches, do_g: bool = True,
                         do_d: bool = True):
        """Run K train steps in ONE dispatch via lax.scan over stacked
        batches (every leaf gains a leading K axis). Identical math to K
        sequential ``train_step`` calls; metrics come back stacked (K,).

        Motivation: through the remote-TPU tunnel a per-step dispatch costs
        ~9 ms against ~36 ms of device work (measured, BENCH_NOTES.md) —
        scanning K steps amortizes it to ~0.
        """
        return self._train_multi(state, batches, self._frozen(), do_g=do_g,
                                 do_d=do_d)

    @functools.partial(
        jax.jit,
        static_argnames=("self", "hr_size", "use_flip", "use_rot",
                         "do_g", "do_d"),
    )
    def _train_banked(self, state, fake_bank, hr_bank, real_bank, ddm_bank,
                      fake_idx, seed, frozen, hr_size, use_flip, use_rot,
                      do_g=True, do_d=True):
        # (run seed, window position) -> key: resume-consistent crop streams
        key = jax.random.fold_in(jax.random.key(self.cfg.seed), seed)

        def body(carry, idx_row):
            st, kk = carry
            kk, sub = jax.random.split(kk)
            batch = sample_dasr_batch(
                fake_bank, hr_bank, real_bank, ddm_bank, idx_row, sub,
                hr_size, self.cfg.scale, use_flip, use_rot,
            )
            st, metrics = self._train_step(
                st, batch, frozen, do_g=do_g, do_d=do_d
            )
            return (st, kk), metrics

        if fake_idx.shape[0] == 1:
            # K=1: direct body call instead of a length-1 lax.scan (same
            # device ops; keeps the HLO free of a degenerate while op)
            (state, _), metrics = body((state, key), fake_idx[0])
            return state, metrics
        (state, _), metrics = jax.lax.scan(body, (state, key), fake_idx)
        # last-step metrics selected IN-jit (host-side (K,) stripping costs
        # ~9 tiny dispatches/window through the tunnel; BENCH_NOTES r4)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    def train_banked_step(self, state: GANTrainState, fake_bank, hr_bank,
                          real_bank, ddm_bank, fake_idx, seed, hr_size: int,
                          use_flip: bool = True, use_rot: bool = True,
                          do_g: bool = True, do_d: bool = True):
        """K DASR train steps sampling crops from DEVICE-RESIDENT banks
        (data/device_bank.py:sample_dasr_batch) — per-dispatch wire traffic
        is the (K, B) int32 fake-index window + a uint32 seed, vs ~1 MB/step
        of five-tensor crop uploads on the host-loader path. Same math as K
        sequential ``train_step``s on DASRUnpairedDataset batches — the
        per-draw sampling law is identical, the PRNG stream is jax instead
        of numpy (tests/test_srn_device_bank.py pins the law and the
        step-math exactness). ``seed``: a per-window host integer (the CLI
        passes the iteration at window start), folded with ``cfg.seed``
        in-step. Metrics are the LAST step's values, selected in-jit."""
        return self._train_banked(
            state, fake_bank, hr_bank, real_bank, ddm_bank, fake_idx,
            np.uint32(seed), self._frozen(), hr_size, use_flip, use_rot,
            do_g=do_g, do_d=do_d,
        )

    # -- inference --------------------------------------------------------------

    def sr(self, params_g, lr_img):
        return self.g_model.apply(params_g, lr_img)
