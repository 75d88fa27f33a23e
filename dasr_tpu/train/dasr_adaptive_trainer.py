"""DASR Adaptive trainer — online domain-distance maps.

Reference: codes/SRN/models/DASR_Adaptive_model.py:23-515. Differences from
the base DASR trainer (dasr_tpu.train.srn_trainer):

  * the DDM is computed *online* every step by a frozen (or fine-tuned)
    FSD patch discriminator over the concatenated LR batch
    (``adaptive_weights = net_patchD(var_L)``, :208) instead of precomputed
    ``.npy`` maps; its source half, bilinearly upsampled to HR size, is the
    pixel-loss weight map (:212-216);
  * the full map conditions the generator's adaptive RRDB blocks
    (``netG(var_L, adaptive_weights)``, :227 — RRDB_Residual_conv[(concat)]);
  * optionally the patchD itself takes a GAN step on (real half, fake half)
    of its own scores (:217-222, FSSR-style -log loss on sigmoided scores);
  * the patchD can be imported from a trained DSN ``.tar`` (:480-488) via
    dasr_tpu.train.checkpoints.import_fsd_discriminator_params.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dasr_tpu.core import mesh as meshlib
from dasr_tpu.losses.gan import (
    dsn_discriminator_loss,
    gan_loss,
    ragan_pair_loss,
)
from dasr_tpu.nn.discriminators import FSDiscriminator
from dasr_tpu.nn.generators import RRDBNetResidualConv
from dasr_tpu.ops.resize import bilinear_resize
from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer
from dasr_tpu.train.state import GANTrainState, NetState, make_net_state


@dataclasses.dataclass(frozen=True)
class AdaptiveConfig(SRNConfig):
    nb_ada: int = 1
    concat: bool = False  # RRDB_Residual_conv vs _concat generator
    use_domain_distance_map: bool = True
    use_patchD_opt: bool = False
    patchd_fs_type: str = "avg_pool"
    patchd_kernel_size: int = 5
    patchd_norm_layer: str = "Instance"
    lr_patchd: float = 1e-4


@flax.struct.dataclass
class AdaptiveState:
    base: GANTrainState
    patchd: NetState


class DASRAdaptiveTrainer(SRNTrainer):
    def __init__(self, cfg: AdaptiveConfig, lpips_variables=None, mesh=None,
                 patchd_variables=None):
        g_model = RRDBNetResidualConv(
            nf=cfg.nf, nb=cfg.nb, gc=cfg.gc, nb_ada=cfg.nb_ada,
            concat=cfg.concat, upscale=cfg.scale, dtype=cfg.dtype,
        )
        super().__init__(cfg, lpips_variables=lpips_variables, mesh=mesh,
                         g_model=g_model)
        self.cfg = cfg
        self.patchd_model = FSDiscriminator(
            d_arch="FSD",
            filter_type=cfg.patchd_fs_type,
            kernel_size=cfg.patchd_kernel_size,
            norm_layer=cfg.patchd_norm_layer,
            dtype=cfg.dtype,
        )
        self.patchd_variables = patchd_variables
        self.tx_patchd = optax.adam(cfg.lr_patchd, b1=cfg.beta1_d, b2=0.999)

    def init_state(self, key, lr_size: int = 32) -> AdaptiveState:
        c = self.cfg
        kg, kd, kp, kl = jax.random.split(key, 4)
        hr = lr_size * c.scale
        z_lr = jnp.zeros((1, lr_size, lr_size, 3))
        z_w = jnp.zeros((1, lr_size, lr_size, 1))
        params_g = self.g_model.init(kg, z_lr, z_w)
        hf_hw = hr // 2 if c.fs == "wavelet" else hr
        params_d = self.d_model.init(kd, jnp.zeros((1, hf_hw, hf_hw, c.d_in_nc)))
        patchd = (
            self.patchd_variables
            if self.patchd_variables is not None
            else self.patchd_model.init(kp, z_lr)
        )
        if c.feature_criterion == "LPIPS" and self.lpips_variables is None:
            s = max(hr, 32)  # LPIPS init needs >= 32 px (losses/lpips.py)
            z = jnp.zeros((1, s, s, 3))
            self.lpips_variables = self.lpips.init(kl, z, z)
        base = GANTrainState(
            step=0,
            g=make_net_state(params_g, self.tx_g),
            d_target=make_net_state(params_d, self.tx_d),
        )
        state = AdaptiveState(base=base, patchd=make_net_state(patchd, self.tx_patchd))
        if self.mesh is not None:
            state = AdaptiveState(
                base=meshlib.replicate(self.mesh, state.base),
                patchd=meshlib.replicate(self.mesh, state.patchd),
            )
        return state

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _adaptive_step(self, state: AdaptiveState, batch, frozen,
                       do_g=True, do_d=True):
        c = self.cfg
        base = state.base
        lpips_variables = frozen.get("lpips")
        var_l = jnp.concatenate([batch["LR_fake"], batch["LR_real"]], axis=0)
        var_h = jnp.concatenate([batch["HR"], batch["HR_unpair"]], axis=0)
        b = batch["LR_fake"].shape[0]
        hr_h, hr_w = batch["HR"].shape[1], batch["HR"].shape[2]

        # --- online DDM from the patch discriminator (:208-216) ---
        ada_w = self.patchd_model.apply(state.patchd.params, var_l)
        metrics = {}
        new_patchd = state.patchd
        if c.use_patchD_opt:

            def patchd_loss_fn(pd):
                w = self.patchd_model.apply(pd, var_l)
                return dsn_discriminator_loss(w[b:], w[:b])

            pd_loss, pd_grads = jax.value_and_grad(patchd_loss_fn)(state.patchd.params)
            upd, opt = self.tx_patchd.update(
                pd_grads, state.patchd.opt_state, state.patchd.params
            )
            new_patchd = NetState(
                optax.apply_updates(state.patchd.params, upd), opt
            )
            metrics["loss/patch_D_gan_loss"] = pd_loss
        ada_w = jax.lax.stop_gradient(ada_w)
        ddm = bilinear_resize(ada_w[:b], hr_h, hr_w)

        real_ll, real_hc = self._fs(var_h)
        hr_src, hr_ll_src = var_h[:b], real_ll[:b]
        hf_src_real, hf_tgt_real = real_hc[:b], real_hc[b:]

        def g_loss_fn(params_g):
            fake_h = self.g_model.apply(params_g, var_l, ada_w)
            fake_ll, fake_hc = self._fs(fake_h)
            sr_src, sr_ll_src = fake_h[:b], fake_ll[:b]
            hf_tgt_fake = fake_hc[b:]
            total = jnp.float32(0)
            aux = {}
            if c.pixel_weight > 0:
                if c.use_domain_distance_map:
                    l_pix = c.pixel_weight * jnp.mean(
                        ddm.astype(jnp.float32)
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
                l_fea = jnp.mean(
                    self.lpips.apply(lpips_variables, sr_src, hr_src, normalize=True)
                )
                total = total + c.feature_weight * l_fea
                aux["loss/l_g_fea"] = l_fea
            if c.gan_H_target > 0:
                pred_fake = self.d_model.apply(base.d_target.params, hf_tgt_fake)
                if c.ragan:
                    pred_real = jax.lax.stop_gradient(
                        self.d_model.apply(base.d_target.params, hf_tgt_real)
                    )
                    l_gan = c.gan_H_target * ragan_pair_loss(pred_fake, pred_real, c.gan_type)
                else:
                    l_gan = gan_loss(pred_fake, True, c.gan_type)
                total = total + c.gan_H_target * l_gan
                aux["loss/l_g_gan_target_Hf"] = l_gan
            return total, (aux, fake_hc)

        (g_total, (aux, fake_hc)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(base.g.params)
        hf_tgt_fake = jax.lax.stop_gradient(fake_hc[b:])
        metrics.update(aux)
        metrics["loss/l_g_total"] = g_total

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
        )(base.d_target.params)
        metrics.update(
            {
                "loss/l_d_target_total": dt_loss,
                "disc_Score/D_real_target_H": dt_r,
                "disc_Score/D_fake_target_H": dt_f,
            }
        )

        new_g, new_d = base.g, base.d_target
        if do_g:
            upd, opt = self.tx_g.update(g_grads, base.g.opt_state, base.g.params)
            new_g = NetState(optax.apply_updates(base.g.params, upd), opt)
        if do_d:
            upd, opt = self.tx_d.update(dt_grads, base.d_target.opt_state, base.d_target.params)
            new_d = NetState(optax.apply_updates(base.d_target.params, upd), opt)
        new_base = GANTrainState(step=base.step + 1, g=new_g, d_target=new_d)
        return AdaptiveState(base=new_base, patchd=new_patchd), metrics

    def _frozen(self):
        return (
            {"lpips": self.lpips_variables} if self.cfg.feature_weight > 0 else {}
        )

    def train_step(self, state: AdaptiveState, batch, do_g=True, do_d=True):
        return self._adaptive_step(state, batch, self._frozen(), do_g=do_g,
                                   do_d=do_d)

    @functools.partial(
        jax.jit,
        static_argnames=("self", "hr_size", "use_flip", "use_rot",
                         "do_g", "do_d"),
    )
    def _train_banked(self, state, fake_bank, hr_bank, real_bank, ddm_bank,
                      fake_idx, seed, frozen, hr_size, use_flip, use_rot,
                      do_g=True, do_d=True):
        # same signature as SRNTrainer._train_banked so the layout-pinned
        # factory (device_bank.make_banked_srn_step) serves both trainers;
        # ddm_bank is None here — the 'LRHR_unpair' mode has no precomputed
        # weights (the patch discriminator computes the DDM online inside
        # _adaptive_step) and the sampler's all-ones fake_w is unused.
        import numpy as np

        from dasr_tpu.data.device_bank import sample_dasr_batch

        key = jax.random.fold_in(jax.random.key(self.cfg.seed), seed)

        def body(carry, idx_row):
            st, kk = carry
            kk, sub = jax.random.split(kk)
            batch = sample_dasr_batch(
                fake_bank, hr_bank, real_bank, ddm_bank, idx_row, sub,
                hr_size, self.cfg.scale, use_flip, use_rot,
            )
            st, metrics = self._adaptive_step(
                st, batch, frozen, do_g=do_g, do_d=do_d
            )
            return (st, kk), metrics

        if fake_idx.shape[0] == 1:
            (state, _), metrics = body((state, key), fake_idx[0])
            return state, metrics
        (state, _), metrics = jax.lax.scan(body, (state, key), fake_idx)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    def train_banked_step(self, state: AdaptiveState, fake_bank, hr_bank,
                          real_bank, ddm_bank, fake_idx, seed, hr_size: int,
                          use_flip: bool = True, use_rot: bool = True,
                          do_g: bool = True, do_d: bool = True):
        """K Adaptive steps sampling from device-resident banks — the
        'LRHR_unpair' analog of SRNTrainer.train_banked_step (same law
        minus the DDM bank; weights come from the patch D online)."""
        import numpy as np

        return self._train_banked(
            state, fake_bank, hr_bank, real_bank, ddm_bank, fake_idx,
            np.uint32(seed), self._frozen(), hr_size, use_flip, use_rot,
            do_g=do_g, do_d=do_d,
        )

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _adaptive_multi(self, state, batches, frozen, do_g=True, do_d=True):
        def body(st, bt):
            return self._adaptive_step(st, bt, frozen, do_g=do_g, do_d=do_d)

        return jax.lax.scan(body, state, batches)

    def train_multi_step(self, state: AdaptiveState, batches, do_g=True,
                         do_d=True):
        """K steps in one dispatch (lax.scan; identical math to K
        sequential steps — see SRNTrainer.train_multi_step)."""
        frozen = {"lpips": self.lpips_variables} if self.cfg.feature_weight > 0 else {}
        return self._adaptive_multi(state, batches, frozen, do_g=do_g, do_d=do_d)

    def sr(self, state_or_params, lr_img, patchd_params=None):
        if isinstance(state_or_params, AdaptiveState):
            g_params = state_or_params.base.g.params
            patchd_params = state_or_params.patchd.params
        else:
            g_params = state_or_params
        ada_w = self.patchd_model.apply(patchd_params, lr_img)
        return self.g_model.apply(g_params, lr_img, ada_w)
