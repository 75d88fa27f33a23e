"""DePatch wavelet GAN trainer ('De_patch_wavelet_GAN' registry entry).

Reference: codes/SRN/models/DePatchGAN_wavelet_model.py:19-357 — the DSN
recipe hosted inside the SRN framework: an HR->LR generator trained with

  * pixel loss on the wavelet LL band of G(HR) vs the LL of the bicubic LR
    (LL/2 when norm),
  * LPIPS (or VGG) feature loss on G(HR) vs the bicubic LR,
  * adversarial loss on the 9ch wavelet high bands vs an FS patch
    discriminator (DSN-style -log losses on sigmoided D outputs),

and at test time it emits the receptive-field real-or-fake map — the
precursor of the DDM (reference: :270-296); we produce it with the same
``ddm_splat`` used by dataset generation.

Reference quirks NOT reproduced (latent crashes, SURVEY.md §7 #6): the bare
``norm`` NameError (:149, we read the config flag) and the undefined
``grad_pen`` in the non-wgan path (:211, we pass 0).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax

from dasr_tpu.losses.gan import dsn_discriminator_loss, dsn_generator_adv_loss
from dasr_tpu.losses.lpips import LPIPS
from dasr_tpu.nn.discriminators import FSDiscriminator
from dasr_tpu.nn.generators import DeResnet
from dasr_tpu.ops.dwt import haar_bands
from dasr_tpu.ops.rf_splat import CONVNETS, ddm_splat
from dasr_tpu.train.state import GANTrainState, NetState, make_net_state


@dataclasses.dataclass(frozen=True)
class DePatchConfig:
    scale: int = 4
    nb: int = 8
    d_arch: str = "FSD"
    norm_layer: str = "Instance"
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    beta1_g: float = 0.9
    beta1_d: float = 0.9
    lr_steps: Sequence[int] = (100000, 200000)
    lr_gamma: float = 0.5
    norm: bool = True
    pixel_criterion: str = "l1"
    pixel_weight: float = 1.0
    feature_criterion: str = "LPIPS"
    feature_weight: float = 1.0
    gan_weight: float = 0.005
    ragan: bool = False
    dtype: Any = None


class DePatchTrainer:
    def __init__(self, cfg: DePatchConfig, lpips_variables=None, g_model=None):
        self.cfg = cfg
        self.g_model = g_model or DeResnet(
            n_res_blocks=cfg.nb, scale=cfg.scale, dtype=cfg.dtype
        )
        # D runs on raw 9ch wavelet bands (the model DWTs explicitly), so no
        # filter front-end here
        self.d_model = FSDiscriminator(
            d_arch=cfg.d_arch, filter_type=None, norm_layer=cfg.norm_layer,
            dtype=cfg.dtype,
        )
        self.lpips = LPIPS(net="alex", dtype=cfg.dtype)
        self.lpips_variables = lpips_variables
        sched_g = optax.piecewise_constant_schedule(
            cfg.lr_g, {int(m): cfg.lr_gamma for m in cfg.lr_steps}
        )
        sched_d = optax.piecewise_constant_schedule(
            cfg.lr_d, {int(m): cfg.lr_gamma for m in cfg.lr_steps}
        )
        self.tx_g = optax.adam(sched_g, b1=cfg.beta1_g, b2=0.999)
        self.tx_d = optax.adam(sched_d, b1=cfg.beta1_d, b2=0.999)

    def init_state(self, key, hr_size: int = 128) -> GANTrainState:
        kg, kd, kl = jax.random.split(key, 3)
        lr = hr_size // self.cfg.scale
        params_g = self.g_model.init(kg, jnp.zeros((1, hr_size, hr_size, 3)))
        params_d = self.d_model.init(kd, jnp.zeros((1, lr // 2, lr // 2, 9)))
        if (self.lpips_variables is None and self.cfg.feature_weight > 0
                and self.cfg.feature_criterion == "LPIPS"):
            z = jnp.zeros((1, max(lr, 32), max(lr, 32), 3))  # LPIPS needs >=32
            self.lpips_variables = self.lpips.init(kl, z, z)
        return GANTrainState(
            step=0,
            g=make_net_state(params_g, self.tx_g),
            d_target=make_net_state(params_d, self.tx_d),
        )

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _train_step(self, state, batch, lpips_variables, do_g=True, do_d=True):
        c = self.cfg
        var_h, var_l = batch["HR"], batch["LR"]  # paired HR + bicubic LR
        var_ref = batch.get("ref", var_l)  # real-LR reference domain

        _, hf_real = haar_bands(var_ref, norm=c.norm, cs="cat")
        lf_bic, _ = haar_bands(var_l, norm=c.norm, cs="cat")

        def g_loss_fn(params_g):
            fake_l = self.g_model.apply(params_g, var_h)
            lf_fake, hf_fake = haar_bands(fake_l, norm=c.norm, cs="cat")
            total = jnp.float32(0)
            aux = {}
            if c.pixel_weight > 0:
                d = lf_fake.astype(jnp.float32) - lf_bic.astype(jnp.float32)
                l_pix = c.pixel_weight * (
                    jnp.mean(jnp.abs(d)) if c.pixel_criterion == "l1" else jnp.mean(d * d)
                )
                total += l_pix
                aux["loss/l_g_pix"] = l_pix
            if c.feature_weight > 0:
                l_fea = c.feature_weight * jnp.mean(
                    self.lpips.apply(lpips_variables, fake_l, var_l, normalize=True)
                )
                total += l_fea
                aux["loss/l_g_fea"] = l_fea
            fake_tex = self.d_model.apply(state.d_target.params, hf_fake)
            l_gan = c.gan_weight * dsn_generator_adv_loss(fake_tex)
            total += l_gan
            aux["loss/l_g_gan"] = l_gan
            return total, (aux, hf_fake)

        (g_total, (aux, hf_fake)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        hf_fake = jax.lax.stop_gradient(hf_fake)
        metrics = dict(aux)
        metrics["loss/l_g_total"] = g_total

        def d_loss_fn(params_d):
            real_tex = self.d_model.apply(params_d, hf_real)
            fake_tex = self.d_model.apply(params_d, hf_fake)
            return dsn_discriminator_loss(real_tex, fake_tex), (
                jnp.mean(real_tex), jnp.mean(fake_tex),
            )

        (d_loss, (d_r, d_f)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_target.params)
        metrics.update(
            {"loss/l_d_total": d_loss, "disc_Score/real": d_r, "disc_Score/fake": d_f}
        )

        new_g, new_d = state.g, state.d_target
        if do_g:
            upd, opt = self.tx_g.update(g_grads, state.g.opt_state, state.g.params)
            new_g = NetState(optax.apply_updates(state.g.params, upd), opt)
        if do_d:
            upd, opt = self.tx_d.update(d_grads, state.d_target.opt_state, state.d_target.params)
            new_d = NetState(optax.apply_updates(state.d_target.params, upd), opt)
        return GANTrainState(step=state.step + 1, g=new_g, d_target=new_d), metrics

    def train_step(self, state, batch, do_g=True, do_d=True):
        return self._train_step(state, batch, self.lpips_variables, do_g=do_g, do_d=do_d)

    def realness_map(self, params_d, lr_img):
        """Receptive-field real-or-fake map for an LR image (test-time DDM
        precursor, DePatchGAN_wavelet_model.py:270-296)."""
        _, hf = haar_bands(lr_img, norm=self.cfg.norm, cs="cat")
        scores = self.d_model.apply(params_d, hf)[..., 0]
        h, w = hf.shape[-3], hf.shape[-2]
        return ddm_splat(scores, h, w, CONVNETS[self.cfg.d_arch])
