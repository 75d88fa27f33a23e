"""SRGAN / SRRaGAN trainers (ESRGAN recipe).

Functional rework of the reference's SRGAN_model.py:16-242 and
SRRaGAN_model.py:113-187: G loss = pixel (l1/l2) + VGG19-54 feature (l1/l2)
+ adversarial (vanilla / lsgan / wgan-gp, or relativistic-average pairs for
SRRaGAN); D on full images (VGG-style global D by default). One fused jitted
step computes G and D grads at the current params (the reference's
detach/zero_grad ordering preserved), with ``D_update_ratio`` /
``D_init_iters`` gating on the host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax

from dasr_tpu.core import mesh as meshlib
from dasr_tpu.losses.gan import gan_loss, gradient_penalty, ragan_pair_loss
from dasr_tpu.nn.discriminators import DiscriminatorVGG
from dasr_tpu.nn.generators import RRDBNet
from dasr_tpu.nn.vgg import VGG19Feature54
from dasr_tpu.train.state import GANTrainState, NetState, make_net_state


@dataclasses.dataclass(frozen=True)
class SRGANConfig:
    scale: int = 4
    nf: int = 64
    nb: int = 23
    gc: int = 32
    d_input_size: int = 128
    d_nf: int = 64
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    beta1_g: float = 0.9
    beta1_d: float = 0.9
    lr_steps: Sequence[int] = (50000, 100000, 200000, 300000)
    lr_gamma: float = 0.5
    pixel_criterion: str = "l1"
    pixel_weight: float = 1e-2
    feature_criterion: str = "l1"
    feature_weight: float = 1.0
    gan_type: str = "vanilla"
    gan_weight: float = 5e-3
    ragan: bool = False  # True = SRRaGAN (SRRaGAN_model.py:113-187)
    gp_weight: float = 10.0
    d_update_ratio: int = 1
    d_init_iters: int = 0
    dtype: Any = None


class SRGANTrainer:
    def __init__(self, cfg: SRGANConfig, vgg_variables=None, mesh=None,
                 g_model=None, d_model=None):
        self.cfg = cfg
        self.mesh = mesh
        self.g_model = g_model or RRDBNet(
            nf=cfg.nf, nb=cfg.nb, gc=cfg.gc, upscale=cfg.scale, dtype=cfg.dtype
        )
        self.d_model = d_model or DiscriminatorVGG(
            input_size=cfg.d_input_size, nf=cfg.d_nf, dtype=cfg.dtype
        )
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

    def init_state(self, key, lr_size: int = 32) -> GANTrainState:
        c = self.cfg
        kg, kd, kf = jax.random.split(key, 3)
        hr = lr_size * c.scale
        params_g = self.g_model.init(kg, jnp.zeros((1, lr_size, lr_size, 3)))
        d_vars = self.d_model.init(kd, jnp.zeros((1, hr, hr, 3)))
        if self.vgg_variables is None and c.feature_weight > 0:
            self.vgg_variables = self.vgg.init(kf, jnp.zeros((1, hr, hr, 3)))
        # D params and BatchNorm running stats are kept separately so the
        # optimizer only sees params (stats live in NetState.extra)
        d_params = {"params": d_vars["params"]}
        d_stats = d_vars.get("batch_stats", {})
        state = GANTrainState(
            step=0,
            g=make_net_state(params_g, self.tx_g),
            d_target=make_net_state(d_params, self.tx_d, extra=d_stats),
        )
        if self.mesh is not None:
            state = meshlib.replicate(self.mesh, state)
        return state

    def _pix(self, a, b, kind):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        return jnp.mean(jnp.abs(d)) if kind == "l1" else jnp.mean(d * d)

    def _d_apply(self, d_params, d_stats, x):
        # VGG-D has BatchNorm: train mode uses batch statistics; running
        # stats are threaded back through NetState.extra
        out, mut = self.d_model.apply(
            {"params": d_params["params"], "batch_stats": d_stats},
            x,
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _train_step(self, state, batch, frozen, rng, do_g=True, do_d=True):
        c = self.cfg
        var_l, var_h = batch["LR"], batch["HR"]
        var_ref = batch.get("ref", var_h)
        vgg_variables = frozen.get("vgg")

        def g_loss_fn(params_g):
            fake_h = self.g_model.apply(params_g, var_l)
            total = jnp.float32(0)
            aux = {}
            if c.pixel_weight > 0:
                l_pix = c.pixel_weight * self._pix(fake_h, var_h, c.pixel_criterion)
                total += l_pix
                aux["loss/l_g_pix"] = l_pix
            if c.feature_weight > 0:
                f_real = jax.lax.stop_gradient(self.vgg.apply(vgg_variables, var_h))
                f_fake = self.vgg.apply(vgg_variables, fake_h)
                l_fea = c.feature_weight * self._pix(f_fake, f_real, c.feature_criterion)
                total += l_fea
                aux["loss/l_g_fea"] = l_fea
            pred_fake, _ = self._d_apply(
                state.d_target.params, state.d_target.extra, fake_h
            )
            if c.ragan:
                pred_real = jax.lax.stop_gradient(
                    self._d_apply(state.d_target.params, state.d_target.extra, var_ref)[0]
                )
                l_gan = c.gan_weight * ragan_pair_loss(pred_fake, pred_real, c.gan_type)
            else:
                l_gan = c.gan_weight * gan_loss(pred_fake, True, c.gan_type)
            total += l_gan
            aux["loss/l_g_gan"] = l_gan
            return total, (aux, fake_h)

        (g_total, (aux, fake_h)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        fake_det = jax.lax.stop_gradient(fake_h)
        metrics = dict(aux)
        metrics["loss/l_g_total"] = g_total

        def d_loss_fn(d_params):
            pr, stats1 = self._d_apply(d_params, state.d_target.extra, var_ref)
            pf, stats2 = self._d_apply(d_params, stats1, fake_det)
            if c.ragan:
                l_real = gan_loss(pr - jnp.mean(pf, 0, keepdims=True), True, c.gan_type)
                l_fake = gan_loss(pf - jnp.mean(pr, 0, keepdims=True), False, c.gan_type)
                loss = (l_real + l_fake) / 2
            else:
                l_real = gan_loss(pr, True, c.gan_type)
                l_fake = gan_loss(pf, False, c.gan_type)
                loss = l_real + l_fake
            if c.gan_type == "wgan-gp":
                gp = gradient_penalty(
                    lambda x: self._d_apply(d_params, stats2, x)[0],
                    var_ref, fake_det, rng,
                )
                loss = loss + c.gp_weight * gp
            return loss, (jnp.mean(pr), jnp.mean(pf), stats2)

        (d_loss, (d_r, d_f, new_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_target.params)
        new_stats = jax.lax.stop_gradient(new_stats)
        metrics.update(
            {"loss/l_d_total": d_loss, "disc_Score/D_real": d_r, "disc_Score/D_fake": d_f}
        )

        new_g = state.g
        if do_g:
            upd, opt = self.tx_g.update(g_grads, state.g.opt_state, state.g.params)
            new_g = NetState(optax.apply_updates(state.g.params, upd), opt)
        new_d = state.d_target
        if do_d:
            upd, opt = self.tx_d.update(d_grads, state.d_target.opt_state, state.d_target.params)
            new_d = NetState(
                optax.apply_updates(state.d_target.params, upd), opt, extra=new_stats
            )
        return GANTrainState(step=state.step + 1, g=new_g, d_target=new_d), metrics

    def train_step(self, state, batch, rng=None, do_g=True, do_d=True):
        frozen = {"vgg": self.vgg_variables} if self.cfg.feature_weight > 0 else {}
        rng = rng if rng is not None else jax.random.key(int(state.step))
        return self._train_step(state, batch, frozen, rng, do_g=do_g, do_d=do_d)

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _train_multi(self, state, batches, frozen, rngs, do_g=True, do_d=True):
        def body(st, xs):
            bt, rng = xs
            return self._train_step(st, bt, frozen, rng, do_g=do_g, do_d=do_d)

        return jax.lax.scan(body, state, (batches, rngs))

    def train_multi_step(self, state, batches, rng=None, do_g=True, do_d=True):
        """K steps in one dispatch (lax.scan over stacked batches + split
        per-step rngs). Identical to K sequential ``train_step`` calls fed
        the same per-step rngs; with the default rng the GP-interpolation
        noise stream differs (statistically equivalent). See
        SRNTrainer.train_multi_step for the dispatch-cost rationale."""
        frozen = {"vgg": self.vgg_variables} if self.cfg.feature_weight > 0 else {}
        k = jax.tree.leaves(batches)[0].shape[0]
        rng = rng if rng is not None else jax.random.key(int(state.step))
        rngs = jax.random.split(rng, k)
        return self._train_multi(state, batches, frozen, rngs, do_g=do_g, do_d=do_d)

    def sr(self, params_g, lr_img):
        return self.g_model.apply(params_g, lr_img)
