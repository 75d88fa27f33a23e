"""Supervised degradation trainer ('De_Resnet' registry entry).

Reference: codes/SRN/models/Degradation_Resnet.py:15-151 — trains an HR->LR
generator with a plain pixel loss against the paired LR (no GAN). The
reference's registry has a latent import typo (``DegrationModel`` vs class
``DegradationModel``, models/__init__.py:15); both spellings are accepted
by our config normalizer (core.config).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax

from dasr_tpu.nn.generators import DeResnet
from dasr_tpu.train.state import NetState, make_net_state


@dataclasses.dataclass(frozen=True)
class DegradationConfig:
    scale: int = 4
    nb: int = 8
    lr_g: float = 1e-4
    beta1_g: float = 0.9
    lr_steps: Sequence[int] = (100000, 200000)
    lr_gamma: float = 0.5
    pixel_criterion: str = "l1"
    pixel_weight: float = 1.0
    dtype: Any = None


class DegradationTrainer:
    def __init__(self, cfg: DegradationConfig, g_model=None):
        self.cfg = cfg
        self.g_model = g_model or DeResnet(
            n_res_blocks=cfg.nb, scale=cfg.scale, dtype=cfg.dtype
        )
        sched = optax.piecewise_constant_schedule(
            cfg.lr_g, {int(m): cfg.lr_gamma for m in cfg.lr_steps}
        )
        self.tx = optax.adam(sched, b1=cfg.beta1_g, b2=0.999)

    def init_state(self, key, hr_size: int = 128) -> NetState:
        params = self.g_model.init(key, jnp.zeros((1, hr_size, hr_size, 3)))
        return make_net_state(params, self.tx)

    @functools.partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: NetState, batch):
        c = self.cfg

        def loss_fn(params):
            fake_lr = self.g_model.apply(params, batch["HR"])
            d = fake_lr.astype(jnp.float32) - batch["LR"].astype(jnp.float32)
            l = jnp.mean(jnp.abs(d)) if c.pixel_criterion == "l1" else jnp.mean(d * d)
            return c.pixel_weight * l

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        upd, opt = self.tx.update(grads, state.opt_state, state.params)
        return (
            NetState(optax.apply_updates(state.params, upd), opt),
            {"loss/l_pix": loss},
        )

    def degrade(self, params, hr_img):
        return self.g_model.apply(params, hr_img)
