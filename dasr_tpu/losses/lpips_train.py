"""LPIPS 2AFC training pieces (reference: codes/PerceptualSimilarity/models/
networks_basic.py:114-141 + dist_model.py:88-130).

``Dist2LogitLayer`` maps two distances to a preference probability;
``BCERankingLoss`` trains the metric on two-alternative-forced-choice human
judgements. ``twoafc_step`` is the functional jitted training step: only the
linear heads (and the ranking net) receive gradients, the backbone stays
frozen, and the heads are clamped nonnegative after each update —
reproducing DistModel's ``clamp_weights`` (dist_model.py:125-130).
"""

from __future__ import annotations

import functools
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from dasr_tpu.losses.lpips import LPIPS


class Dist2LogitLayer(nn.Module):
    chn_mid: int = 32
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, d0, d1, eps: float = 0.1):
        x = jnp.concatenate(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1
        )
        x = nn.leaky_relu(nn.Conv(self.chn_mid, (1, 1))(x), 0.2)
        x = nn.leaky_relu(nn.Conv(self.chn_mid, (1, 1))(x), 0.2)
        x = nn.Conv(1, (1, 1))(x)
        return nn.sigmoid(x) if self.use_sigmoid else x


def bce_ranking_loss(logit, judge):
    """BCE on the preference probability; judge in [-1,1] -> p in [0,1]."""
    per = (judge + 1.0) / 2.0
    logit = jnp.clip(logit, 1e-7, 1 - 1e-7)
    return jnp.mean(-(per * jnp.log(logit) + (1 - per) * jnp.log(1 - logit)))


class TwoAFCTrainer:
    """Trains LPIPS linear heads + ranking net on 2AFC triplets."""

    def __init__(self, net: str = "alex", lr: float = 1e-4, beta1: float = 0.5):
        self.lpips = LPIPS(net=net)
        self.rank = Dist2LogitLayer()
        self.tx = optax.adam(lr, b1=beta1, b2=0.999)

    def init(self, key, lpips_variables, patch: int = 64):
        z = jnp.zeros((1, patch, patch, 3))
        d = jnp.ones((1, 1, 1, 1))
        rank_vars = self.rank.init(key, d, d)
        trainable = {
            "lins": {
                k: v
                for k, v in lpips_variables["params"].items()
                if k.startswith("lin")
            },
            "rank": rank_vars["params"],
        }
        frozen_backbone = lpips_variables["params"]["backbone"]
        return trainable, frozen_backbone, self.tx.init(trainable)

    def _dist(self, trainable, backbone, ref, img):
        variables = {"params": {**trainable["lins"], "backbone": backbone}}
        return self.lpips.apply(variables, ref, img)

    @functools.partial(jax.jit, static_argnames=("self",))
    def step(self, trainable, opt_state, backbone, batch):
        """batch: ref, p0, p1 in [-1,1] NHWC; judge (B,1,1,1) in [0,1]."""

        def loss_fn(tr):
            d0 = self._dist(tr, backbone, batch["ref"], batch["p0"])
            d1 = self._dist(tr, backbone, batch["ref"], batch["p1"])
            logit = self.rank.apply({"params": tr["rank"]}, d0, d1)
            judge = batch["judge"] * 2.0 - 1.0
            loss = bce_ranking_loss(logit, judge)
            acc = jnp.mean(
                ((d1 < d0) == (batch["judge"] > 0.5)).astype(jnp.float32)
            )
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        upd, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, upd)
        # clamp linear heads nonnegative (dist_model.py:125-130)
        trainable = dict(trainable)
        trainable["lins"] = jax.tree.map(
            lambda w: jnp.maximum(w, 0.0), trainable["lins"]
        )
        return trainable, opt_state, {"loss": loss, "acc": acc}
