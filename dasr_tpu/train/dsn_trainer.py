"""DSN (Down-Sampling Network) GAN trainer.

Functional, fused train step replacing the reference's imperative loop
(reference: codes/DSN/train.py:199-291). Semantics preserved exactly:

* one G forward and one pair of D scorings per iteration;
* the generator's texture loss reuses the D scores computed *before* the
  discriminator update (the reference's ``retain_graph=True`` pattern) — so
  G and D gradients are both taken at the current params and applied
  simultaneously in one XLA program;
* G loss = w_col * L1(low(fake), low(target)) + w_tex * (-log D(fake)) +
  w_per * LPIPS(fake, target)  (reference: codes/DSN/loss.py:82-92);
* D loss = -log D(real) - log(1 - D(fake)) (or WGAN-GP)
  (codes/DSN/loss.py:25-41);
* disc_freq / gen_freq alternation handled by step-index gating on host.

SPMD: the step is jitted with the batch sharded over the mesh 'data' axis
and params replicated; the mean-reductions in the losses make XLA insert
the gradient all-reduces over ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dasr_tpu.core import mesh as meshlib
from dasr_tpu.data.device_bank import sample_dsn_batch
from dasr_tpu.losses.gan import (
    dsn_discriminator_loss,
    dsn_generator_adv_loss,
)
from dasr_tpu.losses.lpips import LPIPS
from dasr_tpu.nn.discriminators import FSDiscriminator
from dasr_tpu.nn.generators import DSGANGenerator, DeResnet
from dasr_tpu.ops.filters import filter_low, wavelet_ll
from dasr_tpu.train.state import GANTrainState, NetState, make_net_state


@dataclasses.dataclass(frozen=True)
class DSNConfig:
    """Mirrors the reference's argparse surface (DSN/train.py:24-73)."""

    generator: str = "DeResnet"  # 'DeResnet' | 'DSGAN'
    discriminator: str = "FSD"  # 'FSD' | 'nld_s1' | 'nld_s2'
    filter: str = "gau"  # 'gau' | 'avg_pool' | 'wavelet'
    cat_or_sum: str = "cat"
    norm_layer: str = "Instance"
    kernel_size: int = 5
    num_res_blocks: int = 8
    upscale_factor: int = 4
    highpass: bool = True
    wgan: bool = False
    ragan: bool = False
    w_col: float = 1.0
    w_tex: float = 0.005
    w_per: float = 0.01
    use_per_loss: bool = True
    per_type: str = "LPIPS"
    learning_rate: float = 1e-4
    adam_beta_1: float = 0.5
    disc_freq: int = 1
    gen_freq: int = 1
    seed: int = 0  # folded into in-step PRNG draws (WGAN-GP mixing noise)
    packed_trunk: bool = False  # DeResnet 2x2 space-to-depth trunk rewrite
    dtype: Any = None  # compute dtype for the nets (e.g. jnp.bfloat16)


class DSNTrainer:
    """Owns model defs, LPIPS, optimizers and the jitted fused step."""

    def __init__(self, cfg: DSNConfig, lpips_variables=None, mesh=None,
                 schedule: Optional[Callable] = None):
        self.cfg = cfg
        self.mesh = mesh
        if cfg.generator == "DSGAN":
            self.g_model = DSGANGenerator(
                n_res_blocks=cfg.num_res_blocks, dtype=cfg.dtype
            )
        elif cfg.generator == "DeResnet":
            self.g_model = DeResnet(
                n_res_blocks=cfg.num_res_blocks,
                scale=cfg.upscale_factor,
                packed_trunk=cfg.packed_trunk,
                dtype=cfg.dtype,
            )
        else:
            raise NotImplementedError(
                f"Generator model [{cfg.generator}] not recognized"
            )
        self.d_model = FSDiscriminator(
            d_arch=cfg.discriminator,
            filter_type=cfg.filter if cfg.highpass else None,
            kernel_size=cfg.kernel_size,
            cs=cfg.cat_or_sum,
            norm_layer=cfg.norm_layer,
            wgan=cfg.wgan,
            dtype=cfg.dtype,
        )
        self.lpips = LPIPS(net="alex", dtype=cfg.dtype)
        self.lpips_variables = lpips_variables
        schedule = schedule if schedule is not None else cfg.learning_rate
        self.tx_g = optax.adam(schedule, b1=cfg.adam_beta_1, b2=0.999)
        self.tx_d = optax.adam(schedule, b1=cfg.adam_beta_1, b2=0.999)

    # -- init ---------------------------------------------------------------

    def init_state(self, key, lr_size: int = 64, hr_size: int = 256) -> GANTrainState:
        kg, kd, kl = jax.random.split(key, 3)
        g_in = hr_size if self.cfg.generator == "DeResnet" else lr_size
        params_g = self.g_model.init(kg, jnp.zeros((1, g_in, g_in, 3)))
        params_d = self.d_model.init(kd, jnp.zeros((1, lr_size, lr_size, 3)))
        if self.lpips_variables is None and self.cfg.use_per_loss:
            # only when the perceptual loss actually runs (configs without
            # it must not pay LPIPS's size constraint), and at >= 32 px:
            # LPIPS params are input-size-independent, and init below 32
            # would raise (alex stages collapse; losses/lpips.py). A
            # too-small TRAINING crop still fails loudly at step trace.
            s = max(lr_size, 32)
            self.lpips_variables = self.lpips.init(
                kl, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3))
            )
        state = GANTrainState(
            step=0,
            g=make_net_state(params_g, self.tx_g),
            d_target=make_net_state(params_d, self.tx_d),
        )
        if self.mesh is not None:
            state = meshlib.replicate(self.mesh, state)
        return state

    # -- loss pieces ----------------------------------------------------------

    def _color_loss(self, fake, target):
        c = self.cfg
        if c.filter == "wavelet":
            lf, lt = wavelet_ll(fake, norm=True), wavelet_ll(target, norm=True)
        else:
            kw = dict(
                kernel_size=c.kernel_size, padding=False, gaussian=(c.filter == "gau")
            )
            lf, lt = filter_low(fake, **kw), filter_low(target, **kw)
        return jnp.mean(jnp.abs(lf.astype(jnp.float32) - lt.astype(jnp.float32)))

    def _per_loss(self, lpips_variables, fake, target):
        d = self.lpips.apply(lpips_variables, fake, target, normalize=True)
        return jnp.mean(d)

    # -- fused step -----------------------------------------------------------

    def train_step(self, state: GANTrainState, batch, do_g: bool = True,
                   do_d: bool = True):
        return self._train_step(
            state, batch, self.lpips_variables, do_g=do_g, do_d=do_d
        )

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _train_multi(self, state, batches, lpips_variables, do_g=True, do_d=True):
        def body(st, bt):
            return self._train_step(st, bt, lpips_variables, do_g=do_g, do_d=do_d)

        return jax.lax.scan(body, state, batches)

    def train_multi_step(self, state: GANTrainState, batches, do_g: bool = True,
                         do_d: bool = True):
        """K steps in one dispatch over K stacked batches (lax.scan; same
        math as K sequential steps). Valid when disc_freq == gen_freq == 1
        (the reference defaults, DSN/train.py:55-56); the CLI gates on
        that. Amortizes the ~9 ms/step remote-dispatch cost (BENCH_NOTES)."""
        return self._train_multi(
            state, batches, self.lpips_variables, do_g=do_g, do_d=do_d
        )

    @functools.partial(jax.jit, static_argnames=("self", "do_g", "do_d"))
    def _train_step(self, state: GANTrainState, batch, lpips_variables,
                    do_g: bool = True, do_d: bool = True):
        """batch: dict(input=HR crop, bicubic=downscaled HR, disc=real LR).

        If "bicubic" is absent the MATLAB-parity downscale runs IN-STEP on
        the MXU (ops/resize.imresize — identical matrices to the host
        imresize_np): the reference's #1 CPU preprocessing hot spot
        (DSN/utils.py:101-166 per-row loops in data workers; SURVEY §3.2)
        becomes two fused device matmuls and the HR->LR target never
        crosses the host->device link.

        uint8 leaves (the ``--transfer_uint8`` wire form) are cast to
        f32/255 here so every upload path — packed single-device puts,
        which pre-cast, AND raw sharded multi-device puts, which don't —
        feeds the same math."""
        batch = {
            k: (v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v)
            for k, v in batch.items()
        }
        c = self.cfg
        if "bicubic" in batch:
            target = batch["bicubic"]
        else:
            from dasr_tpu.ops.resize import imresize

            target = imresize(batch["input"], 1.0 / c.upscale_factor)
        g_input = target if c.generator == "DSGAN" else batch["input"]
        disc_img = batch["disc"]

        def d_scores(params_d, fake):
            if c.ragan:
                real_tex = self.d_model.apply(params_d, disc_img, fake)
                fake_tex = self.d_model.apply(params_d, fake, disc_img)
            else:
                real_tex = self.d_model.apply(params_d, disc_img)
                fake_tex = self.d_model.apply(params_d, fake)
            return real_tex, fake_tex

        # --- G gradient (through D at current params) ---
        def g_loss_fn(params_g):
            fake = self.g_model.apply(params_g, g_input)
            _, fake_tex = d_scores(state.d_target.params, fake)
            l_tex = dsn_generator_adv_loss(fake_tex, wasserstein=c.wgan)
            l_col = self._color_loss(fake, target)
            loss = c.w_col * l_col + c.w_tex * l_tex
            l_per = jnp.float32(0)
            if c.use_per_loss:
                l_per = self._per_loss(lpips_variables, fake, target)
                loss = loss + c.w_per * l_per
            return loss, (fake, l_col, l_tex, l_per)

        (g_loss, (fake, l_col, l_tex, l_per)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)

        # --- D gradient on the same (pre-update) params, detached fake ---
        fake_det = jax.lax.stop_gradient(fake)

        def d_loss_fn(params_d):
            real_tex, fake_tex = d_scores(params_d, fake_det)
            gp = 0.0
            if c.wgan:
                # WGAN-GP: one uniform scalar mixes real/fake, penalty
                # 10*(||grad|| - 1)^2 (reference: DSN/train.py:229-236).
                # The mixing noise folds the RUN seed (cfg.seed) into the
                # per-step key so different seeds draw different
                # interpolation sequences — the reference draws from the
                # ambient torch RNG, which varies with the run seed too.
                from dasr_tpu.losses.gan import gradient_penalty

                key = jax.random.fold_in(jax.random.key(c.seed), state.step)
                gp = 10.0 * gradient_penalty(
                    lambda v: self.d_model.apply(params_d, v),
                    disc_img, fake_det, key,
                )
            return dsn_discriminator_loss(
                real_tex, fake_tex, wasserstein=c.wgan, grad_penalty=gp
            ), (jnp.mean(real_tex), jnp.mean(fake_tex))

        (d_loss, (d_real, d_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_target.params)

        new_g = state.g
        if do_g:
            updates, opt_g = self.tx_g.update(g_grads, state.g.opt_state, state.g.params)
            new_g = NetState(optax.apply_updates(state.g.params, updates), opt_g)
        new_d = state.d_target
        if do_d:
            updates, opt_d = self.tx_d.update(
                d_grads, state.d_target.opt_state, state.d_target.params
            )
            new_d = NetState(
                optax.apply_updates(state.d_target.params, updates), opt_d
            )

        # rgb/mean diagnostics: L1 between per-image spatial means, so the
        # differing fake-LR / input-HR sizes don't matter (reference:
        # DSN/loss.py:97-101, logged at DSN/train.py:270-276 against input)
        fake32 = fake.astype(jnp.float32)
        # DSGAN mode reassigns input_img = bicubic (DSN/train.py:216)
        ref32 = (
            batch["bicubic"] if c.generator == "DSGAN" else batch["input"]
        ).astype(jnp.float32)
        rgb_loss = jnp.mean(
            jnp.abs(jnp.mean(fake32, axis=(1, 2)) - jnp.mean(ref32, axis=(1, 2)))
        )
        mean_loss = jnp.mean(
            jnp.abs(
                jnp.mean(fake32, axis=(1, 2, 3)) - jnp.mean(ref32, axis=(1, 2, 3))
            )
        )
        metrics = {
            "loss/g_overall_loss": g_loss,
            "loss/color_loss": l_col,
            "loss/g_tex_loss": l_tex,
            "loss/perceptual_loss": l_per,
            "loss/d_tex_loss": d_loss,
            "loss/rgb_loss": rgb_loss,
            "loss/mean_loss": mean_loss,
            "disc_score/real": d_real,
            "disc_score/fake": d_fake,
        }
        return (
            GANTrainState(step=state.step + 1, g=new_g, d_target=new_d),
            metrics,
        )

    @functools.partial(
        jax.jit,
        static_argnames=("self", "crop", "flips", "rotations", "do_g", "do_d"),
    )
    def _train_banked(self, state, clean_bank, noisy_bank, noisy_idx, seed,
                      lpips_variables, crop, flips, rotations,
                      do_g=True, do_d=True):
        # (run seed, window position) -> key: resume-consistent crop streams
        key = jax.random.fold_in(jax.random.key(self.cfg.seed), seed)

        def body(carry, idx_row):
            st, kk = carry
            kk, sub = jax.random.split(kk)
            batch = sample_dsn_batch(
                clean_bank, noisy_bank, idx_row, sub, crop,
                self.cfg.upscale_factor, flips, rotations,
            )
            st, metrics = self._train_step(
                st, batch, lpips_variables, do_g=do_g, do_d=do_d
            )
            return (st, kk), metrics

        if noisy_idx.shape[0] == 1:
            # K=1: call the body directly instead of a length-1 lax.scan
            # (measured identical device ops — XLA canonicalizes it — but
            # the direct form keeps the HLO free of a degenerate while op)
            (state, _), metrics = body((state, key), noisy_idx[0])
            return state, metrics
        (state, _), metrics = jax.lax.scan(body, (state, key), noisy_idx)
        # last-step metrics only, selected IN-jit: stripping the (K,) axis
        # host-side cost 9 tiny async dispatches per window (~12.7 ms/step
        # of tunnel overhead at k=1; BENCH_NOTES r4)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    def train_banked_step(self, state: GANTrainState, clean_bank, noisy_bank,
                          noisy_idx, seed, crop: int, flips: bool = False,
                          rotations: bool = False, do_g: bool = True,
                          do_d: bool = True):
        """K train steps sampling crops from DEVICE-RESIDENT image banks
        (data/device_bank.py) — per-dispatch wire traffic is just the
        (K, B) int32 noisy-index window + a uint32 PRNG seed riding along
        with the call, vs ~1.7 MB/step of crop uploads on the host-loader
        path (which is wire-bound through the remote tunnel; BENCH_NOTES
        r3). Same math as K sequential `train_step`s on batches drawn by
        DSNTrainDataset — the sampling law is identical, the PRNG stream
        is jax instead of numpy. ``noisy_idx``: (K, B) int32; ``seed``: a
        per-window host integer (the CLI passes the iteration at window
        start), folded with ``cfg.seed`` in-step — no device PRNG
        round-trips on the host thread and no recompile across windows.
        Returns (state, metrics) where metrics are the LAST step's values
        (selected in-jit — host-side (K,) indexing cost ~12.7 ms/step of
        tunnel dispatch; tests/test_device_bank.py pins the sampling law
        and drives the CLI path on a 2-device mesh)."""
        return self._train_banked(
            state, clean_bank, noisy_bank, noisy_idx, np.uint32(seed),
            self.lpips_variables, crop, flips, rotations,
            do_g=do_g, do_d=do_d,
        )

    def generate(self, params_g, x):
        if not hasattr(self, "_jit_generate"):
            self._jit_generate = jax.jit(self.g_model.apply)
        return self._jit_generate(params_g, x)
