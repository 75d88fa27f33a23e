"""Model registry — trainer/inference facades keyed like the reference.

``create_model(opt)`` mirrors codes/SRN/models/__init__.py:5-26 (plus the
legacy-name normalization done in core.config): 'sr', 'srgan', 'srragan',
'De_Resnet', 'De_patch_wavelet_GAN', 'DASR', 'DASR_Adaptive_Model'.

``define_G`` mirrors the network factory (codes/SRN/models/networks.py:83-147).

Each facade exposes the same surface the reference's trainers do
(feed-style ``train_step``, ``test``, ``save``/``load``) but built on the
functional jitted steps in dasr_tpu.train.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.losses.lpips import (
    LPIPS,
    default_lpips_variables,
    load_lpips_params,
    reference_lin_weights_path,
)
from dasr_tpu.nn.generators import DSGANGenerator, DeResnet, RRDBNet, SRResNet
from dasr_tpu.ops.tiled import forward_chop, tiled_apply
from dasr_tpu.train import checkpoints
from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer
from dasr_tpu.utils.transfer import (
    device_put_packed as _device_put_packed,
    metrics_to_host as _metrics_to_host,
)


def define_G(opt: Dict) -> Any:
    """Build the generator module from a network_G config block."""
    net = opt["network_G"]
    which = net["which_model_G"]
    scale = opt.get("scale", 4)
    dtype = jnp.bfloat16 if opt.get("bf16", True) else None
    if which in ("RRDB_net", "RRDB_mask"):
        # "fused_tail"/"scan_blocks": opt-in exact apply-time rewrites
        # (phase-conv upsampling tail, lax.scan trunk; ops/packed.py)
        fused = bool(net.get("fused_tail")) and scale in (2, 4, 8)
        scan = bool(net.get("scan_blocks")) and net.get("norm_type") is None
        return RRDBNet(
            in_nc=net.get("in_nc", 3), out_nc=net.get("out_nc", 3),
            nf=net.get("nf", 64), nb=net.get("nb", 23), gc=net.get("gc", 32),
            upscale=scale, norm_type=net.get("norm_type"), dtype=dtype,
            fused_tail=fused, scan_blocks=scan,
        )
    if which == "sr_resnet":
        return SRResNet(
            in_nc=net.get("in_nc", 3), out_nc=net.get("out_nc", 3),
            nf=net.get("nf", 64), nb=net.get("nb", 16), upscale=scale,
            norm_type=net.get("norm_type"), mode=net.get("mode", "NAC"),
            dtype=dtype,
        )
    if which in ("De_Resnet", "De_RRDB", "De_Resnet_bilinear", "De_Resnet2xd"):
        # SRN arch.De_Resnet family (architecture.py:51-171). The reference
        # maps De_RRDB -> arch.De_Resnet with act 'relu' (networks.py:124-127)
        # and hardwires act 'relu' for the bilinear/2xd variants too
        # (networks.py:113-122); plain De_Resnet takes the config act_type.
        from dasr_tpu.nn.generators import DeResnetSRN

        variant = {
            "De_Resnet": "strided", "De_RRDB": "strided",
            "De_Resnet_bilinear": "bilinear", "De_Resnet2xd": "x2",
        }[which]
        act = net.get("act_type") if which == "De_Resnet" else "relu"
        return DeResnetSRN(
            in_nc=net.get("in_nc", 3), out_nc=net.get("out_nc", 3),
            nf=net.get("nf", 64), nb=net.get("nb", 8) or 8, downscale=scale,
            norm_type=net.get("norm_type"), act_type=act,
            mode=net.get("mode", "NAC") or "NAC", variant=variant, dtype=dtype,
        )
    if which == "DSGAN":
        return DSGANGenerator(dtype=dtype)
    if which == "RRDB_SEAN":
        from dasr_tpu.nn.generators import RRDBNetSEAN

        return RRDBNetSEAN(
            in_nc=net.get("in_nc", 3), out_nc=net.get("out_nc", 3),
            nf=net.get("nf", 64), nb=net.get("nb", 23), gc=net.get("gc", 32),
            nb_ada=net.get("ada_nb", 1) or 1, upscale=scale,
            norm_type=net.get("norm_type"), dtype=dtype,
        )
    if which in ("RRDB_Residual_conv", "RRDB_Residual_conv_concat"):
        from dasr_tpu.nn.generators import RRDBNetResidualConv

        return RRDBNetResidualConv(
            in_nc=net.get("in_nc", 3), out_nc=net.get("out_nc", 3),
            nf=net.get("nf", 64), nb=net.get("nb", 23), gc=net.get("gc", 32),
            nb_ada=net.get("ada_nb", 1) or 1,
            concat=(which != "RRDB_Residual_conv"),
            upscale=scale, dtype=dtype,
        )
    if which == "sft_arch":
        from dasr_tpu.nn.sft import SFTNet

        return SFTNet(dtype=dtype)
    raise NotImplementedError(f"Generator model [{which}] not recognized")


def define_D(opt: Dict) -> Any:
    """Discriminator factory (reference: codes/SRN/models/networks.py:151-194)."""
    net = opt.get("network_D") or {}
    which = net.get("which_model_D", "discriminator_vgg_128")
    return _build_d(which, net, opt)


def define_pairD(opt: Dict) -> Any:
    """Paired-domain D factory (networks.py:196-227)."""
    net = opt.get("network_D") or {}
    which = net.get("which_model_pairD", net.get("which_model_D"))
    return _build_d(which, net, opt)


def define_patchD(opt: Dict) -> Any:
    """FS patch-D factory (networks.py:229-245)."""
    from dasr_tpu.nn.discriminators import FSDiscriminator

    net = opt.get("network_patchD") or {}
    if net.get("which_patchD", "FSD") != "FSD":
        raise NotImplementedError(
            f"Patch Discriminator model [{net.get('which_patchD')}] not recognized"
        )
    return FSDiscriminator(
        d_arch="FSD",
        filter_type=net.get("FS_type", "gau") or "gau",
        kernel_size=net.get("kernel_size", 5) or 5,
        norm_layer=net.get("norm_layer", "Instance") or "Instance",
    )


def _build_d(which: str, net: Dict, opt: Dict) -> Any:
    from dasr_tpu.nn.discriminators import (
        DiscriminatorBasic,
        DiscriminatorVGG,
        DiscriminatorVGG128SN,
        NLayerDiscriminator,
        make_vgg_discriminator,
    )

    dtype = jnp.bfloat16 if opt.get("bf16", True) else None
    if which == "discriminator_vgg_128":
        return DiscriminatorVGG(input_size=128, in_ch=net.get("in_nc", 3),
                                nf=net.get("nf", 64), dtype=dtype)
    if which == "discriminator_vgg_128_SN":
        return DiscriminatorVGG128SN(dtype=dtype)
    if which == "discriminator_patch":
        return NLayerDiscriminator(
            in_ch=net.get("in_nc", 3), ndf=net.get("nf", 64),
            n_layers=net.get("n_layers", 3) or 3, norm_layer="Instance",
            stride=2, use_bias_middle=False, dtype=dtype,
        )
    if which == "DSGAN":
        return DiscriminatorBasic(in_ch=net.get("in_nc", 3), dtype=dtype)
    if which == "dis_acd":
        from dasr_tpu.nn.sft import ACDVGGBN96

        return ACDVGGBN96(dtype=dtype)
    return make_vgg_discriminator(
        which, in_nc=net.get("in_nc", 3), nf=net.get("nf", 64),
        norm_type=net.get("norm_type", "batch"),
        act_type=net.get("act_type", "leakyrelu"),
        mode=net.get("mode", "CNA"), dtype=dtype,
    )


class _InferenceMixin:
    """Shared large-image inference honoring the reference's chop flag.

    Optional ``"pad_bucket": N`` rounds input sizes up to multiples of N
    (reflect pad, cropped after) so varied-size test sets share one
    compilation — interior-exact, tiny border deviations; off by default
    for strict reference parity.

    ``chop`` semantics match the reference per-trainer: SRModel chops
    unconditionally whenever the flag is set (codes/SRN/models/
    SR_model.py:88-100 — size gating happens inside forward_chop); the DASR
    trainers only chop above 320k input pixels (DASR_model.py:337), exposed
    here as ``chop_threshold``.
    """

    chop_threshold: int = 0

    def prepare_mesh(self, mesh, spatial_shard: bool = False):
        """Route inference through the multi-chip paths (VERDICT r2 #4):
        with ``chop``, the tile batch fans out over the mesh 'data' axis
        (ops/tiled.tiled_apply); with ``spatial_shard`` the image's H axis
        is sharded with ppermute halo exchange over ICI
        (ops/spatial_shard.spatially_sharded_apply) — the TPU-native
        supersession of the reference's DataParallel forward_chop
        (codes/SRN/utils/util.py:87-147). Replicates the loaded params
        over the mesh so jit sees consistent shardings."""
        from dasr_tpu.core import mesh as meshlib

        self._mesh = mesh
        self._spatial_shard = bool(spatial_shard)
        if getattr(self, "params", None) is not None:
            self.params = meshlib.replicate(mesh, self.params)
        if getattr(self, "state", None) is not None:
            self.state = meshlib.replicate(mesh, self.state)
        return self

    def _infer_dev(self, lr_img: np.ndarray):
        """Dispatch inference; returns the (device) SR array unfenced so a
        caller can pipeline the readback against the next dispatch."""
        h0, w0 = lr_img.shape[0], lr_img.shape[1]
        x = jnp.asarray(lr_img)[None]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        scale = self.opt.get("scale", 4)
        bucket = int(self.opt.get("pad_bucket") or 0)
        if bucket:
            import math

            bh = math.ceil(h0 / bucket) * bucket
            bw = math.ceil(w0 / bucket) * bucket
            x = jnp.pad(
                x, ((0, 0), (0, bh - h0), (0, bw - w0), (0, 0)), mode="reflect"
            )
        mesh = getattr(self, "_mesh", None)
        if mesh is not None and getattr(self, "_spatial_shard", False):
            from dasr_tpu.ops.spatial_shard import spatially_sharded_apply

            n = mesh.shape["data"]
            halo = 20  # forward_chop's shave (utils/util.py:96)
            if (x.shape[1] + n - 1) // n >= halo:
                out = spatially_sharded_apply(
                    x, self._apply_g, scale=scale, halo=halo, mesh=mesh
                )
                return out[0, : scale * h0, : scale * w0, :]
            # image too small to shard with this halo: fall through
        if self.opt.get("chop") and h0 * w0 >= self.chop_threshold:
            if self.opt.get("chop_parity"):
                out = forward_chop(x, scale, self._apply_g, min_size=320000)
            else:
                out = tiled_apply(
                    x, self._apply_g, scale=scale, tile=128, halo=16, mesh=mesh
                )
        else:
            out = self._apply_g(x)
        return out[0, : scale * h0, : scale * w0, :]

    def test_async(self, lr_img: np.ndarray):
        """Like ``test`` but returns the un-fenced device array (read it
        with ``np.asarray``) — lets eval loops overlap the per-image
        readback with the next image's device work."""
        return self._infer_dev(lr_img)

    def test_batch_async(self, lr_imgs):
        """One plain forward over a stack of SAME-SHAPE images (un-fenced).

        Small val images leave the chip mostly idle at batch 1; validation
        loops batch them (srn_train ``val_batch``). Plain path only — the
        chop/mesh paths stay per-image."""
        x = jnp.stack([jnp.asarray(im) for im in lr_imgs])
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return self._apply_g(x)

    def _infer(self, lr_img: np.ndarray) -> np.ndarray:
        return np.asarray(self._infer_dev(lr_img))


class SRModel(_InferenceMixin):
    """'sr' — PSNR-oriented trainer (reference: codes/SRN/models/SR_model.py).

    G-only: pixel loss (l1/l2) with MultiStepLR Adam; test with optional
    chop and LPIPS.
    """

    def __init__(self, opt: Dict):
        import optax

        from dasr_tpu.train.state import NetState

        self.opt = opt
        self.g_model = define_G(opt)
        train = opt.get("train") or {}
        sched = optax.piecewise_constant_schedule(
            train.get("lr_G", 1e-4),
            {int(m): train.get("lr_gamma", 0.5) for m in (train.get("lr_steps") or [])},
        )
        self.tx = optax.adam(sched, b1=train.get("beta1_G", 0.9))
        self.criterion = train.get("pixel_criterion", "l1")
        self.params = None
        self.opt_state = None
        self.step = 0
        self._jit_apply = None

    def init(self, key=None, lr_size: int = 32):
        key = key if key is not None else jax.random.key(0)
        self.params = self.g_model.init(key, jnp.zeros((1, lr_size, lr_size, 3)))
        self.opt_state = self.tx.init(self.params)
        return self

    def load(self):
        path = (self.opt.get("path") or {}).get("pretrain_model_G")
        if path:
            self.load_network(path)
        return self

    def load_network(self, path: str):
        if path.endswith(".pth"):
            nb = (self.opt.get("network_G") or {}).get("nb", 23)
            self.params = checkpoints.import_rrdbnet_params(path, nb=nb)
        else:
            restored, _ = checkpoints.restore_checkpoint(path)
            # save() writes the variables dict directly; full training
            # states (DASR/DSN/SRGAN) keep the generator under "g", itself a
            # TrainState-shaped {params, opt_state, extra} — unwrap both
            if isinstance(restored, dict) and "g" in restored:
                restored = restored["g"]
            if (
                isinstance(restored, dict)
                and "params" in restored
                and "opt_state" in restored
            ):
                restored = restored["params"]
            self.params = restored
        if self.opt_state is None:
            self.opt_state = self.tx.init(self.params)
        return self

    def _apply_g(self, x):
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.g_model.apply)
        return self._jit_apply(self.params, x)

    def test(self, lr_img: np.ndarray) -> np.ndarray:
        return self._infer(lr_img)

    def test_x8(self, lr_img: np.ndarray) -> np.ndarray:
        """Geometric self-ensemble: average the 8 dihedral transforms
        (reference: codes/SRN/models/SR_model.py:102-140)."""
        outs = []
        for rot in range(2):
            for fh in range(2):
                for fv in range(2):
                    t = lr_img
                    if fv:
                        t = t[::-1, :, :]
                    if fh:
                        t = t[:, ::-1, :]
                    if rot:
                        t = t.transpose(1, 0, 2)
                    sr = self._infer(np.ascontiguousarray(t))
                    if rot:
                        sr = sr.transpose(1, 0, 2)
                    if fh:
                        sr = sr[:, ::-1, :]
                    if fv:
                        sr = sr[::-1, :, :]
                    outs.append(sr)
        return np.mean(np.stack(outs), axis=0)

    def train_step(self, batch):
        import optax

        if not hasattr(self, "_jit_step"):

            def step(params, opt_state, lr, hr):
                def loss_fn(p):
                    sr = self.g_model.apply(p, lr)
                    d = sr.astype(jnp.float32) - hr.astype(jnp.float32)
                    return (
                        jnp.mean(jnp.abs(d)) if self.criterion == "l1" else jnp.mean(d * d)
                    )

                loss, grads = jax.value_and_grad(loss_fn)(params)
                upd, new_opt = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, upd), new_opt, loss

            self._jit_step = jax.jit(step)
        self.params, self.opt_state, loss = self._jit_step(
            self.params, self.opt_state, jnp.asarray(batch["LR"]), jnp.asarray(batch["HR"])
        )
        self.step += 1
        return {"loss/l_pix": float(loss)}

    def save(self, ckpt_dir: str, iter_step: int):
        checkpoints.save_checkpoint(
            os.path.join(ckpt_dir, "G"), self.params, iter_step
        )


class _BankedTrainMixin:
    """Device-resident-bank training for the unpaired facades (DASR and
    DASR_Adaptive): upload the stage-3 corpora once, drive (K, B) index
    windows (srn_train --device_bank). Requires the facade to expose
    ``self.trainer`` with ``_train_banked``/``_frozen``/``train_banked_step``
    and ``supports_multi_step``."""

    def setup_device_bank(self, fake_h, hr_h, real_h, ddm_h, hr_size: int,
                          use_flip: bool = True, use_rot: bool = True):
        """Upload the stage-3 banks once and prepare the banked window
        step (data/device_bank.py). Single device: layout-pinned jit
        (entry == upload — zero bank relayout copies when the backend
        honors the pins; see make_banked_step's docstring); mesh:
        replicated default-layout banks (the known relayout cost, same as
        the DSN mesh branch). Requires G/D_update_inter == 1 — the banked
        window scans K fixed do_g/do_d steps, like
        ``supports_multi_step``. ``ddm_h`` is None for the 'LRHR_unpair'
        (Adaptive) mode — weights are computed online."""
        assert self.supports_multi_step, (
            "--device_bank requires G_update_inter == D_update_inter == 1"
        )
        mesh = self.trainer.mesh
        if mesh is None or int(np.prod(mesh.devices.shape)) == 1:
            from dasr_tpu.data.device_bank import make_banked_srn_step

            self._banked_step, self._banks = make_banked_srn_step(
                self.trainer, fake_h, hr_h, real_h, ddm_h, hr_size,
                use_flip=use_flip, use_rot=use_rot,
            )
        else:
            from dasr_tpu.core import mesh as meshlib
            from dasr_tpu.data.device_bank import ImageBank

            def put_bank(b):
                if b is None:
                    return None
                return ImageBank(data=meshlib.replicate(mesh, b.data),
                                 sizes=meshlib.replicate(mesh, b.sizes))

            banks = tuple(put_bank(b) for b in (fake_h, hr_h, real_h, ddm_h))
            self._banks = banks

            def step(state, fake_idx, seed, do_g=True, do_d=True):
                return self.trainer.train_banked_step(
                    state, *banks, fake_idx, seed, hr_size,
                    use_flip=use_flip, use_rot=use_rot, do_g=do_g, do_d=do_d,
                )

            self._banked_step = step
        return self

    def train_banked_window_async(self, fake_idx, seed):
        """Dispatch one (K, B) banked window (after ``setup_device_bank``)
        and return the DEVICE metrics without fencing — read them later
        with ``metrics_to_host`` (the srn_train lagged-readback protocol).
        ``fake_idx``: (K, B) int32 host array; ``seed``: window-start
        iteration (resume replays the same stream)."""
        mesh = self.trainer.mesh
        if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
            from dasr_tpu.core import mesh as meshlib

            fake_idx = meshlib.shard_stacked_batch(mesh, fake_idx)
        self.state, metrics = self._banked_step(self.state, fake_idx, seed)
        return metrics


class DASRModel(_InferenceMixin, _BankedTrainMixin):
    """'DASR' — the paper's SRN trainer, wrapping dasr_tpu.train.SRNTrainer."""

    chop_threshold = 320000  # DASR_model.py:337

    def __init__(self, opt: Dict, mesh=None):
        self.opt = opt
        train = opt.get("train") or {}
        net_g = opt.get("network_G") or {}
        net_d = opt.get("network_D") or {}
        cfg = SRNConfig(
            scale=opt.get("scale", 4),
            nf=net_g.get("nf", 64), nb=net_g.get("nb", 23), gc=net_g.get("gc", 32),
            d_in_nc=net_d.get("in_nc", 9), d_nf=net_d.get("nf", 64),
            d_n_layers=net_d.get("n_layers", 2),
            lr_g=train.get("lr_G", 1e-4), lr_d=train.get("lr_D", 1e-4),
            beta1_g=train.get("beta1_G", 0.9), beta1_d=train.get("beta1_D", 0.9),
            lr_steps=tuple(int(m) for m in (train.get("lr_steps") or (35000, 80000, 100000, 150000))),
            lr_gamma=train.get("lr_gamma", 0.5),
            fs=train.get("fs", "wavelet"),
            fs_kernel_size=train.get("fs_kernel_size", 5) or 5,
            norm=bool(train.get("norm", True)),
            sup_LL=bool(train.get("sup_LL", True)),
            pixel_weight=train.get("pixel_weight", 1.0),
            pixel_LL_weight=train.get("pixel_LL_weight", 1.0),
            pixel_criterion=train.get("pixel_criterion", "l1"),
            feature_criterion=train.get("feature_criterion", "LPIPS"),
            feature_weight=train.get("feature_weight", 1.0),
            gan_type=train.get("gan_type", "vanilla"),
            ragan=bool(train.get("ragan", False)),
            gan_H_target=train.get("gan_H_target", 0.005),
            gan_H_source=train.get("gan_H_source", 0.0) or 0.0,
            multiweights=bool(opt.get("multiweights", True)),
            g_update_inter=train.get("G_update_inter", 1) or 1,
            d_update_inter=train.get("D_update_inter", 1) or 1,
            seed=int(train.get("manual_seed", 0) or 0),
            dtype=jnp.bfloat16 if opt.get("bf16", True) else None,
        )
        lpips_vars = _default_lpips_variables(opt)
        # Build G through define_G so network_G's opt-in exact rewrites
        # (scan_blocks / fused_tail, same param tree — see nn/generators.py)
        # reach the TRAINING step too, not just inference facades.
        self.trainer = SRNTrainer(
            cfg, lpips_variables=lpips_vars, mesh=mesh, g_model=define_G(opt)
        )
        self.state = None
        self._jit_apply = None

    def init(self, key=None, lr_size: int = 32):
        key = key if key is not None else jax.random.key(
            (self.opt.get("train") or {}).get("manual_seed", 0) or 0
        )
        self.state = self.trainer.init_state(key, lr_size=lr_size)
        return self

    def load(self):
        paths = self.opt.get("path") or {}
        path = paths.get("pretrain_model_G")
        if path:
            if path.endswith(".pth"):
                params = checkpoints.import_rrdbnet_params(
                    path, nb=(self.opt.get("network_G") or {}).get("nb", 23)
                )
                self.state = self.state.replace(g=self.state.g.replace(params=params))
            else:
                restored, _ = checkpoints.restore_checkpoint(path, self.state)
                self.state = restored
        # reference *_D_target/_D_source.pth (NLayer patch D) — check_resume
        # writes these paths (options.py:107-122); base_model loads them in
        # DASR_model.py:153-158
        n_layers = self.trainer.cfg.d_n_layers
        for key, attr in (
            ("pretrain_model_D_target", "d_target"),
            ("pretrain_model_D_source", "d_source"),
        ):
            dpath = paths.get(key)
            if dpath and dpath.endswith(".pth") and getattr(self.state, attr) is not None:
                dparams = checkpoints.import_nlayer_d_params(dpath, n_layers=n_layers)
                net = getattr(self.state, attr).replace(params=dparams)
                self.state = self.state.replace(**{attr: net})
        # reference {iter}.state: optimizers [G, D_target, (D_source)] + iter
        rstate = paths.get("resume_state")
        if rstate and rstate.endswith(".state"):
            self.resume_reference_state(rstate)
        return self

    def resume_reference_state(self, path: str):
        """Resume mid-flight from a reference ``{iter}.state`` torch pickle
        (base_model.py:76-86): restores Adam moments/steps for G, D_target
        and (when configured) D_source, plus the iteration counter."""
        st = checkpoints.load_reference_training_state(path)
        opts = list(st.get("optimizers", []))
        nb = (self.opt.get("network_G") or {}).get("nb", 23)
        gmap = checkpoints.rrdbnet_key_map(nb)
        dmap = checkpoints.nlayer_d_key_map(self.trainer.cfg.d_n_layers)
        nets = [("g", gmap), ("d_target", dmap), ("d_source", dmap)]
        for (attr, kmap), osd in zip(nets, opts):
            net = getattr(self.state, attr)
            if net is None:
                continue
            tx = self.trainer.tx_g if attr == "g" else self.trainer.tx_d
            new_opt = checkpoints.import_adam_state(
                osd, kmap, net.params, net.opt_state
            )
            self.state = self.state.replace(
                **{attr: net.replace(opt_state=new_opt)}
            )
        self.state = self.state.replace(step=int(st.get("iter", 0)))
        return int(st.get("iter", 0))

    def save_reference_formats(self, out_dir: str, iter_step: int):
        """Write reference-layout ``{iter}_{G,D_target,D_source}.pth`` +
        ``{iter}.state`` so the reference tooling (test.py, net_interp,
        resume) can consume this framework's training runs."""
        os.makedirs(out_dir, exist_ok=True)
        nb = (self.opt.get("network_G") or {}).get("nb", 23)
        gmap = checkpoints.rrdbnet_key_map(nb)
        dmap = checkpoints.nlayer_d_key_map(self.trainer.cfg.d_n_layers)
        checkpoints.save_reference_g_pth(
            os.path.join(out_dir, f"{iter_step}_G.pth"), self.state.g.params, nb=nb
        )
        opt_sds = [
            checkpoints.export_adam_state(self.state.g.opt_state, gmap, self.state.g.params)
        ]
        import torch

        for attr, label in (("d_target", "D_target"), ("d_source", "D_source")):
            net = getattr(self.state, attr)
            if net is None:
                continue
            sd = checkpoints.export_params_to_state_dict(net.params, dmap)
            torch.save(sd, os.path.join(out_dir, f"{iter_step}_{label}.pth"))
            opt_sds.append(
                checkpoints.export_adam_state(net.opt_state, dmap, net.params)
            )
        checkpoints.save_reference_training_state(
            os.path.join(out_dir, f"{iter_step}.state"),
            epoch=0, it=iter_step, optimizer_sds=opt_sds,
        )
        return out_dir

    def _apply_g(self, x):
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.trainer.g_model.apply)
        return self._jit_apply(self.state.g.params, x)

    def test(self, lr_img: np.ndarray) -> np.ndarray:
        return self._infer(lr_img)

    def train_step(self, batch):
        c = self.trainer.cfg
        step = int(self.state.step)
        do_g = (step % c.g_update_inter) == 0
        do_d = (step % c.d_update_inter) == 0
        dev_batch = _device_put_packed(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        )
        self.state, metrics = self.trainer.train_step(
            self.state, dev_batch, do_g=do_g, do_d=do_d
        )
        return _metrics_to_host(metrics)

    @property
    def supports_multi_step(self) -> bool:
        """Multi-step scanning requires unconditional G+D updates (the DASR
        default G_update_inter = D_update_inter = 1)."""
        c = self.trainer.cfg
        return c.g_update_inter == 1 and c.d_update_inter == 1

    def train_multi_step(self, batches):
        """K steps in one device dispatch (see SRNTrainer.train_multi_step).
        ``batches``: list of K host batches; returns mean metrics over K."""
        return self.metrics_to_host(self.train_multi_step_async(batches))

    def train_multi_step_async(self, batches):
        """Dispatch K steps and return the DEVICE metrics ((K,) arrays)
        WITHOUT fencing — read them later with ``metrics_to_host`` so the
        next dispatch overlaps this call's execution on the device."""
        keys = [k for k in batches[0] if isinstance(batches[0][k], np.ndarray)]
        stacked = _device_put_packed(
            {k: np.stack([b[k] for b in batches]) for k in keys}
        )
        self.state, metrics = self.trainer.train_multi_step(self.state, stacked)
        return metrics

    @staticmethod
    def metrics_to_host(metrics):
        return _metrics_to_host(metrics, reduce_mean=True)

    def save(self, ckpt_dir: str, iter_step: int):
        checkpoints.save_checkpoint(ckpt_dir, self.state, iter_step)

    def resume(self, ckpt_dir: str):
        self.state, step = checkpoints.restore_checkpoint(ckpt_dir, self.state)
        return step


class SRGANModel(SRModel):
    """'srgan' / 'srragan' — ESRGAN-recipe GAN trainers.

    No ``supports_multi_step``: the SRGAN recipe gates the G update on
    ``step % d_update_ratio == 0 and step > d_init_iters`` per step
    (reference: SRGAN_model.py), which a fixed-do_g scan can't reproduce;
    the trainer-level ``SRGANTrainer.train_multi_step`` exists for API
    users who run past the init window with ratio 1."""

    def __init__(self, opt: Dict, ragan: bool = False, mesh=None):
        from dasr_tpu.train.srgan_trainer import SRGANConfig, SRGANTrainer

        self.opt = opt
        train = opt.get("train") or {}
        net_g = opt.get("network_G") or {}
        net_d = opt.get("network_D") or {}
        cfg = SRGANConfig(
            scale=opt.get("scale", 4),
            nf=net_g.get("nf", 64), nb=net_g.get("nb", 23), gc=net_g.get("gc", 32),
            d_input_size=int(
                (opt.get("datasets") or {}).get("train", {}).get("HR_size", 128) or 128
            ),
            d_nf=net_d.get("nf", 64),
            lr_g=train.get("lr_G", 1e-4), lr_d=train.get("lr_D", 1e-4),
            beta1_g=train.get("beta1_G", 0.9), beta1_d=train.get("beta1_D", 0.9),
            lr_steps=tuple(int(m) for m in (train.get("lr_steps") or ())),
            lr_gamma=train.get("lr_gamma", 0.5),
            pixel_criterion=train.get("pixel_criterion", "l1"),
            pixel_weight=train.get("pixel_weight", 1e-2) or 0.0,
            feature_criterion=train.get("feature_criterion", "l1"),
            feature_weight=train.get("feature_weight", 1.0) or 0.0,
            gan_type=train.get("gan_type", "vanilla"),
            gan_weight=train.get("gan_weight", 5e-3),
            ragan=ragan or bool(train.get("ragan", False)),
            d_update_ratio=train.get("D_update_ratio", 1) or 1,
            d_init_iters=train.get("D_init_iters", 0) or 0,
            dtype=jnp.bfloat16 if opt.get("bf16", True) else None,
        )
        # define_G honors network_G's opt-in exact rewrites
        # (scan_blocks / fused_tail) in the training generator too
        self.trainer = SRGANTrainer(cfg, mesh=mesh, g_model=define_G(opt))
        self.state = None
        self._jit_apply = None

    def init(self, key=None, lr_size: int = 32):
        key = key if key is not None else jax.random.key(0)
        self.state = self.trainer.init_state(key, lr_size=lr_size)
        return self

    def load(self):
        path = (self.opt.get("path") or {}).get("pretrain_model_G")
        if path and path.endswith(".pth"):
            params = checkpoints.import_rrdbnet_params(
                path, nb=(self.opt.get("network_G") or {}).get("nb", 23)
            )
            self.state = self.state.replace(g=self.state.g.replace(params=params))
        elif path:
            restored, _ = checkpoints.restore_checkpoint(path, self.state)
            self.state = restored
        return self

    def _apply_g(self, x):
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.trainer.g_model.apply)
        return self._jit_apply(self.state.g.params, x)

    def train_step(self, batch):
        c = self.trainer.cfg
        step = int(self.state.step)
        do_g = (step % c.d_update_ratio) == 0 and step > c.d_init_iters
        dev = _device_put_packed(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        )
        self.state, metrics = self.trainer.train_step(self.state, dev, do_g=do_g)
        return _metrics_to_host(metrics)

    def save(self, ckpt_dir: str, iter_step: int):
        checkpoints.save_checkpoint(ckpt_dir, self.state, iter_step)

    def resume(self, ckpt_dir: str):
        self.state, step = checkpoints.restore_checkpoint(ckpt_dir, self.state)
        return step


class DegradationModel(_InferenceMixin):
    """'De_Resnet' — supervised HR->LR trainer."""

    def __init__(self, opt: Dict):
        from dasr_tpu.train.degradation_trainer import (
            DegradationConfig,
            DegradationTrainer,
        )

        self.opt = opt
        train = opt.get("train") or {}
        net_g = opt.get("network_G") or {}
        cfg = DegradationConfig(
            scale=opt.get("scale", 4),
            nb=net_g.get("nb", 8),
            lr_g=train.get("lr_G", 1e-4),
            beta1_g=train.get("beta1_G", 0.9),
            lr_steps=tuple(int(m) for m in (train.get("lr_steps") or ())),
            lr_gamma=train.get("lr_gamma", 0.5),
            pixel_criterion=train.get("pixel_criterion", "l1"),
            pixel_weight=train.get("pixel_weight", 1.0),
            dtype=jnp.bfloat16 if opt.get("bf16", True) else None,
        )
        # generator from the factory so De_Resnet/De_RRDB configs build the
        # SRN arch.De_Resnet family (networks.py:106-127), not the DSN net
        self.trainer = DegradationTrainer(cfg, g_model=define_G(opt))
        self.state = None
        self._jit_apply = None

    def init(self, key=None, lr_size: int = 32):
        key = key if key is not None else jax.random.key(0)
        self.state = self.trainer.init_state(
            key, hr_size=lr_size * self.opt.get("scale", 4)
        )
        return self

    def load(self):
        return self

    def _apply_g(self, x):
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.trainer.g_model.apply)
        return self._jit_apply(self.state.params, x)

    def test(self, hr_img: np.ndarray) -> np.ndarray:
        return np.asarray(self._apply_g(jnp.asarray(hr_img)[None])[0])

    def train_step(self, batch):
        dev = _device_put_packed(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        )
        self.state, metrics = self.trainer.train_step(self.state, dev)
        return _metrics_to_host(metrics)

    def save(self, ckpt_dir: str, iter_step: int):
        checkpoints.save_checkpoint(ckpt_dir, {"g": self.state.params}, iter_step)


class DASRAdaptiveModel(_InferenceMixin, _BankedTrainMixin):
    """'DASR_Adaptive_Model' — online-DDM DASR variant."""

    chop_threshold = 320000  # DASR_Adaptive_model.py chop gate

    def __init__(self, opt: Dict, mesh=None):
        from dasr_tpu.train.dasr_adaptive_trainer import (
            AdaptiveConfig,
            DASRAdaptiveTrainer,
        )

        self.opt = opt
        train = opt.get("train") or {}
        net_g = opt.get("network_G") or {}
        net_d = opt.get("network_D") or {}
        net_pd = opt.get("network_patchD") or {}
        cfg = AdaptiveConfig(
            scale=opt.get("scale", 4),
            nf=net_g.get("nf", 64), nb=net_g.get("nb", 23), gc=net_g.get("gc", 32),
            nb_ada=net_g.get("ada_nb", 1) or 1,
            concat=(net_g.get("which_model_G") == "RRDB_Residual_conv_concat"),
            d_in_nc=net_d.get("in_nc", 9), d_nf=net_d.get("nf", 64),
            d_n_layers=net_d.get("n_layers", 2),
            lr_g=train.get("lr_G", 1e-4), lr_d=train.get("lr_D", 1e-4),
            beta1_g=train.get("beta1_G", 0.9), beta1_d=train.get("beta1_D", 0.9),
            lr_steps=tuple(int(m) for m in (train.get("lr_steps") or (35000,))),
            lr_gamma=train.get("lr_gamma", 0.5),
            fs=train.get("fs", "wavelet"),
            norm=bool(train.get("norm", True)),
            sup_LL=bool(train.get("sup_LL", True)),
            pixel_weight=train.get("pixel_weight", 1.0),
            pixel_LL_weight=train.get("pixel_LL_weight", 1.0),
            feature_criterion=train.get("feature_criterion", "LPIPS"),
            feature_weight=train.get("feature_weight", 1.0),
            gan_type=train.get("gan_type", "vanilla"),
            ragan=bool(train.get("ragan", False)),
            gan_H_target=train.get("gan_H_target", 0.005),
            use_domain_distance_map=bool(opt.get("adaptive_weights", True)),
            use_patchD_opt=bool(train.get("use_patchD_opt", False)),
            patchd_fs_type=net_pd.get("FS_type", "avg_pool") or "avg_pool",
            patchd_kernel_size=net_pd.get("kernel_size", 5) or 5,
            patchd_norm_layer=net_pd.get("norm_layer", "Instance") or "Instance",
            seed=int(train.get("manual_seed", 0) or 0),
            dtype=jnp.bfloat16 if opt.get("bf16", True) else None,
        )
        patchd_variables = None
        patchd_path = (opt.get("path") or {}).get("pretrain_model_patchD")
        if patchd_path and patchd_path.endswith(".tar"):
            ckpt = checkpoints.load_dsn_tar(patchd_path)
            patchd_variables = checkpoints.import_fsd_discriminator_params(
                ckpt.get("models_d_state_dict", ckpt), norm_layer=cfg.patchd_norm_layer
            )
        self.trainer = DASRAdaptiveTrainer(
            cfg, lpips_variables=_default_lpips_variables(opt), mesh=mesh,
            patchd_variables=patchd_variables,
        )
        self.state = None
        self._jit_sr = None

    def init(self, key=None, lr_size: int = 32):
        key = key if key is not None else jax.random.key(0)
        self.state = self.trainer.init_state(key, lr_size=lr_size)
        return self

    def load(self):
        return self

    def _apply_g(self, x):
        if self._jit_sr is None:
            self._jit_sr = jax.jit(
                lambda gp, pp, v: self.trainer.sr(gp, v, patchd_params=pp)
            )
        return self._jit_sr(self.state.base.g.params, self.state.patchd.params, x)

    def test(self, lr_img: np.ndarray) -> np.ndarray:
        return self._infer(lr_img)

    def train_step(self, batch):
        dev = _device_put_packed(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        )
        self.state, metrics = self.trainer.train_step(self.state, dev)
        return _metrics_to_host(metrics)

    @property
    def supports_multi_step(self) -> bool:
        return True  # the Adaptive step has no per-step gating

    def train_multi_step(self, batches):
        return self.metrics_to_host(self.train_multi_step_async(batches))

    def train_multi_step_async(self, batches):
        keys = [k for k in batches[0] if isinstance(batches[0][k], np.ndarray)]
        stacked = _device_put_packed(
            {k: np.stack([b[k] for b in batches]) for k in keys}
        )
        self.state, metrics = self.trainer.train_multi_step(self.state, stacked)
        return metrics

    @staticmethod
    def metrics_to_host(metrics):
        return _metrics_to_host(metrics, reduce_mean=True)

    def save(self, ckpt_dir: str, iter_step: int):
        checkpoints.save_checkpoint(ckpt_dir, self.state, iter_step)

    def resume(self, ckpt_dir: str):
        self.state, step = checkpoints.restore_checkpoint(ckpt_dir, self.state)
        return step


def _default_lpips_variables(opt=None):
    """LPIPS variables: bundled lin heads if mounted, plus a user-supplied
    torchvision backbone (config ``path.lpips_backbone`` or the
    ``DASR_TPU_LPIPS_BACKBONE`` env var) — random-init backbone otherwise
    (documented delta; no egress in this environment)."""
    backbone = ((opt or {}).get("path") or {}).get("lpips_backbone")
    return default_lpips_variables("alex", backbone_path=backbone)


class DePatchModel(_InferenceMixin):
    """'De_patch_wavelet_GAN' — HR->LR GAN with wavelet-split losses."""

    def __init__(self, opt: Dict):
        from dasr_tpu.train.depatch_trainer import DePatchConfig, DePatchTrainer

        self.opt = opt
        train = opt.get("train") or {}
        net_g = opt.get("network_G") or {}
        cfg = DePatchConfig(
            scale=opt.get("scale", 4),
            nb=net_g.get("nb", 8),
            lr_g=train.get("lr_G", 1e-4), lr_d=train.get("lr_D", 1e-4),
            beta1_g=train.get("beta1_G", 0.9), beta1_d=train.get("beta1_D", 0.9),
            lr_steps=tuple(int(m) for m in (train.get("lr_steps") or (100000,))),
            lr_gamma=train.get("lr_gamma", 0.5),
            norm=bool(train.get("norm", True)),
            pixel_criterion=train.get("pixel_criterion", "l1"),
            pixel_weight=train.get("pixel_weight", 1.0) or 0.0,
            feature_criterion=train.get("feature_criterion", "LPIPS"),
            feature_weight=train.get("feature_weight", 1.0) or 0.0,
            gan_weight=train.get("gan_weight", 0.005) or 0.005,
            ragan=bool(train.get("ragan", False)),
            dtype=jnp.bfloat16 if opt.get("bf16", True) else None,
        )
        self.trainer = DePatchTrainer(
            cfg, lpips_variables=_default_lpips_variables(opt), g_model=define_G(opt)
        )
        self.state = None
        self._jit_apply = None

    def init(self, key=None, lr_size: int = 32):
        key = key if key is not None else jax.random.key(0)
        self.state = self.trainer.init_state(
            key, hr_size=lr_size * self.opt.get("scale", 4)
        )
        return self

    def load(self):
        return self

    def _apply_g(self, x):
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.trainer.g_model.apply)
        return self._jit_apply(self.state.g.params, x)

    def test(self, hr_img: np.ndarray) -> np.ndarray:
        return np.asarray(self._apply_g(jnp.asarray(hr_img)[None])[0])

    def realness_map(self, lr_img: np.ndarray) -> np.ndarray:
        return np.asarray(
            self.trainer.realness_map(self.state.d_target.params, jnp.asarray(lr_img)[None])[0]
        )

    def train_step(self, batch):
        dev = _device_put_packed(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        )
        self.state, metrics = self.trainer.train_step(self.state, dev)
        return _metrics_to_host(metrics)

    def save(self, ckpt_dir: str, iter_step: int):
        checkpoints.save_checkpoint(ckpt_dir, self.state, iter_step)


def create_model(opt: Dict, mesh=None):
    """Trainer registry (reference: codes/SRN/models/__init__.py:5-26)."""
    model = opt.get("model")
    if model == "sr":
        return SRModel(opt)
    if model == "DASR":
        return DASRModel(opt, mesh=mesh)
    if model == "srgan":
        return SRGANModel(opt, ragan=False, mesh=mesh)
    if model == "srragan":
        return SRGANModel(opt, ragan=True, mesh=mesh)
    if model == "De_Resnet":
        return DegradationModel(opt)
    if model == "De_patch_wavelet_GAN":
        return DePatchModel(opt)
    if model == "DASR_Adaptive_Model":
        return DASRAdaptiveModel(opt, mesh=mesh)
    raise NotImplementedError(f"Model [{model}] not recognized.")
