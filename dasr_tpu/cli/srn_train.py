"""SRN training CLI — reference-compatible
``python -m dasr_tpu.cli.srn_train -opt options/train/train_DASR.json``
(mirroring codes/SRN/train.py:20-249).

Iteration-based loop: resume, data loaders, ``create_model``, per-step
``train_step`` (LR schedule lives inside the optax chain), periodic
validation (PSNR + LPIPS on uint8 roundtrip, scale-px border crop,
codes/SRN/train.py:174-235) and checkpointing.
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--profile", type=str, default=None,
                        help="directory for a jax.profiler trace of steps 10-20")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="scan K train steps inside one device dispatch "
                             "(amortizes the ~9 ms/step remote-dispatch cost; "
                             "identical math, metrics averaged over K)")
    parser.add_argument("--transfer_uint8", action="store_true",
                        help="ship image tensors to the device as uint8 and "
                             "cast to f32/255 on device (4x less "
                             "host->device traffic; bit-exact for 8-bit "
                             "sources). Same as datasets.train.transfer_uint8.")
    parser.add_argument("--decode_cache_gb", type=float, default=None,
                        help="in-RAM decoded-image cache budget (GiB). "
                             "Random-crop datasets decode a FULL image per "
                             "crop every epoch; on few-core hosts decode "
                             "bounds the step rate (data/io.py). Also via "
                             "DASR_DECODE_CACHE_GB.")
    parser.add_argument("--device_bank", action="store_true",
                        help="upload the whole decoded train corpus (HR + "
                             "fake LR + real LR + DDMs, padded uint8/f32) "
                             "to HBM once and sample crops/augments inside "
                             "the jitted step — per-step wire traffic drops "
                             "to a (K, B) int32 index window. DASR model + "
                             "LRHR_wavelet_unpair_fake_weights_EQ mode "
                             "only; falls back to the host loader when the "
                             "corpus exceeds --device_bank_gb, has images "
                             "smaller than the crop, or the mode/model "
                             "doesn't match.")
    parser.add_argument("--device_bank_gb", type=float, default=12.0,
                        help="HBM budget for --device_bank (padded bytes, "
                             "all four banks)")
    args = parser.parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()

    import numpy as np

    from dasr_tpu.core import mesh as meshlib
    from dasr_tpu.core.config import check_resume, dict2str, parse_srn_options
    from dasr_tpu.data.datasets import create_dataset
    from dasr_tpu.data.io import save_img
    from dasr_tpu.data.pipeline import Loader
    from dasr_tpu.eval.evaluate import sr_metrics, to_uint8
    from dasr_tpu.models.registry import create_model
    from dasr_tpu.utils import guards
    from dasr_tpu.utils.metrics_writer import MetricsWriter

    if args.decode_cache_gb is not None:
        from dasr_tpu.data.io import enable_decode_cache

        enable_decode_cache(args.decode_cache_gb)

    opt = parse_srn_options(args.opt, is_train=True)
    opt = check_resume(opt)
    logging.basicConfig(level=logging.INFO, format="%(message)s", stream=sys.stdout)
    logger = logging.getLogger("base")
    logger.info(dict2str(opt))

    for d in ("experiments_root", "models", "training_state", "val_images", "log"):
        p = opt["path"].get(d)
        if p:
            os.makedirs(p, exist_ok=True)

    train_opt = opt["train"] or {}
    logger_opt = opt["logger"] or {}
    niter = int(train_opt.get("niter", 350000))
    val_freq = int(train_opt.get("val_freq", 2500) or 2500)
    print_freq = int(logger_opt.get("print_freq", 200) or 200)
    save_freq = int(logger_opt.get("save_checkpoint_freq", 2500) or 2500)

    # datasets
    train_loader = None
    val_set = None
    use_bank = False
    bank_dirs = None  # (fake_dir, hr_dir, real_dir, ddm_dir)
    n_train_imgs = steps_per_epoch = 0
    for phase, dataset_opt in (opt.get("datasets") or {}).items():
        if phase == "train":
            if args.transfer_uint8:
                dataset_opt["transfer_uint8"] = True
            train_ds_opt = dataset_opt
            if args.device_bank:
                use_bank, bank_dirs = _bank_gate(
                    opt, dataset_opt, args.device_bank_gb, logger
                )
            if use_bank:
                from dasr_tpu.data.io import list_images

                n_train_imgs = len(list_images(bank_dirs[0]))
                steps_per_epoch = max(
                    1, n_train_imgs // int(dataset_opt.get("batch_size", 6) or 6)
                )
                logger.info(
                    f"Number of train images: {n_train_imgs}, iters per "
                    f"epoch: {steps_per_epoch} (device bank)"
                )
            else:
                train_set = create_dataset(dataset_opt)
                train_loader = Loader(
                    train_set,
                    batch_size=int(dataset_opt.get("batch_size", 6) or 6),
                    shuffle=bool(dataset_opt.get("use_shuffle", True)),
                    num_workers=int(dataset_opt.get("n_workers", 6) or 6),
                    drop_last=True,
                    seed=int(train_opt.get("manual_seed", 0) or 0),
                    # keep >= 2 dispatch windows of batches in flight so the
                    # multi-step path never waits on decode
                    prefetch=max(4, 2 * max(1, int(args.steps_per_call))),
                )
                n_train_imgs = len(train_set)
                steps_per_epoch = len(train_loader)
                logger.info(
                    f"Number of train images: {n_train_imgs}, iters per "
                    f"epoch: {steps_per_epoch}"
                )
        elif phase == "val":
            val_set = create_dataset(dataset_opt)
            logger.info(f"Number of val images: {len(val_set)}")

    assert train_loader is not None or use_bank, "Train dataset is required."

    mesh = meshlib.make_mesh_for_batch(
        int(opt["datasets"]["train"].get("batch_size", 6) or 6)
    )
    # canonical mesh line: tests assert multi-device SPMD actually engaged
    # (make_mesh_for_batch silently degrades to 1 device on non-divisible
    # batch/device counts — VERDICT r3 stretch #8)
    print(f"[mesh] data={mesh.shape[meshlib.DATA_AXIS]} "
          f"spatial={mesh.shape[meshlib.SPATIAL_AXIS]}")
    model = create_model(opt, mesh=mesh)
    lr_size = int(
        (opt["datasets"]["train"].get("HR_size", 128) or 128) // opt.get("scale", 4)
    )
    model.init(lr_size=lr_size)
    model.load()

    start_iter = 0
    if opt["path"].get("resume_state"):
        rstate = opt["path"]["resume_state"]
        if rstate.endswith(".state") and hasattr(model, "resume_reference_state"):
            # reference {iter}.state: Adam moments + iter (base_model.py:76-86)
            start_iter = model.resume_reference_state(rstate)
        else:
            start_iter = model.resume(rstate)
        logger.info(f"Resuming training from iteration: {start_iter}.")

    if use_bank:
        # build + upload the four banks ONCE (decode rides the decode
        # cache; upload is layout-pinned on a single device). Done after
        # resume so a restart doesn't pay the upload twice on failure.
        from dasr_tpu.data.device_bank import build_bank, build_ddm_bank
        from dasr_tpu.data.io import list_images

        fake_dir, hr_dir, real_dir, ddm_dir = bank_dirs
        hr_size = int(train_ds_opt.get("HR_size", 128) or 128)
        scale = int(opt.get("scale", 4))
        fake_h = build_bank(fake_dir, min_size=hr_size // scale)
        hr_h = build_bank(hr_dir, min_size=hr_size)
        real_h = build_bank(real_dir, min_size=hr_size // scale)
        # ddm_dir is None for the Adaptive 'LRHR_unpair' mode (online DDM)
        ddm_h = (
            build_ddm_bank(list_images(ddm_dir), fake_h.sizes)
            if ddm_dir else None
        )
        gib = sum(
            b.data.nbytes for b in (fake_h, hr_h, real_h, ddm_h)
            if b is not None
        ) / 2**30
        model.setup_device_bank(
            fake_h, hr_h, real_h, ddm_h, hr_size,
            use_flip=bool(train_ds_opt.get("use_flip", True)),
            use_rot=bool(train_ds_opt.get("use_rot", True)),
        )
        del fake_h, hr_h, real_h, ddm_h
        print(f"device bank: {gib:.2f} GiB resident")

    # use_tb_logger mirrors scalars to a real TensorBoard event file
    # (reference: SRN/train.py:50-52 writes ../tb_logger/<name>; here the
    # run lives under the experiment root)
    tb_dir = None
    if opt.get("use_tb_logger") and "debug" not in (opt.get("name") or ""):
        tb_dir = os.path.join(opt["path"]["experiments_root"], "tb_logger")
    writer = MetricsWriter(
        os.path.join(opt["path"]["log"], "metrics.jsonl"), tb_dir=tb_dir
    )
    total_epochs = int(math.ceil(niter / max(1, steps_per_epoch)))
    logger.info(f"Total epochs needed: {total_epochs} for iters {niter}")

    current_step = start_iter
    lpips_fn = _maybe_lpips(opt)
    bs = int(opt["datasets"]["train"].get("batch_size", 6) or 6)

    k_steps = max(1, int(args.steps_per_call))
    if k_steps > 1 and not getattr(model, "supports_multi_step", False):
        logger.info(
            "steps_per_call > 1 requires a multi-step-capable model with "
            "G/D_update_inter == 1; falling back to per-step dispatch"
        )
        k_steps = 1

    def crossed(freq):
        # did [current_step - k .. current_step] cross a freq boundary?
        return current_step // freq > (current_step - k) // freq

    def report(step_at, k_at, epoch_at, host_metrics):
        if step_at // print_freq > (step_at - k_at) // print_freq:
            guards.check_finite(host_metrics, step_at)
            msg = f"<epoch:{epoch_at:3d}, iter:{step_at:8,d}> " + ", ".join(
                f"{k.split('/')[-1]}: {v:.4e}" for k, v in host_metrics.items()
            )
            logger.info(msg)
            # imgs = per-STEP effective images (fake+real halves); the
            # writer scales by the step delta itself
            writer.write(step_at, host_metrics, imgs=bs * 2)

    # metrics of dispatch N are read after dispatch N+1 is queued, so the
    # host->device readback fence overlaps device execution (the remote
    # tunnel makes each fence cost ~RTT; BENCH_NOTES.md)
    lagged = None  # (step, k, epoch, device_metrics)
    runahead = 0  # dispatch windows queued since the last readback fence
    can_async = hasattr(model, "train_multi_step_async")

    def flush_lagged():
        nonlocal lagged
        if lagged is not None:
            s, kk, ep, dev_m = lagged
            report(s, kk, ep, model.metrics_to_host(dev_m))
            lagged = None

    pending = []
    for epoch in range(total_epochs):
        if use_bank:
            # drop_last host-loader semantics: steps_per_epoch * bs indices
            # per epoch; per-(seed, epoch) shuffle matches the Loader's
            # stream rule so resume replays the same order. Crops/augments/
            # picks draw from the in-step (manual_seed, iteration) jax PRNG.
            if bool(train_ds_opt.get("use_shuffle", True)):
                perm = np.random.default_rng(
                    (int(train_opt.get("manual_seed", 0) or 0), epoch)
                ).permutation(n_train_imgs).astype(np.int32)
            else:
                perm = np.arange(n_train_imgs, dtype=np.int32)
            source = (
                perm[s * bs:(s + 1) * bs] for s in range(steps_per_epoch)
            )
        else:
            train_loader.set_epoch(epoch)
            source = train_loader
        for batch in source:
            if current_step >= niter:
                break
            if k_steps > 1 or use_bank:
                pending.append(batch)
                if len(pending) < k_steps and current_step + len(pending) < niter:
                    continue
            # profiler window: [start+10, start+20) in step numbers
            if args.profile and current_step < start_iter + 10 <= (
                current_step + max(1, len(pending))
            ):
                profiler_cm = guards.profile(args.profile)
                profiler_cm.__enter__()
            if use_bank:
                k = len(pending)
                dev_metrics = model.train_banked_window_async(
                    np.stack(pending), current_step
                )
                metrics = None
                pending = []
            elif k_steps > 1:
                k = len(pending)
                if can_async:
                    dev_metrics = model.train_multi_step_async(pending)
                    metrics = None
                else:
                    metrics = model.train_multi_step(pending)
                pending = []
            else:
                k = 1
                metrics = model.train_step(batch)
            current_step += k
            if args.profile and current_step - k < start_iter + 20 <= current_step:
                profiler_cm.__exit__(None, None, None)
                logger.info(f"wrote profiler trace to {args.profile}")

            if metrics is not None:
                report(current_step, k, epoch, metrics)
            else:
                prev, lagged = lagged, (current_step, k, epoch, dev_metrics)
                if prev is not None:
                    if prev[0] // print_freq > (prev[0] - prev[1]) // print_freq:
                        # only windows that cross a print boundary pay the
                        # device->host metrics readback (~1 tunnel RTT);
                        # the rest are dropped unread (same print cadence
                        # as report()). Reading back every window fenced
                        # the whole dispatch pipeline to depth 1 —
                        # measured 14.8 -> 28.6 steps/s on the full-size
                        # DASR step when the fence was lifted (BENCH_NOTES
                        # r3 "gated lagged readback").
                        report(
                            prev[0], prev[1], prev[2],
                            model.metrics_to_host(prev[3]),
                        )
                        runahead = 0
                    else:
                        # unread windows let the host run ahead of the
                        # device; bound the queue (inputs stay resident in
                        # HBM until their dispatch runs) with a periodic
                        # fence — if the device is the bottleneck the host
                        # only waits here for work it already queued, so
                        # throughput is unaffected.
                        runahead += 1
                        if runahead >= 32:
                            model.metrics_to_host(prev[3])
                            runahead = 0

            if val_set is not None and crossed(val_freq):
                _validate(
                    model, val_set, opt, current_step, logger, writer, lpips_fn
                )

            tsample_freq = int(opt.get("save_tsamples") or 0)
            if val_set is not None and tsample_freq and crossed(tsample_freq):
                _save_tsamples(model, val_set, opt, current_step, writer)

            if crossed(save_freq):
                logger.info("Saving models and training states.")
                model.save(opt["path"]["training_state"], current_step)
                if logger_opt.get("save_ref_formats") and hasattr(
                    model, "save_reference_formats"
                ):
                    model.save_reference_formats(
                        opt["path"].get("models", opt["path"]["training_state"]),
                        current_step,
                    )
        if current_step >= niter:
            break

    flush_lagged()
    logger.info("Saving the final model.")
    model.save(opt["path"]["training_state"], current_step)
    logger.info("End of training.")


def _bank_gate(opt, dataset_opt, budget_gb, logger):
    """Decide whether --device_bank can serve this run; returns
    ``(use_bank, (fake_dir, hr_dir, real_dir, ddm_dir))``. Falls back to
    the host loader (with a logged reason) when the model/mode/update
    cadence doesn't match, the corpus exceeds the HBM budget, or any image
    is smaller than its crop (the host _rand_crop silently truncates
    there; the bank's fixed-size in-step slices cannot)."""
    from dasr_tpu.data.device_bank import bank_min_hw, bank_nbytes

    def fall(reason):
        # print, not logger: the gate can fire before logging is usable in
        # embedded runs, and the CLI tests assert on captured stdout
        print(f"--device_bank: {reason}; using the host loader")
        return False, None

    # supported (model, dataset mode) pairs: the DASR trainer with
    # precomputed DDMs, and the Adaptive trainer whose 'LRHR_unpair' mode
    # computes weights online (no DDM bank)
    pairs = {
        "DASR": "LRHR_wavelet_unpair_fake_weights_EQ",
        "DASR_Adaptive_Model": "LRHR_unpair",
    }
    model = opt.get("model")
    if model not in pairs:
        return fall(f"model [{model}] has no banked path")
    train = opt.get("train") or {}
    if (train.get("G_update_inter", 1) or 1) != 1 or (
        train.get("D_update_inter", 1) or 1
    ) != 1:
        return fall("G/D_update_inter != 1")
    if dataset_opt.get("mode") != pairs[model]:
        return fall(f"dataset mode [{dataset_opt.get('mode')}] unsupported "
                    f"for model [{model}]")
    needs_ddm = model == "DASR"
    dirs = tuple(
        dataset_opt.get(k)
        for k in ("dataroot_fake_LR", "dataroot_HR", "dataroot_real_LR")
    ) + (
        (dataset_opt.get("dataroot_fake_weights"),) if needs_ddm else (None,)
    )
    if not all(dirs[:3]) or (needs_ddm and not dirs[3]):
        return fall("missing a dataroot (fake_LR/HR/real_LR"
                    + ("/fake_weights)" if needs_ddm else ")"))
    fake_dir, hr_dir, real_dir, _ = dirs
    hr_size = int(dataset_opt.get("HR_size", 128) or 128)
    lr_size = hr_size // int(opt.get("scale", 4))
    if min(bank_min_hw(fake_dir)) < lr_size or min(
        bank_min_hw(real_dir)
    ) < lr_size or min(bank_min_hw(hr_dir)) < hr_size:
        return fall("corpus has images smaller than the crop")
    # padded uint8 banks + (DASR mode) the f32 1-channel DDM bank
    # (resized to the fake-LR sizes at build time: 4/3 of the fake
    # bank's u8 bytes)
    need = (
        bank_nbytes(fake_dir) + bank_nbytes(hr_dir) + bank_nbytes(real_dir)
        + (bank_nbytes(fake_dir) * 4 // 3 if needs_ddm else 0)
    )
    if need > budget_gb * 2**30:
        return fall(
            f"padded corpus needs {need / 2**30:.1f} GiB > budget "
            f"{budget_gb} GiB"
        )
    return True, dirs


def _save_tsamples(model, val_set, opt, step, writer=None):
    """Fixed-image SR + high-frequency dumps (reference: SRN/train.py:124-170):
    the same first val images every time, plus their gaussian high-pass maps,
    for eyeballing texture-GAN progress (mirrored to TensorBoard when the
    reference would, SRN/train.py:163-168)."""
    import jax.numpy as jnp
    import numpy as np

    from dasr_tpu.data.io import save_img
    from dasr_tpu.ops.filters import filter_high

    out_dir = os.path.join(opt["path"]["experiments_root"], "tsamples")
    for i in range(min(2, len(val_set))):
        data = val_set[i]
        sr = model.test(data["LR"])
        hf = np.asarray(filter_high(jnp.asarray(sr)[None], gaussian=True)[0])
        save_img(sr, os.path.join(out_dir, f"{i}_{step}_SR.png"))
        save_img(hf, os.path.join(out_dir, f"{i}_{step}_SR_hf.png"))
        if writer is not None:
            writer.write_image(step, f"tsamples/{i}_SR", np.asarray(sr))
            writer.write_image(step, f"tsamples/{i}_SR_hf", hf)
        if "HR" in data:
            gt_hf = np.asarray(
                filter_high(jnp.asarray(data["HR"])[None], gaussian=True)[0]
            )
            save_img(gt_hf, os.path.join(out_dir, f"{i}_HR_hf.png"))


_dev_val_metrics_cache = {}


def _make_dev_val_metrics(scale, lpips_fn):
    """Jitted SRN-protocol val metrics: f32 [0,1] SR + uint8 HR ->
    stacked [psnr, ssim, psnr_y, ssim_y(, lpips)] in ONE dispatch.

    Replicates eval/evaluate.sr_metrics (uint8 roundtrip, scale-px border
    crop, MATLAB Y channel — SRN/test.py:84-118) on device in f32; deltas
    vs the f64 host protocol are < 1e-3 dB / 1e-4 SSIM (tested in
    tests/test_metrics.py). One compile per distinct image shape (~2 min
    each through a remote tunnel) — best for same-size val sets; the host
    path stays the default. The jitted closure is cached per
    (scale, lpips_fn) so repeated validation passes reuse one trace.
    """
    import jax
    import jax.numpy as jnp

    from dasr_tpu.ops.metrics import psnr_device, ssim_device

    key = (scale, id(lpips_fn))
    if key in _dev_val_metrics_cache:
        return _dev_val_metrics_cache[key]

    @jax.jit
    def fn(sr, hr_u8):
        sr8 = jnp.round(jnp.clip(sr, 0.0, 1.0) * 255.0)
        hr = hr_u8.astype(jnp.float32)
        c = scale
        a = sr8[c:-c, c:-c, :][None]
        b = hr[c:-c, c:-c, :][None]
        # y = rgb_255 @ coef / 255 + 16 (ops/metrics._ycbcr float path).
        # HIGHEST precision: the chip's default matmul precision (~2^-9
        # relative on 255*128-scale values) would eat the <1e-3 dB parity.
        coef = jnp.asarray([65.481, 128.553, 24.966], jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        ay = ((jnp.matmul(sr8, coef, precision=hi)) / 255.0 + 16.0)[
            c:-c, c:-c][None, :, :, None]
        by = ((jnp.matmul(hr, coef, precision=hi)) / 255.0 + 16.0)[
            c:-c, c:-c][None, :, :, None]
        vals = [
            psnr_device(a, b, 255.0)[0],
            ssim_device(a, b)[0],
            psnr_device(ay, by, 255.0)[0],
            ssim_device(ay, by)[0],
        ]
        if lpips_fn is not None:
            vals.append(
                lpips_fn.raw(
                    sr8[None] / 127.5 - 1.0, hr[None] / 127.5 - 1.0
                ).reshape(())
            )
        return jnp.stack(vals)

    _dev_val_metrics_cache[key] = fn
    return fn


def _make_dev_val_metrics_bucketed(scale):
    """Bucketed SRN-protocol metrics: zero-padded uint8 SR/HR pairs + the
    true (h, w) -> stacked [psnr, ssim, psnr_y, ssim_y] with ONE compiled
    program per bucket shape (varied-size test sets; srn_test
    --metrics_pad_bucket). Exact vs the unpadded protocol: the masked
    kernels (ops/metrics.py) never read a padded pixel. LPIPS cannot be
    masked exactly and stays on the caller's per-shape path."""
    import jax
    import jax.numpy as jnp

    from dasr_tpu.ops.metrics import psnr_device_masked, ssim_device_masked

    key = ("bucket", scale)
    if key in _dev_val_metrics_cache:
        return _dev_val_metrics_cache[key]

    @jax.jit
    def fn(sr_u8, hr_u8, h, w):
        sr8 = sr_u8.astype(jnp.float32)
        hr = hr_u8.astype(jnp.float32)
        c = scale
        # static border slice; the padded tail keeps the valid region at
        # origin 0 with extent (h - 2c, w - 2c)
        a = sr8[c:-c, c:-c, :][None]
        b = hr[c:-c, c:-c, :][None]
        hh, ww = h - 2 * c, w - 2 * c
        coef = jnp.asarray([65.481, 128.553, 24.966], jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        ay = ((jnp.matmul(sr8, coef, precision=hi)) / 255.0 + 16.0)[
            c:-c, c:-c][None, :, :, None]
        by = ((jnp.matmul(hr, coef, precision=hi)) / 255.0 + 16.0)[
            c:-c, c:-c][None, :, :, None]
        return jnp.stack([
            psnr_device_masked(a, b, hh, ww, 255.0)[0],
            ssim_device_masked(a, b, hh, ww)[0],
            psnr_device_masked(ay, by, hh, ww, 255.0)[0],
            ssim_device_masked(ay, by, hh, ww)[0],
        ])

    _dev_val_metrics_cache[key] = fn
    return fn


def _validate(model, val_set, opt, step, logger, writer, lpips_fn):
    import numpy as np

    from dasr_tpu.data.io import save_img
    from dasr_tpu.eval.evaluate import average, sr_metrics, to_uint8

    results = []
    # reference validates the FULL val set (codes/SRN/train.py:174-235);
    # max_val_images is an explicit opt-in cap and is logged when active
    cap = opt.get("max_val_images")
    n = min(len(val_set), int(cap)) if cap else len(val_set)
    if n < len(val_set):
        logger.info(
            f"Validating {n}/{len(val_set)} images (max_val_images={cap})"
        )
    img_dir = os.path.join(opt["path"]["val_images"], str(step))

    # opt-in ``"val_metrics_pad_bucket": N`` (with val_device_metrics):
    # bucketed masked metrics on the readback uint8 pair — one compiled
    # program per bucket for varied-size val sets, any SR source
    # (see srn_test --metrics_pad_bucket; LPIPS stays per-shape)
    bucket_n = int(opt.get("val_metrics_pad_bucket") or 0)
    bucket_fn = (
        _make_dev_val_metrics_bucketed(opt.get("scale", 4))
        if (opt.get("val_device_metrics") and bucket_n)
        else None
    )

    def drain(data, sr_dev, met_dev=None):
        sr = np.asarray(sr_dev)
        if met_dev is not None:
            v = np.asarray(met_dev)
            m = {"psnr": float(v[0]), "ssim": float(v[1]),
                 "psnr_y": float(v[2]), "ssim_y": float(v[3])}
            if lpips_fn is not None:
                m["lpips"] = float(v[4])
        elif bucket_fn is not None:
            from dasr_tpu.eval.evaluate import im2tensor_range
            from dasr_tpu.utils.transfer import (
                device_put_packed,
                pad_pair_to_bucket,
            )

            sr8, hr8 = to_uint8(sr), to_uint8(data["HR"])
            pa, pb, hh, ww = pad_pair_to_bucket(sr8, hr8, bucket_n)
            up = device_put_packed({"a": pa, "b": pb}, u8_to_f32=False)
            v = np.asarray(bucket_fn(up["a"], up["b"], hh, ww))
            m = {"psnr": float(v[0]), "ssim": float(v[1]),
                 "psnr_y": float(v[2]), "ssim_y": float(v[3])}
            if lpips_fn is not None:
                m["lpips"] = float(
                    lpips_fn(im2tensor_range(sr8)[None],
                             im2tensor_range(hr8)[None])
                )
        else:
            m = sr_metrics(
                to_uint8(sr), to_uint8(data["HR"]), opt.get("scale", 4), lpips_fn
            )
        results.append(m)
        base = os.path.splitext(os.path.basename(data["HR_path"]))[0]
        save_img(sr, os.path.join(img_dir, f"{base}_{step}.png"))

    # Batched dispatch (opt-in ``"val_batch": K`` in the config):
    # consecutive same-shape val images share one plain forward;
    # protocol/metrics stay per-image (exactness-tested in
    # tests/test_trainers_registry.py). Chunk i+1's dispatch overlaps
    # chunk i's readback; items load lazily so ~2 chunks are resident.
    # Default 1: measured on DIV2K-size val (255x169 LR, BENCH_NOTES r3)
    # the batch-4 forward is slower than 4 pipelined singles (odd-size
    # XLA tiling + host-side PSNR/SSIM dominating) and pays an extra
    # first-shape compile — batching only wins for genuinely small val
    # images (Set5-scale) where per-dispatch overhead dominates.
    vb = int(opt.get("val_batch") or 1)
    usable = (
        vb > 1
        and not opt.get("chop")
        and not opt.get("pad_bucket")
        and hasattr(model, "test_batch_async")
        and getattr(model, "_mesh", None) is None
    )
    inflight = None
    if usable:
        if opt.get("val_device_metrics") and logger is not None:
            logger.info(
                "val_batch > 1 takes precedence over val_device_metrics: "
                "metrics run on the host f64 path for this validation"
            )
        scale = opt.get("scale", 4)

        def drain_chunk(chunk, sr_dev):
            for j, d in enumerate(chunk):
                lh, lw = d["LR"].shape[0], d["LR"].shape[1]
                # same crop as _infer_dev's per-image return (a no-op
                # slice here: the batch is unpadded same-shape)
                drain(d, sr_dev[j, : scale * lh, : scale * lw])

        def dispatch_chunk(chunk):
            nonlocal inflight
            sr_dev = model.test_batch_async([d["LR"] for d in chunk])
            prev, inflight = inflight, (chunk, sr_dev)
            if prev is not None:
                drain_chunk(*prev)

        cur = []
        for i in range(n):
            data = val_set[i]
            if cur and (
                len(cur) == vb or cur[0]["LR"].shape != data["LR"].shape
            ):
                dispatch_chunk(cur)
                cur = []
            cur.append(data)
        if cur:
            dispatch_chunk(cur)
        if inflight is not None:
            drain_chunk(*inflight)
    else:
        dispatch = getattr(model, "test_async", model.test)
        # opt-in ``"val_device_metrics": true``: PSNR/SSIM (+Y) and LPIPS
        # computed on device in one dispatch per image — the host f64
        # metric path costs ~1 s/image of single-core SSIM/YCbCr work,
        # which at val_freq 2500 over 350k iters is over an hour of val
        # overhead. Same pipelining; PNG saves still happen host-side.
        dev_fn = None
        if (
            opt.get("val_device_metrics")
            and bucket_fn is None  # bucketed path runs inside drain()
            and not opt.get("chop")
            and not opt.get("pad_bucket")
            and getattr(model, "_mesh", None) is None
        ):
            dev_fn = _make_dev_val_metrics(opt.get("scale", 4), lpips_fn)
        for i in range(n):
            data = val_set[i]
            sr_dev = dispatch(data["LR"])
            met_dev = (
                dev_fn(sr_dev, to_uint8(data["HR"])) if dev_fn is not None
                else None
            )
            prev, inflight = inflight, (data, sr_dev, met_dev)
            if prev is not None:
                drain(*prev)
        if inflight is not None:
            drain(*inflight)
    avg = average(results)
    msg = f"# Validation # PSNR: {avg['psnr']:.4e}"
    if "lpips" in avg:
        msg += f", LPIPS: {avg['lpips']:.4e}"
    logger.info(msg)
    writer.write(step, {f"val/{k}": v for k, v in avg.items()})


def _maybe_lpips(opt):
    if not opt.get("val_lpips"):
        return None
    from dasr_tpu.cli.srn_test import _make_lpips

    return _make_lpips()


if __name__ == "__main__":
    main()
