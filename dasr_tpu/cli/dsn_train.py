"""DSN training CLI — reference-compatible flags
(``python -m dasr_tpu.cli.dsn_train --dataset aim2019 --artifacts tdsr ...``,
mirroring codes/DSN/train.py:24-73).

Differences from the reference loop (same behavior, TPU-shaped):
  * the fused jitted G+D step (dasr_tpu.train.dsn_trainer) replaces the
    imperative backward/step pair;
  * data-parallel over all local devices via the ('data','spatial') mesh;
  * orbax checkpoints (full train state) instead of torch ``.tar``;
    ``--checkpoint`` resumes from them, or imports a reference ``.tar``;
  * metrics stream to a JSONL metric log + stdout instead of tensorboardX
    (dasr_tpu.utils.metrics_writer).
"""

from __future__ import annotations

import argparse
import json
import os


def build_argparser():
    p = argparse.ArgumentParser(description="Train Downscaling Models")
    p.add_argument("--upscale_factor", default=4, type=int, choices=[1, 2, 4])
    p.add_argument("--crop_size", default=256, type=int)
    p.add_argument("--crop_size_val", default=256, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--num_workers", default=6, type=int)
    p.add_argument("--num_epochs", default=400, type=int)
    p.add_argument("--num_decay_epochs", default=150, type=int)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--adam_beta_1", default=0.5, type=float)
    p.add_argument("--val_interval", default=5, type=int)
    p.add_argument("--val_random_crop", action="store_true",
                   help="reference-parity behavior: re-crop val images at a "
                        "RANDOM position each pass (DSN/data_loader.py:180). "
                        "DEFAULT here is a deterministic center crop, so val "
                        "PSNR is comparable across epochs but NOT directly "
                        "comparable to reference training logs (PARITY.md "
                        "'Known deltas')")
    p.add_argument("--val_img_interval", default=5, type=int)
    p.add_argument("--save_model_interval", default=5, type=int)
    p.add_argument("--artifacts", default="tdsr", type=str)
    p.add_argument("--dataset", default="df2k", type=str)
    p.add_argument("--flips", action="store_true")
    p.add_argument("--rotations", action="store_true")
    p.add_argument("--num_res_blocks", default=8, type=int)
    p.add_argument("--ragan", action="store_true")
    p.add_argument("--wgan", action="store_true")
    p.add_argument("--no_highpass", dest="highpass", action="store_false")
    p.add_argument("--kernel_size", default=5, type=int)
    p.add_argument("--no_per_loss", dest="use_per_loss", action="store_false")
    p.add_argument("--lpips_rot_flip", action="store_true")
    p.add_argument("--per_type", default="LPIPS", type=str)
    p.add_argument("--lpips_backbone", default=None, type=str,
                   help="torchvision alexnet .pth for the LPIPS perceptual "
                        "loss (also honors DASR_TPU_LPIPS_BACKBONE; "
                        "random-init backbone otherwise — PARITY.md)")
    p.add_argument("--disc_freq", default=1, type=int)
    p.add_argument("--gen_freq", default=1, type=int)
    p.add_argument("--w_col", default=1, type=float)
    p.add_argument("--w_tex", default=0.005, type=float)
    p.add_argument("--w_per", default=0.01, type=float)
    p.add_argument("--checkpoint", default=None, type=str)
    p.add_argument("--save_path", default=None, type=str)
    p.add_argument("--generator", default="DeResnet", type=str)
    p.add_argument("--discriminator", default="FSD", type=str)
    p.add_argument("--filter", default="gau", type=str)
    p.add_argument("--cat_or_sum", default="cat", type=str)
    p.add_argument("--norm_layer", default="Instance", type=str)
    p.add_argument("--steps_per_call", default=1, type=int,
                   help="scan K train steps in one device dispatch "
                        "(requires disc_freq == gen_freq == 1; same math)")
    p.add_argument("--transfer_uint8", action="store_true",
                   help="ship crops to the device as uint8 (4x less traffic; "
                        "cast to f32/255 on device, bit-exact)")
    p.add_argument("--decode_cache_gb", type=float, default=None,
                   help="in-RAM decoded-image cache budget (GiB). Epoch "
                        "loops re-decode the same PNGs every epoch; on "
                        "few-core hosts decode, not the TPU, bounds the "
                        "step rate (data/io.py). Also via "
                        "DASR_DECODE_CACHE_GB.")
    p.add_argument("--device_bicubic", action="store_true",
                   help="compute the MATLAB-bicubic LR target in-step on the "
                        "MXU instead of in host data workers (same resampling "
                        "matrices)")
    p.add_argument("--device_bank", action="store_true",
                   help="hold the whole decoded corpus in device HBM (uint8, "
                        "padded) and sample crops/augments IN-STEP: per-step "
                        "wire traffic drops from ~1.7 MB of crop uploads to "
                        "the dispatch RTT (the step is wire-bound through "
                        "the remote tunnel — BENCH_NOTES r3). Same sampling "
                        "law as the host loader (jax PRNG stream instead of "
                        "numpy). Implies in-step bicubic and the uint8 wire "
                        "form; falls back to the host loader if the padded "
                        "corpus exceeds --device_bank_gb.")
    p.add_argument("--device_bank_gb", type=float, default=12.0,
                   help="HBM budget for --device_bank (decoded uint8, padded "
                        "to the per-dir max size); over budget -> host loader")
    p.add_argument("--packed_trunk", action="store_true",
                   help="DeResnet only: compute the full-HR-res trunk in "
                        "2x2 space-to-depth packed form (4C channels at "
                        "half spatial; ops/packed_trunk.py). Same math and "
                        "parameter tree; needs even crop sizes. Measured "
                        "SLOWER in the full train step (45.2 vs 35.8 "
                        "ms/step, BENCH_NOTES r4) — kept as an exact "
                        "opt-in, default stays plain.")
    p.add_argument("--seed", default=0, type=int,
                   help="run seed: model init, the host shuffle stream, and "
                        "in-step PRNG draws (WGAN-GP mixing, --device_bank "
                        "crops) all derive from it")
    p.add_argument("--no_bf16", dest="bf16", action="store_false",
                   help="run G/D/LPIPS in float32 instead of bfloat16. "
                        "Default is bf16 compute (f32 params/losses) — the "
                        "repo-wide convention the SRN trainers already use; "
                        "measured 51.4 -> 35.8 ms/step on the production "
                        "DSN step (BENCH_NOTES r3)")
    p.add_argument("--no_saving", dest="saving", action="store_false")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--paths_yml", default=None, type=str)
    p.add_argument("--experiments_root", default="../../DSN_experiments", type=str)
    p.add_argument("--source_dir", default=None, type=str)
    p.add_argument("--target_dir", default=None, type=str)
    p.add_argument("--valid_hr_dir", default=None, type=str)
    p.add_argument("--valid_lr_dir", default=None, type=str)
    return p


def main(argv=None):
    opt = build_argparser().parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasr_tpu.core import mesh as meshlib
    from dasr_tpu.core.config import dataset_paths
    from dasr_tpu.data.datasets import DSNTrainDataset, DSNValDataset
    from dasr_tpu.data.pipeline import Loader
    from dasr_tpu.ops.metrics import psnr_device
    from dasr_tpu.train.checkpoints import restore_checkpoint, save_checkpoint
    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer
    from dasr_tpu.train.schedules import dsn_linear_decay
    from dasr_tpu.utils.metrics_writer import MetricsWriter

    if opt.source_dir and opt.target_dir:
        source_dir, target_dir = opt.source_dir, opt.target_dir
        valid_hr, valid_lr = opt.valid_hr_dir, opt.valid_lr_dir
    else:
        paths_yml = opt.paths_yml or os.path.join(
            os.path.dirname(__file__), "..", "..", "paths.yml"
        )
        reg = dataset_paths(paths_yml, opt.dataset, opt.artifacts)
        source_dir, target_dir = reg["source"], reg["target"]
        valid_hr, valid_lr = reg.get("valid_hr"), reg.get("valid_lr")

    if opt.decode_cache_gb is not None:
        from dasr_tpu.data.io import enable_decode_cache

        enable_decode_cache(opt.decode_cache_gb)

    use_bank = False
    if opt.device_bank:
        from dasr_tpu.data.device_bank import (
            bank_min_hw,
            bank_nbytes,
            build_bank,
        )

        crop_eff = opt.crop_size - opt.crop_size % opt.upscale_factor
        need = bank_nbytes(source_dir) + bank_nbytes(target_dir)
        if need > opt.device_bank_gb * 2**30:
            print(
                f"--device_bank: padded corpus needs {need / 2**30:.1f} GiB "
                f"> budget {opt.device_bank_gb} GiB; using the host loader"
            )
        elif (
            min(bank_min_hw(source_dir)) < crop_eff // opt.upscale_factor
            or min(bank_min_hw(target_dir)) < crop_eff
        ):
            # the host loader's _rand_crop silently truncates on images
            # smaller than the crop; the bank's fixed-size in-step slices
            # cannot, so keep that (degenerate) case on the host path
            print(
                f"--device_bank: corpus has images smaller than the "
                f"{crop_eff}px crop; using the host loader"
            )
        else:
            use_bank = True

    loader = None
    clean_bank = noisy_bank = None
    if use_bank:
        crop_eff = opt.crop_size - opt.crop_size % opt.upscale_factor
        noisy_bank_h = build_bank(
            source_dir, min_size=crop_eff // opt.upscale_factor
        )
        clean_bank_h = build_bank(target_dir, min_size=crop_eff)
        n_noisy = int(noisy_bank_h.data.shape[0])
        steps_per_epoch = max(1, n_noisy // opt.batch_size)
    else:
        train_set = DSNTrainDataset(
            source_dir, target_dir, crop_size=opt.crop_size,
            upscale_factor=opt.upscale_factor, flips=opt.flips,
            rotations=opt.rotations,
            transfer_uint8=opt.transfer_uint8, device_bicubic=opt.device_bicubic,
        )
        loader = Loader(
            train_set, batch_size=opt.batch_size, shuffle=True,
            num_workers=opt.num_workers, drop_last=True, seed=opt.seed,
            prefetch=max(4, 2 * max(1, int(opt.steps_per_call))),
        )
        steps_per_epoch = max(1, len(loader))

    mesh = meshlib.make_mesh_for_batch(opt.batch_size)
    # canonical mesh line: tests assert multi-device SPMD actually engaged
    print(f"[mesh] data={mesh.shape[meshlib.DATA_AXIS]} "
          f"spatial={mesh.shape[meshlib.SPATIAL_AXIS]}")
    schedule = dsn_linear_decay(
        opt.learning_rate, opt.num_epochs, opt.num_decay_epochs, steps_per_epoch
    )
    cfg = DSNConfig(
        generator=opt.generator, discriminator=opt.discriminator,
        filter=opt.filter, cat_or_sum=opt.cat_or_sum, norm_layer=opt.norm_layer,
        kernel_size=opt.kernel_size, num_res_blocks=opt.num_res_blocks,
        upscale_factor=opt.upscale_factor, highpass=opt.highpass, wgan=opt.wgan,
        ragan=opt.ragan, w_col=opt.w_col, w_tex=opt.w_tex, w_per=opt.w_per,
        use_per_loss=opt.use_per_loss, per_type=opt.per_type,
        learning_rate=opt.learning_rate, adam_beta_1=opt.adam_beta_1,
        disc_freq=opt.disc_freq, gen_freq=opt.gen_freq,
        seed=opt.seed, packed_trunk=opt.packed_trunk,
        dtype=jnp.bfloat16 if opt.bf16 else None,
    )
    lpips_vars = None
    if opt.use_per_loss and opt.per_type == "LPIPS":
        from dasr_tpu.losses.lpips import default_lpips_variables

        lpips_vars = default_lpips_variables(
            "alex", backbone_path=opt.lpips_backbone
        )
    trainer = DSNTrainer(cfg, mesh=mesh, schedule=schedule,
                         lpips_variables=lpips_vars)
    lr_size = (opt.crop_size - opt.crop_size % opt.upscale_factor) // opt.upscale_factor
    state = trainer.init_state(
        jax.random.key(opt.seed), lr_size=lr_size, hr_size=opt.crop_size
    )

    save_path = os.path.join(opt.experiments_root, opt.save_path or "dsn_run")
    ckpt_dir = os.path.join(save_path, "checkpoints")
    start_epoch = 1
    if opt.checkpoint:
        state, step = restore_checkpoint(opt.checkpoint, state)
        start_epoch = step // steps_per_epoch + 1
        print(f"Continuing training at epoch {start_epoch}")

    # metrics JSONL + a real TensorBoard event file (the reference writes
    # DSN_tb_logger/<save_path>, DSN/train.py:186-191)
    writer = (
        MetricsWriter(
            os.path.join(save_path, "metrics.jsonl"),
            tb_dir=os.path.join(save_path, "tb_logger"),
        )
        if opt.saving
        else None
    )
    if opt.saving:
        os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path, "commandline_args.txt"), "w") as f:
            json.dump(vars(opt), f, indent=2)

    val_set = None
    if valid_hr:
        val_set = DSNValDataset(valid_hr, valid_lr, crop_size=opt.crop_size_val,
                                upscale_factor=opt.upscale_factor,
                                random_crop=opt.val_random_crop)

    k_steps = max(1, int(opt.steps_per_call))
    if k_steps > 1 and (opt.disc_freq != 1 or opt.gen_freq != 1):
        print("steps_per_call > 1 requires disc_freq == gen_freq == 1; "
              "falling back to per-step dispatch")
        k_steps = 1
    if opt.debug:
        k_steps = 1
    bank_freqs = opt.disc_freq != 1 or opt.gen_freq != 1
    if use_bank and bank_freqs:
        # banked windows scan k steps; honor the freqs with k=1 windows
        k_steps = 1

    from dasr_tpu.utils.transfer import device_put_packed, metrics_to_host

    single_device = np.prod(mesh.devices.shape) == 1

    n_data = int(mesh.shape[meshlib.DATA_AXIS])

    banked_step = None
    if use_bank:
        gib = (noisy_bank_h.data.nbytes + clean_bank_h.data.nbytes) / 2**30
        if single_device:
            # layout-pinned jit: entry format == upload format, so XLA
            # cannot insert its per-dispatch whole-bank relayout copy
            # (BENCH_NOTES r4 "device-resident banks")
            from dasr_tpu.data.device_bank import make_banked_step

            banked_step, clean_bank, noisy_bank = make_banked_step(
                trainer, clean_bank_h, noisy_bank_h
            )
        else:
            # mesh path: replicated default-layout copies on each chip
            # (per-dispatch relayout is a known cost here; the AOT format
            # query composes poorly with replicated shardings)
            from dasr_tpu.data.device_bank import ImageBank

            def put_bank(b):
                return ImageBank(
                    data=meshlib.replicate(mesh, b.data),
                    sizes=meshlib.replicate(mesh, b.sizes),
                )

            noisy_bank = put_bank(noisy_bank_h)
            clean_bank = put_bank(clean_bank_h)
        del noisy_bank_h, clean_bank_h
        print(f"device bank: {gib:.2f} GiB resident "
              f"({clean_bank.data.shape[0]} clean / "
              f"{noisy_bank.data.shape[0]} noisy images)")

    def put(tree, stacked=False):
        # one packed upload on a single device (every device_put pays an
        # RTT through the remote tunnel); proper sharded puts on a mesh.
        # uint8 wire-form leaves are cast to f32/255 inside the train step
        # itself, so packed and sharded paths feed identical math.
        if single_device:
            return device_put_packed(tree)
        if stacked:
            return meshlib.shard_stacked_batch(mesh, tree)
        return meshlib.shard_batch(mesh, tree)

    # Metrics of dispatch N are read back only after dispatch N+1 is queued
    # (lagged), and only when N crossed a 50-iter log boundary. Reading the
    # CURRENT dispatch fenced the whole queue — a full drain every 50 iters
    # that left the device idle while the host re-filled the pipeline
    # (measured: the drain cost ~30-40 ms/step of "fence" wall; BENCH_NOTES
    # r3 "DSN lagged readback"). Same gating srn_train ships; print cadence,
    # values and the NaN assert (DSN/train.py:262) are unchanged, one
    # window late. A periodic fence bounds the device-side input queue.
    lagged = None  # (iteration, device_metrics)
    runahead = 0

    def drain_window(window, force=False):
        nonlocal runahead
        it_at, dev_m = window
        boundary = it_at // 50 > (it_at - k_steps) // 50
        if writer and (force or boundary):
            host_metrics = metrics_to_host(dev_m)
            if boundary:
                # NaN guard at the historical 50-iter cadence only (the
                # reference asserts at log time, DSN/train.py:262) — also
                # when the final forced flush happens to land on a
                # boundary. Off-boundary force flushes stay unguarded:
                # sub-50-iter smoke runs (e.g. LPIPS-degenerate tiny
                # crops) were never checked before and must not start
                # failing.
                from dasr_tpu.utils.guards import check_finite

                check_finite(host_metrics, it_at)
            writer.write(it_at, host_metrics)
            runahead = 0
        elif force:
            metrics_to_host(dev_m)  # fence-only (e.g. --no_saving runs)
            runahead = 0
        else:
            runahead += 1
            if runahead >= 32:
                metrics_to_host(dev_m)
                runahead = 0

    def run_banked_window(window_rows):
        """Dispatch one (K', B) banked window; K' = len(window_rows)."""
        nonlocal state, iteration, lagged
        seed_w = iteration  # window start: resume continues the stream
        idx = np.stack(window_rows)
        dev_idx = (
            jax.device_put(idx)
            if single_device
            else meshlib.shard_stacked_batch(mesh, idx)
        )
        iteration += len(window_rows)
        do_d = iteration % opt.disc_freq == 0
        do_g = iteration % opt.gen_freq == 0
        if banked_step is not None:
            state, metrics = banked_step(
                state, dev_idx, seed_w, crop_eff,
                opt.flips, opt.rotations, do_g, do_d,
            )
        else:
            state, metrics = trainer.train_banked_step(
                state, clean_bank, noisy_bank, dev_idx, seed_w, crop_eff,
                flips=opt.flips, rotations=opt.rotations, do_g=do_g, do_d=do_d,
            )
        prev, lagged = lagged, (iteration, metrics)
        if prev is not None:
            drain_window(prev)

    iteration = 0
    pending = []
    for epoch in range(start_epoch, opt.num_epochs + 1):
        if use_bank:
            # drop_last host-loader semantics: steps_per_epoch * batch_size
            # indices per epoch; partial windows carry across epochs like
            # the host path's `pending` (flushed once after training).
            # Per-(seed, epoch) shuffle matches the Loader's stream rule,
            # so resume replays the same epoch order; crops/augments/
            # pairing draw from the in-step (cfg.seed, iteration) jax PRNG
            perm = (
                np.random.default_rng((opt.seed, epoch))
                .permutation(n_noisy)
                .astype(np.int32)
            )
            for s in range(steps_per_epoch):
                pending.append(perm[s * opt.batch_size:(s + 1) * opt.batch_size])
                if len(pending) < k_steps:
                    continue
                rows, pending = pending, []
                run_banked_window(rows)
                if opt.debug:
                    break
        else:
            loader.set_epoch(epoch)
            for batch in loader:
                if k_steps > 1:
                    pending.append(batch)
                    if len(pending) < k_steps:
                        continue
                    stacked = {
                        key: np.stack([b[key] for b in pending])
                        for key in pending[0]
                    }
                    pending = []
                    dev = put(stacked, stacked=True)
                    state, metrics = trainer.train_multi_step(state, dev)
                    iteration += k_steps
                    metrics = {k: v[-1] for k, v in metrics.items()}
                else:
                    iteration += 1
                    dev = put(batch)
                    do_d = iteration % opt.disc_freq == 0
                    do_g = iteration % opt.gen_freq == 0
                    state, metrics = trainer.train_step(state, dev, do_g=do_g, do_d=do_d)
                prev, lagged = lagged, (iteration, metrics)
                if prev is not None:
                    drain_window(prev)
                if opt.debug:
                    break
        if opt.debug:
            opt.val_interval = 1
            opt.save_model_interval = 1

        if val_set is not None and epoch % opt.val_interval == 0:
            # batched: ONE generator call + ONE PSNR readback for the whole
            # val subset (was 16 per-image fences over the tunnel). On a
            # mesh, truncate to a multiple of the data-axis size (a
            # non-divisible leading dim fails the NamedSharding put);
            # replicate if fewer val images than devices.
            count = min(len(val_set), 16)
            if not single_device and count >= n_data:
                count -= count % n_data
            items = [val_set[i] for i in range(count)]
            stacked_val = {
                "input": np.stack([it["input"] for it in items]),
                "bicubic": np.stack([it["bicubic"] for it in items]),
            }
            if single_device or count % n_data == 0:
                dev = put(stacked_val)
            else:
                dev = meshlib.replicate(mesh, stacked_val)
            fake = trainer.generate(state.g.params, dev["input"])
            mean_psnr = float(
                np.mean(np.asarray(psnr_device(fake, dev["bicubic"])))
            )
            if writer:
                writer.write(iteration, {"val/psnr_vs_bicubic": mean_psnr})
            print(f"[epoch {epoch}] val PSNR vs bicubic: {mean_psnr:.3f} dB")

        if (
            opt.saving
            and val_set is not None
            and epoch % opt.val_img_interval == 0
        ):
            # image dumps: [fake | bicubic | high-freq maps] per val image
            # (reference: DSN/train.py:295-354 TB image grids)
            import jax.numpy as jnp

            from dasr_tpu.data.io import save_img
            from dasr_tpu.ops.filters import filter_high

            img_dir = os.path.join(save_path, "val_images", str(epoch))
            for i in range(min(len(val_set), 4)):
                item = val_set[i]
                fake = np.asarray(
                    trainer.generate(state.g.params, item["input"][None])[0]
                )
                hf = np.asarray(
                    filter_high(
                        jnp.asarray(fake)[None],
                        kernel_size=opt.kernel_size,
                        include_pad=False,
                        gaussian=(opt.filter == "gau"),
                    )[0]
                )
                save_img(fake, os.path.join(img_dir, f"{i}_fake.png"))
                save_img(hf, os.path.join(img_dir, f"{i}_fake_hf.png"))
                save_img(item["bicubic"], os.path.join(img_dir, f"{i}_bicubic.png"))
                if writer:
                    writer.write_image(iteration, f"val/{i}_fake", fake)
                    writer.write_image(iteration, f"val/{i}_fake_hf", hf)

        if opt.saving and epoch % opt.save_model_interval == 0:
            save_checkpoint(ckpt_dir, state, iteration)
            print(f"[epoch {epoch}] checkpoint @ iter {iteration}")

        if opt.debug and epoch >= start_epoch + 1:
            break

    if pending:
        # flush the trailing partial scan window (mirrors srn_train's
        # partial flush) — without this up to K-1 batches at the end of
        # training were silently dropped and epoch accounting drifted
        if use_bank:
            rows, pending = pending, []
            run_banked_window(rows)
        else:
            stacked = {
                key: np.stack([b[key] for b in pending]) for key in pending[0]
            }
            n_flush = len(pending)
            pending = []
            state, metrics = trainer.train_multi_step(state, put(stacked, stacked=True))
            iteration += n_flush
            prev, lagged = lagged, (iteration, {k: v[-1] for k, v in metrics.items()})
            if prev is not None:
                drain_window(prev)
    if lagged is not None:
        # final window: always read back (fences training; the flush write
        # keeps the reference's end-of-run metrics line)
        drain_window(lagged, force=True)
        lagged = None

    if opt.saving:
        # always leave a final checkpoint (the reference's last_iteration.tar
        # equivalent) so downstream stages never depend on the save interval
        save_checkpoint(ckpt_dir, state, iteration)
        print(f"[final] checkpoint @ iter {iteration}")


if __name__ == "__main__":
    main()
