"""SRN inference/eval CLI — reference-compatible ``python -m
dasr_tpu.cli.srn_test -opt options/test/test_sr.json``.

Mirrors codes/SRN/test.py: loads the commented-JSON options, builds the
model, runs every test dataset, saves SR PNGs under results/<name>/<set>/,
and reports per-image + average PSNR/SSIM (+Y) with scale-px border crop
and optional LPIPS.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to options JSON file.")
    parser.add_argument("--mesh", type=int, default=0,
                        help="fan inference over N devices: with the JSON's "
                             "chop flag the tile batch shards over the mesh "
                             "'data' axis; with --spatial_shard the image's "
                             "H axis is sharded with ICI halo exchange")
    parser.add_argument("--spatial_shard", action="store_true",
                        help="shard each image's H axis over the --mesh "
                             "devices (ppermute halo exchange; exact for "
                             "receptive field <= 20 px, same tolerance as "
                             "the reference's forward_chop shave)")
    parser.add_argument("--device_metrics", action="store_true",
                        help="compute the per-image PSNR/SSIM (+Y) and LPIPS "
                             "on device in one dispatch per image instead of "
                             "~2 s of host f64 work (parity < 1e-3 dB / 1e-4 "
                             "SSIM, tested). Best for SAME-SIZE images: each "
                             "distinct HR shape compiles its own program "
                             "(~2 min over a remote tunnel) — for varied "
                             "sizes add --metrics_pad_bucket. Incompatible "
                             "with --mesh (falls back to host metrics)")
    parser.add_argument("--metrics_pad_bucket", type=int, default=0,
                        help="with --device_metrics: zero-pad each SR/HR "
                             "pair up to a multiple of N so varied-size "
                             "test sets share ONE compiled metrics program "
                             "per bucket (EXACT — masked kernels; LPIPS "
                             "keeps the host path's per-shape program). "
                             "Works with any SR source (plain/chop/mesh)")
    args = parser.parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()

    from dasr_tpu.core.config import dict2str, parse_srn_options
    from dasr_tpu.data.datasets import create_dataset
    from dasr_tpu.data.io import save_img
    from dasr_tpu.eval.evaluate import average, sr_metrics, to_uint8
    from dasr_tpu.models.registry import create_model

    opt = parse_srn_options(args.opt, is_train=False)
    logging.basicConfig(level=logging.INFO, format="%(message)s", stream=sys.stdout)
    logger = logging.getLogger("base")
    logger.info(dict2str(opt))

    model = create_model(opt)
    model.init()
    model.load()
    if args.mesh:
        from dasr_tpu.core import mesh as meshlib

        model.prepare_mesh(
            meshlib.make_mesh(n_data=args.mesh),
            spatial_shard=args.spatial_shard,
        )

    lpips_fn = None
    if opt.get("val_lpips"):
        lpips_fn = _make_lpips()

    averages = {}
    for phase, dataset_opt in sorted((opt.get("datasets") or {}).items()):
        test_set = create_dataset(dataset_opt)
        name = dataset_opt["name"]
        logger.info(f"\nTesting [{name}]...")
        results_root = opt["path"]["results_root"]
        dataset_dir = os.path.join(results_root, name)
        os.makedirs(dataset_dir, exist_ok=True)

        per_image = []

        # opt-in --device_metrics: SRN-protocol metrics in one jitted
        # dispatch per image (shared with srn_train's val_device_metrics;
        # same gating — the chop/pad_bucket/mesh paths keep host metrics)
        dev_fn = None
        bucket_fn = None
        if args.device_metrics and args.metrics_pad_bucket:
            # bucketed metrics run on the readback uint8 images, so they
            # compose with any SR source (plain, chop, pad_bucket, mesh)
            from dasr_tpu.cli.srn_train import _make_dev_val_metrics_bucketed

            bucket_fn = _make_dev_val_metrics_bucketed(opt.get("scale", 4))
        elif (
            args.device_metrics
            and not args.mesh
            and not opt.get("chop")
            and not opt.get("pad_bucket")
        ):
            from dasr_tpu.cli.srn_train import _make_dev_val_metrics

            dev_fn = _make_dev_val_metrics(opt.get("scale", 4), lpips_fn)

        def process(i, data, sr_dev, met_dev=None):
            sr = np.asarray(sr_dev)
            base = os.path.splitext(os.path.basename(data["LR_path"]))[0]
            save_img(sr, os.path.join(dataset_dir, base + ".png"))

            # DePatch realness-map dump (reference: SRN/test.py:44-46,77-79)
            if opt.get("save_RealorFake") and hasattr(model, "realness_map"):
                rmap = model.realness_map(data["LR"])
                np.save(os.path.join(dataset_dir, base + "_ddm"), rmap[None, None])

            if "HR" in data:
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
                    pa, pb, hh, ww = pad_pair_to_bucket(
                        sr8, hr8, args.metrics_pad_bucket
                    )
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
                        to_uint8(sr), to_uint8(data["HR"]), opt.get("scale", 4),
                        lpips_fn,
                    )
                per_image.append(m)
                msg = (
                    f"{i + 1:3d} - {base:25s} PSNR: {m['psnr']:.6f} dB; "
                    f"SSIM: {m['ssim']:.6f}"
                )
                if "psnr_y" in m:
                    msg += f"; PSNR_Y: {m['psnr_y']:.6f} dB; SSIM_Y: {m['ssim_y']:.6f}"
                if "lpips" in m:
                    msg += f"; LPIPS: {m['lpips']:.6f}"
                logger.info(msg)
            else:
                logger.info(f"{i + 1:3d} - {base}")

        # dispatch image i, then drain image i-1: the SR readback + host
        # metrics/PNG overlap the next image's device work
        dispatch = getattr(model, "test_async", model.test)
        inflight = None
        for i in range(len(test_set)):
            data = test_set[i]
            sr_dev = dispatch(data["LR"])
            met_dev = (
                dev_fn(sr_dev, to_uint8(data["HR"]))
                if dev_fn is not None and "HR" in data
                else None
            )
            prev, inflight = inflight, (i, data, sr_dev, met_dev)
            if prev is not None:
                process(*prev)
        if inflight is not None:
            process(*inflight)

        if per_image:
            avg = average(per_image)
            averages[name] = avg
            logger.info(
                f"----Average PSNR/SSIM results for {name}----\n"
                f"\tPSNR: {avg['psnr']:.6f} dB; SSIM: {avg['ssim']:.6f}"
                + (f"; LPIPS: {avg['lpips']:.6f}" if "lpips" in avg else "")
            )
            if "psnr_y" in avg:
                logger.info(
                    f"\tPSNR_Y: {avg['psnr_y']:.6f} dB; SSIM_Y: {avg['ssim_y']:.6f}"
                )
    # per-set averages, for callers (tests, auto_test tooling); the
    # reference's test.py only logs
    return averages


def _make_lpips():
    import jax

    from dasr_tpu.models.registry import _default_lpips_variables
    from dasr_tpu.losses.lpips import LPIPS

    lpips = LPIPS(net="alex")
    variables = _default_lpips_variables()
    fn = jax.jit(lambda a, b: lpips.apply(variables, a, b))

    def compute(a, b):
        return float(np.asarray(fn(a, b))[0, 0, 0, 0])

    compute.raw = fn  # un-fenced device result, for pipelined eval loops
    return compute


if __name__ == "__main__":
    main()
