"""Directory-vs-directory evaluation CLI (reference: codes/DSN/evaluate.py).

``python -m dasr_tpu.cli.evaluate --dir_a <results> --dir_b <ground truth>``
reports mean PSNR / SSIM / LPIPS over sorted file pairs — the reference's
DSN standalone eval (evaluate.py:22-62), also usable for SRN outputs
(BASELINE config #3).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate two image directories")
    p.add_argument("--dir_a", "--dir_gen", dest="dir_a", required=True)
    p.add_argument("--dir_b", "--dir_gt", dest="dir_b", required=True)
    p.add_argument("--no_lpips", action="store_true")
    p.add_argument("--border_crop", type=int, default=None,
                   help="pixels removed at the border before metrics "
                        "(reference: DSN/evaluate.py:19)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--device_metrics", action="store_true",
                   help="compute PSNR/PSNR_col/SSIM (and LPIPS) on device "
                        "in ONE dispatch per pair (f32; differs from the "
                        "host f64 protocol by < 1e-4 — parity-tested). "
                        "Best for SAME-SIZE pairs: each distinct image shape "
                        "compiles its own program (~2 min each over a remote "
                        "TPU tunnel) — for varied-size dirs add --pad_bucket")
    p.add_argument("--pad_bucket", type=int, default=0,
                   help="with --device_metrics: zero-pad each pair up to a "
                        "multiple of N so varied-size dirs share ONE "
                        "compilation per bucket. EXACT for PSNR/PSNR_col/"
                        "SSIM (masked sums; SSIM's valid window never reads "
                        "padding). LPIPS cannot be masked exactly, so it "
                        "still compiles per distinct shape")
    args = p.parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()

    import numpy as np

    from dasr_tpu.data.io import list_images, read_img
    from dasr_tpu.eval.evaluate import average, to_uint8
    from dasr_tpu.ops.metrics import calculate_psnr, calculate_ssim

    files_a = list_images(args.dir_a)
    files_b = list_images(args.dir_b)
    n = min(len(files_a), len(files_b))
    if args.limit:
        n = min(n, args.limit)

    lpips_fn = None
    if not args.no_lpips:
        from dasr_tpu.cli.srn_test import _make_lpips

        lpips_fn = _make_lpips()

    results = []

    dev_pair_fn = None
    if args.device_metrics:
        import jax
        import jax.numpy as jnp

        from dasr_tpu.ops.metrics import (
            mean_color_device_masked,
            psnr_device,
            psnr_device_masked,
            ssim_device,
            ssim_device_masked,
        )

        @jax.jit
        def dev_pair_fn(a_u8, b_u8):
            """uint8 HWC pair -> stacked [psnr, psnr_col, ssim (, lpips)]."""
            a = a_u8.astype(jnp.float32)[None]
            b = b_u8.astype(jnp.float32)[None]
            vals = [
                psnr_device(a, b, 255.0)[0],
                # PSNR of the per-channel spatial means in [0,1]
                # (reference: DSN/evaluate.py:45 "PSNR_col")
                10.0
                * jnp.log10(
                    1.0
                    / jnp.mean(
                        (jnp.mean(a / 255.0, (1, 2)) - jnp.mean(b / 255.0, (1, 2)))
                        ** 2
                    )
                ),
                ssim_device(a, b)[0],
            ]
            if lpips_fn is not None:
                vals.append(
                    lpips_fn.raw(a / 127.5 - 1.0, b / 127.5 - 1.0).reshape(())
                )
            return jnp.stack(vals)

        @jax.jit
        def dev_bucket_fn(a_u8, b_u8, h, w):
            """Zero-padded uint8 HWC pair + true (h, w) ->
            stacked [psnr, psnr_col, ssim] — one program per bucket."""
            a = a_u8.astype(jnp.float32)[None]
            b = b_u8.astype(jnp.float32)[None]
            mc_a = mean_color_device_masked(a / 255.0, h, w)
            mc_b = mean_color_device_masked(b / 255.0, h, w)
            return jnp.stack([
                psnr_device_masked(a, b, h, w, 255.0)[0],
                10.0 * jnp.log10(1.0 / jnp.mean((mc_a - mc_b) ** 2)),
                ssim_device_masked(a, b, h, w)[0],
            ])

    def drain(entry):
        name, m, lp_dev = entry
        if args.device_metrics:
            lp = None
            if isinstance(lp_dev, tuple):  # bucketed path: (metrics, lpips)
                lp_dev, lp = lp_dev
            vals = np.asarray(lp_dev)  # stacked device metrics
            m = {"psnr": float(vals[0]), "psnr_col": float(vals[1]),
                 "ssim": float(vals[2])}
            if lp is not None:
                m["lpips"] = float(np.asarray(lp))
            elif lpips_fn is not None and vals.shape[0] > 3:
                m["lpips"] = float(vals[3])
        elif lp_dev is not None:
            m["lpips"] = float(np.asarray(lp_dev).reshape(-1)[0])
        results.append(m)
        print(f"{name}: " + ", ".join(f"{k}={v:.4f}" for k, v in m.items()))

    # device work is dispatched for pair i and read back after pair i+1's
    # host work — the fence overlaps the next pair's decode/compute
    inflight = None
    for i in range(n):
        a = to_uint8(read_img(files_a[i]))
        b = to_uint8(read_img(files_b[i]))
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        a, b = a[:h, :w], b[:h, :w]
        if args.border_crop:
            c = args.border_crop
            a, b = a[c:-c, c:-c], b[c:-c, c:-c]
        if args.device_metrics:
            from dasr_tpu.utils.transfer import device_put_packed

            if args.pad_bucket:
                from dasr_tpu.utils.transfer import pad_pair_to_bucket

                pa, pb, hh, ww = pad_pair_to_bucket(a, b, args.pad_bucket)
                up = device_put_packed({"a": pa, "b": pb}, u8_to_f32=False)
                dev = dev_bucket_fn(up["a"], up["b"], hh, ww)
                if lpips_fn is not None:
                    # LPIPS mixes padded pixels through its convs, so it
                    # cannot be bucketed exactly — per-shape program
                    up2 = device_put_packed({"a": a, "b": b}, u8_to_f32=False)
                    lp = lpips_fn.raw(
                        up2["a"].astype(np.float32)[None] / 127.5 - 1.0,
                        up2["b"].astype(np.float32)[None] / 127.5 - 1.0,
                    ).reshape(())
                    dev = (dev, lp)
            else:
                up = device_put_packed({"a": a, "b": b}, u8_to_f32=False)
                dev = dev_pair_fn(up["a"], up["b"])
            m = None
            lp_dev = dev
        else:
            lp_dev = None
            if lpips_fn is not None:
                from dasr_tpu.eval.evaluate import im2tensor_range

                lp_dev = lpips_fn.raw(
                    im2tensor_range(a)[None], im2tensor_range(b)[None]
                )
            # PSNR of the per-channel spatial means in [0,1]
            # (reference: DSN/evaluate.py:45 "PSNR_col")
            mean_a = a.astype(np.float64).mean(axis=(0, 1)) / 255.0
            mean_b = b.astype(np.float64).mean(axis=(0, 1)) / 255.0
            mse_col = float(np.mean((mean_a - mean_b) ** 2))
            psnr_col = (
                float("inf") if mse_col == 0 else 10 * np.log10(1.0 / mse_col)
            )
            m = {
                "psnr": calculate_psnr(a.astype(float), b.astype(float)),
                "psnr_col": psnr_col,
                "ssim": calculate_ssim(a.astype(float), b.astype(float)),
            }
        prev, inflight = inflight, (os.path.basename(files_a[i]), m, lp_dev)
        if prev is not None:
            drain(prev)
    if inflight is not None:
        drain(inflight)

    avg = average(results)
    print("== mean ==")
    for k, v in avg.items():
        print(f"{k}: {v:.6f}")
    return avg


if __name__ == "__main__":
    main()
