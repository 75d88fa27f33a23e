"""Network interpolation (reference: codes/SRN/scripts/net_interp.py).

Blends a PSNR-oriented and a GAN-oriented generator:
theta = (1-alpha)*theta_PSNR + alpha*theta_GAN — the ESRGAN trick for
trading fidelity vs perceptual quality. Works on torch ``.pth`` state dicts
(via the importer) and on our orbax checkpoints.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def interpolate_params(tree_a, tree_b, alpha: float):
    return jax.tree.map(
        lambda a, b: (1.0 - alpha) * np.asarray(a) + alpha * np.asarray(b),
        tree_a,
        tree_b,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--net_psnr", required=True, help=".pth or orbax dir")
    p.add_argument("--net_gan", required=True)
    p.add_argument("--alpha", type=float, default=0.8)
    p.add_argument("--out", required=True,
                   help="output orbax dir, or a .pth path (reference format)")
    p.add_argument("--nb", type=int, default=23)
    args = p.parse_args(argv)

    from dasr_tpu.train.checkpoints import (
        import_rrdbnet_params,
        restore_checkpoint,
        save_checkpoint,
        save_reference_g_pth,
    )

    def load(path):
        if path.endswith(".pth"):
            return import_rrdbnet_params(path, nb=args.nb)
        restored, _ = restore_checkpoint(path)
        return restored["g"] if "g" in restored else restored

    a = load(args.net_psnr)
    b = load(args.net_gan)
    blended = interpolate_params(a, b, args.alpha)
    if args.out.endswith(".pth"):
        save_reference_g_pth(args.out, blended, nb=args.nb)
    else:
        save_checkpoint(args.out, blended, step=0)
    print(f"wrote interpolated params (alpha={args.alpha}) to {args.out}")


if __name__ == "__main__":
    main()
