"""SFT-GAN inference driver (reference: codes/SRN/test_sftgan.py).

Reads HR images from ``--img_dir``, modcrops to x8, MATLAB-bicubic
downscales x1/4, loads the per-image segmentation probability maps from
``--seg_dir`` (``<base>_bic.pth`` torch tensors, as the reference saves, or
``<base>_bic.npy``), runs SFTNet and writes ``<base>_rlt.png``.

Note: the reference script's shipped ``SFT_Net.forward`` bypasses the SFT
branch entirely (sft_arch.py:76-83 is commented out, and ``conv0`` is
called on a list — a latent crash); here the full documented architecture
runs (see nn/sft.py).
"""

from __future__ import annotations

import argparse
import os


def _load_seg(seg_dir: str, base: str):
    import numpy as np

    pth = os.path.join(seg_dir, base + "_bic.pth")
    npy = os.path.join(seg_dir, base + "_bic.npy")
    if os.path.exists(pth):
        import torch

        seg = torch.load(pth, map_location="cpu", weights_only=False)
        seg = np.asarray(seg.numpy() if hasattr(seg, "numpy") else seg)
    elif os.path.exists(npy):
        seg = np.load(npy)
    else:
        raise FileNotFoundError(f"no seg map for {base} in {seg_dir}")
    if seg.ndim == 4:
        seg = seg[0]
    if seg.shape[0] <= 32 and seg.shape[0] < seg.shape[-1]:  # CHW -> HWC
        seg = np.transpose(seg, (1, 2, 0))
    return seg.astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description="SFT-GAN x4 SR with seg maps")
    p.add_argument("--model", required=True,
                   help="SFTGAN .pth (reference format) or orbax checkpoint dir")
    p.add_argument("--img_dir", required=True, help="HR (or LR) image folder")
    p.add_argument("--seg_dir", required=True,
                   help="segmentation probability maps (<base>_bic.pth/.npy)")
    p.add_argument("--out", required=True)
    p.add_argument("--lr_input", action="store_true",
                   help="treat img_dir as already-LR inputs (no downscale)")
    p.add_argument("--n_blocks", type=int, default=16)
    args = p.parse_args(argv)

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()

    import jax
    import numpy as np

    from dasr_tpu.data.io import list_images, read_img, save_img
    from dasr_tpu.nn.sft import SFTNet
    from dasr_tpu.ops.metrics import modcrop
    from dasr_tpu.ops.resize import imresize_np

    model = SFTNet(n_blocks=args.n_blocks)
    if os.path.isdir(args.model):
        from dasr_tpu.train.checkpoints import restore_checkpoint

        variables, _ = restore_checkpoint(args.model)
    else:
        from dasr_tpu.train.checkpoints import import_sftnet_params

        variables = import_sftnet_params(args.model, n_blocks=args.n_blocks)

    apply = jax.jit(model.apply)
    os.makedirs(args.out, exist_ok=True)
    for idx, path in enumerate(list_images(args.img_dir)):
        base = os.path.splitext(os.path.basename(path))[0]
        print(idx + 1, base)
        img = read_img(path)
        if not args.lr_input:
            img = modcrop(img, 8)
            img = imresize_np(img, 0.25)
        seg = _load_seg(args.seg_dir, base)
        out = apply(variables, img[None], seg[None])
        save_img(
            np.asarray(out[0]), os.path.join(args.out, base + "_rlt.png")
        )
    print("done.")


if __name__ == "__main__":
    main()
