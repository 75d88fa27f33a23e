"""cli/parity in-suite smoke: the quality-parity harness runs end-to-end
against a stand-in reference-format generator .pth and a torchvision-format
alexnet backbone, emitting the per-image + mean report and the markdown
artifact. (The full-size executed dry-run lives in tools/parity_dryrun.py /
PARITY.md; this keeps the harness itself under CI.)"""

import os

import numpy as np
import torch

from test_checkpoint_import import _make_rrdb_sd
from test_lpips_pipeline import _make_backbone_sd, _make_lin_sd

from dasr_tpu.cli import parity
from dasr_tpu.data.io import save_img


def test_parity_cli_stand_in(tmp_path, rng):
    nb, nf, gc, scale = 1, 16, 8, 4
    g_path = str(tmp_path / "g.pth")
    torch.save(_make_rrdb_sd(nb, nf, gc), g_path)
    bb_path = str(tmp_path / "alexnet.pth")
    torch.save(_make_backbone_sd(), bb_path)
    lin_path = str(tmp_path / "lin.pth")
    torch.save(_make_lin_sd(), lin_path)

    hr_dir, lr_dir = tmp_path / "hr", tmp_path / "lr"
    hr_dir.mkdir(), lr_dir.mkdir()
    for i in range(2):
        hr = rng.random((48, 48, 3)).astype(np.float32)
        save_img(hr, str(hr_dir / f"{i}.png"))
        save_img(rng.random((12, 12, 3)).astype(np.float32),
                 str(lr_dir / f"{i}.png"))

    report = str(tmp_path / "parity.md")
    avg = parity.main([
        "--g_pth", g_path, "--lpips_backbone", bb_path,
        "--lpips_lin", lin_path,
        "--hr_dir", str(hr_dir), "--lr_dir", str(lr_dir),
        "--scale", str(scale), "--nb", str(nb), "--nf", str(nf),
        "--gc", str(gc), "--out", report,
    ])
    for k in ("psnr", "ssim", "psnr_y", "ssim_y", "lpips"):
        assert k in avg and np.isfinite(avg[k]), k
    text = open(report).read()
    assert "psnr" in text.lower() and "lpips" in text.lower()
