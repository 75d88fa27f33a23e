"""evaluate CLI: host-vs-device metric parity and identity probes
(reference: codes/DSN/evaluate.py)."""

import os

import numpy as np
import pytest

from dasr_tpu.cli import evaluate
from dasr_tpu.data.io import save_img


@pytest.fixture()
def dirs(tmp_path, rng):
    d_a, d_b = tmp_path / "a", tmp_path / "b"
    d_a.mkdir(), d_b.mkdir()
    for i in range(3):
        x = rng.random((40, 40, 3)).astype(np.float32)
        save_img(x, str(d_a / f"{i}.png"))
        save_img(np.clip(x + 0.05 * rng.standard_normal(x.shape), 0, 1),
                 str(d_b / f"{i}.png"))
    return str(d_a), str(d_b)


def test_evaluate_identity(dirs):
    d_a, _ = dirs
    avg = evaluate.main(["--dir_a", d_a, "--dir_b", d_a, "--no_lpips"])
    assert avg["psnr"] == float("inf")
    assert avg["ssim"] == pytest.approx(1.0)


def test_evaluate_device_metrics_match_host(dirs):
    d_a, d_b = dirs
    host = evaluate.main(["--dir_a", d_a, "--dir_b", d_b, "--no_lpips"])
    dev = evaluate.main(
        ["--dir_a", d_a, "--dir_b", d_b, "--no_lpips", "--device_metrics"]
    )
    assert dev["psnr"] == pytest.approx(host["psnr"], abs=1e-3)
    assert dev["psnr_col"] == pytest.approx(host["psnr_col"], abs=2e-2)
    assert dev["ssim"] == pytest.approx(host["ssim"], abs=1e-4)


def test_evaluate_device_metrics_with_lpips(dirs):
    d_a, d_b = dirs
    host = evaluate.main(["--dir_a", d_a, "--dir_b", d_b])
    dev = evaluate.main(["--dir_a", d_a, "--dir_b", d_b, "--device_metrics"])
    assert dev["lpips"] == pytest.approx(host["lpips"], abs=1e-4)


def test_evaluate_border_crop(dirs, tmp_path, rng):
    d_a, _ = dirs
    # corrupt only the border: border_crop must restore identity metrics
    d_c = tmp_path / "c"
    d_c.mkdir()
    from dasr_tpu.data.io import read_img

    for f in sorted(os.listdir(d_a)):
        img = read_img(os.path.join(d_a, f)).copy()
        img[:2], img[-2:] = rng.random((2, 40, 3)), rng.random((2, 40, 3))
        save_img(img, str(d_c / f))
    avg = evaluate.main(
        ["--dir_a", d_a, "--dir_b", str(d_c), "--no_lpips", "--border_crop", "2"]
    )
    assert avg["psnr"] > 50  # interior identical up to one PNG roundtrip
