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


def test_evaluate_pad_bucket_varied_sizes(tmp_path, rng):
    """--pad_bucket: varied-size pairs share one compiled program and must
    reproduce the host protocol exactly (masked PSNR/PSNR_col; SSIM's
    valid window never reads padding). LPIPS still runs per shape."""
    d_a, d_b = tmp_path / "a", tmp_path / "b"
    d_a.mkdir(), d_b.mkdir()
    for i, (h, w) in enumerate([(40, 56), (47, 33), (64, 40)]):
        x = rng.random((h, w, 3)).astype(np.float32)
        save_img(x, str(d_a / f"{i}.png"))
        save_img(np.clip(x + 0.05 * rng.standard_normal(x.shape), 0, 1),
                 str(d_b / f"{i}.png"))
    host = evaluate.main(["--dir_a", str(d_a), "--dir_b", str(d_b)])
    dev = evaluate.main(["--dir_a", str(d_a), "--dir_b", str(d_b),
                         "--device_metrics", "--pad_bucket", "32"])
    assert dev["psnr"] == pytest.approx(host["psnr"], abs=1e-3)
    # psnr_col = log of a tiny mean-color MSE: f32 masked sums vs the
    # host's f64 drift ~1e-3 dB at these magnitudes
    assert dev["psnr_col"] == pytest.approx(host["psnr_col"], abs=3e-3)
    assert dev["ssim"] == pytest.approx(host["ssim"], abs=1e-4)
    assert dev["lpips"] == pytest.approx(host["lpips"], abs=1e-4)


def test_masked_device_metrics_equal_unmasked(rng):
    """The masked kernels on zero-padded inputs equal the plain kernels on
    the unpadded image (exactness of the bucketing)."""
    import jax.numpy as jnp

    from dasr_tpu.ops.metrics import (
        mean_color_device_masked,
        psnr_device,
        psnr_device_masked,
        ssim_device,
        ssim_device_masked,
    )

    h, w = 45, 37
    a = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
    b = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
    pa = np.zeros((1, 64, 64, 3), np.float32)
    pb = np.zeros_like(pa)
    pa[:, :h, :w], pb[:, :h, :w] = a, b

    np.testing.assert_allclose(
        np.asarray(psnr_device_masked(jnp.asarray(pa), jnp.asarray(pb), h, w, 255.0)),
        np.asarray(psnr_device(jnp.asarray(a), jnp.asarray(b), 255.0)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ssim_device_masked(jnp.asarray(pa), jnp.asarray(pb), h, w)),
        np.asarray(ssim_device(jnp.asarray(a), jnp.asarray(b))),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mean_color_device_masked(jnp.asarray(pa) / 255.0, h, w)),
        np.asarray(jnp.mean(jnp.asarray(a) / 255.0, axis=(1, 2))),
        rtol=1e-5,
    )
