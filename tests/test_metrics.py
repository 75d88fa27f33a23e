"""Metric parity: PSNR closed-form, SSIM identities, YCbCr round trips."""

import jax.numpy as jnp
import numpy as np

from dasr_tpu.ops.metrics import (
    bgr2ycbcr,
    calculate_psnr,
    calculate_ssim,
    modcrop,
    psnr_device,
    rgb2ycbcr,
    ssim_device,
    ycbcr2rgb,
)


def test_psnr_closed_form():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 16.0)  # mse = 256 -> psnr = 20 log10(255/16)
    want = 20 * np.log10(255.0 / 16.0)
    assert abs(calculate_psnr(a, b) - want) < 1e-9
    assert calculate_psnr(a, a) == float("inf")


def test_psnr_device_matches_host(rng):
    a = rng.random((2, 16, 16, 3)) * 255
    b = rng.random((2, 16, 16, 3)) * 255
    got = np.asarray(psnr_device(jnp.asarray(a), jnp.asarray(b), 255.0))
    want = [calculate_psnr(a[i], b[i]) for i in range(2)]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_identity_and_range(rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.float64)
    assert abs(calculate_ssim(img, img) - 1.0) < 1e-9
    noisy = np.clip(img + rng.normal(0, 20, img.shape), 0, 255)
    s = calculate_ssim(img, noisy)
    assert 0 < s < 1.0


def test_ssim_device_matches_host(rng):
    a = (rng.random((1, 24, 24, 3)) * 255).astype(np.float32)
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255).astype(np.float32)
    got = float(ssim_device(jnp.asarray(a), jnp.asarray(b))[0])
    want = calculate_ssim(a[0], b[0])
    assert abs(got - want) < 1e-4


def test_ycbcr_grayscale_fixed_point():
    # Y of mid-gray float 0.5: (0.5*255*(65.481+128.553+24.966)/255 + 16)/255
    g = np.full((4, 4, 3), 0.5, dtype=np.float64)
    y = rgb2ycbcr(g.copy(), only_y=True)
    want = (0.5 * (65.481 + 128.553 + 24.966) + 16) / 255.0
    np.testing.assert_allclose(y, want, atol=1e-6)
    # bgr flips channel order
    yb = bgr2ycbcr(g.copy(), only_y=True)
    np.testing.assert_allclose(yb, want, atol=1e-6)


def test_ycbcr_roundtrip(rng):
    img = rng.random((8, 8, 3)).astype(np.float64) * 0.6 + 0.2
    ycc = rgb2ycbcr(img.copy(), only_y=False)
    back = ycbcr2rgb(ycc.copy())
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_modcrop():
    img = np.zeros((13, 10, 3))
    assert modcrop(img, 4).shape == (12, 8, 3)
    img2 = np.zeros((12, 8))
    assert modcrop(img2, 4).shape == (12, 8)


def test_dev_val_metrics_matches_host_protocol(rng):
    """srn_train ``val_device_metrics``: the jitted device metrics must
    match eval/evaluate.sr_metrics (uint8 roundtrip, border crop, MATLAB
    Y channel) within f32 tolerance."""
    from dasr_tpu.cli.srn_train import _make_dev_val_metrics
    from dasr_tpu.eval.evaluate import sr_metrics, to_uint8

    scale = 4
    sr = rng.random((40, 56, 3)).astype(np.float32)
    hr = np.clip(
        sr + rng.normal(0, 0.03, sr.shape), 0, 1
    ).astype(np.float32)
    hr_u8 = to_uint8(hr)
    want = sr_metrics(to_uint8(sr), hr_u8, scale, None)
    got = np.asarray(_make_dev_val_metrics(scale, None)(jnp.asarray(sr), hr_u8))
    assert abs(got[0] - want["psnr"]) < 1e-3
    assert abs(got[1] - want["ssim"]) < 1e-4
    assert abs(got[2] - want["psnr_y"]) < 1e-3
    assert abs(got[3] - want["ssim_y"]) < 1e-4


def test_dev_val_metrics_bucketed_matches_host_protocol(rng):
    """Bucketed (zero-padded + masked) SRN-protocol metrics equal the host
    f64 protocol at the same tolerances as the unbucketed device path —
    across DIFFERENT true sizes sharing one padded shape (the point of
    --metrics_pad_bucket)."""
    from dasr_tpu.cli.srn_train import _make_dev_val_metrics_bucketed
    from dasr_tpu.eval.evaluate import sr_metrics, to_uint8

    scale = 4
    fn = _make_dev_val_metrics_bucketed(scale)
    for h, w in ((40, 56), (47, 33)):
        sr = rng.random((h, w, 3)).astype(np.float32)
        hr = np.clip(sr + rng.normal(0, 0.03, sr.shape), 0, 1).astype(np.float32)
        sr8, hr8 = to_uint8(sr), to_uint8(hr)
        want = sr_metrics(sr8, hr8, scale, None)
        pa = np.zeros((64, 64, 3), np.uint8)
        pb = np.zeros_like(pa)
        pa[:h, :w], pb[:h, :w] = sr8, hr8
        got = np.asarray(fn(jnp.asarray(pa), jnp.asarray(pb), h, w))
        assert abs(got[0] - want["psnr"]) < 1e-3, (h, w)
        assert abs(got[1] - want["ssim"]) < 1e-4, (h, w)
        assert abs(got[2] - want["psnr_y"]) < 1e-3, (h, w)
        assert abs(got[3] - want["ssim_y"]) < 1e-4, (h, w)


def test_validate_bucketed_config_path(tmp_path, rng):
    """srn_train's ``val_metrics_pad_bucket`` config path: varied-size val
    images through _validate produce the same averages as the host f64
    protocol (and exercise the readback-side bucketed drain)."""
    import logging

    from dasr_tpu.cli.srn_train import _validate
    from dasr_tpu.eval.evaluate import average, sr_metrics, to_uint8

    class StubModel:
        def test(self, lr):  # fake 4x SR: nearest upsample
            return np.repeat(np.repeat(lr, 4, 0), 4, 1)

    val_set = []
    for i, (h, w) in enumerate([(12, 14), (9, 16)]):
        lr = rng.random((h, w, 3)).astype(np.float32)
        hr = rng.random((4 * h, 4 * w, 3)).astype(np.float32)
        val_set.append({"LR": lr, "HR": hr, "HR_path": f"v{i}.png"})

    class Writer:
        def __init__(self):
            self.rows = []

        def write(self, step, d):
            self.rows.append(d)

    logger = logging.getLogger("test_validate_bucketed")
    model = StubModel()

    def run(opt_extra):
        w = Writer()
        opt = {"scale": 4,
               "path": {"val_images": str(tmp_path / "vi")},
               **opt_extra}
        _validate(model, val_set, opt, 1, logger, w, None)
        return w.rows[-1]

    host = run({})
    dev = run({"val_device_metrics": True, "val_metrics_pad_bucket": 32})
    assert abs(dev["val/psnr"] - host["val/psnr"]) < 1e-3
    assert abs(dev["val/ssim"] - host["val/ssim"]) < 1e-4
    assert abs(dev["val/psnr_y"] - host["val/psnr_y"]) < 1e-3
    assert abs(dev["val/ssim_y"] - host["val/ssim_y"]) < 1e-4
