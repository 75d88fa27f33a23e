"""data/device_bank: device-resident corpus banks and the in-step crop /
augment / pairing sampling law, plus the REAL banked dsn_train CLI on a
2-device mesh (the path the host loader is replaced by when
``--device_bank`` fits the HBM budget)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.data.device_bank import (
    ImageBank,
    bank_nbytes,
    build_bank,
    crop_offsets,
    sample_crops,
    sample_dsn_batch,
)
from dasr_tpu.data.io import save_img


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("bank")
    rng = np.random.default_rng(3)
    dirs = {k: root / k for k in ("source", "target")}
    for d in dirs.values():
        d.mkdir()
    for i in range(4):
        save_img(rng.random((96 + 16 * i, 120, 3)).astype(np.float32),
                 str(dirs["target"] / f"t{i}.png"))
        save_img(rng.random((40, 44 + 4 * i, 3)).astype(np.float32),
                 str(dirs["source"] / f"s{i}.png"))
    return dirs


def test_build_bank_padding_and_sizes(corpus):
    bank = build_bank(str(corpus["target"]))
    assert bank.data.shape == (4, 144, 120, 3) and bank.data.dtype == np.uint8
    np.testing.assert_array_equal(
        bank.sizes, [[96, 120], [112, 120], [128, 120], [144, 120]]
    )
    # padding region is zero; content region is the decoded image
    assert bank.data[0, 96:].sum() == 0 and bank.data[0, :96].any()
    # header-only footprint estimate == decoded padded footprint
    assert bank_nbytes(str(corpus["target"])) == bank.data.nbytes


def test_build_bank_min_size_guard(corpus):
    with pytest.raises(ValueError, match="smaller than the 64px crop"):
        build_bank(str(corpus["source"]), min_size=64)


def test_pinned_put_slab_path_content_and_format():
    """_pinned_put with a tiny slab budget forces the on-device slab build
    (the large-bank path where a direct device_put's explicit layout is
    silently dropped through the tunnel): content must be byte-identical
    (incl. the overlapping tail slab) and the layout must be the pin."""
    from jax.experimental.layout import Format, Layout

    from dasr_tpu.data.device_bank import _pinned_put

    dev = jax.devices()[0]
    fmt = Format(Layout(major_to_minor=(0, 3, 1, 2)),
                 jax.sharding.SingleDeviceSharding(dev))
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (7, 6, 10, 3), np.uint8)
    per_img = x[0].nbytes
    # slab budget of 2 images; 7 % 2 != 0 exercises the overlapped tail
    d = _pinned_put(x, fmt, slab_bytes=2 * per_img)
    assert d.format.layout.major_to_minor == (0, 3, 1, 2)
    np.testing.assert_array_equal(np.asarray(d), x)
    # small array: direct put path
    d2 = _pinned_put(x, fmt)
    np.testing.assert_array_equal(np.asarray(d2), x)
    assert d2.format.layout.major_to_minor == (0, 3, 1, 2)


def test_crop_offsets_law():
    """Uniform over the full valid range [0, dim - crop], inclusive — the
    in-step equivalent of rng.integers(0, dim - crop + 1)."""
    hw = jnp.array([40, 44], jnp.int32)
    offs = jax.vmap(lambda k: crop_offsets(k, hw, 32))(
        jax.random.split(jax.random.key(0), 4000)
    )
    offs = np.asarray(offs)
    assert offs.min() == 0
    assert offs[:, 0].max() == 40 - 32 and offs[:, 1].max() == 44 - 32
    # every offset value reachable, roughly uniform mass
    for col, span in ((0, 9), (1, 13)):
        counts = np.bincount(offs[:, col], minlength=span)
        assert (counts > 0).all()
        assert counts.max() < 3.0 * counts.min()


def test_sample_crops_content_matches_bank():
    """crop == true image size -> the crop IS the image (offsets collapse
    to 0), pinning that slicing addresses the unpadded content even when
    the bank pads other images past it."""
    rng = np.random.default_rng(0)
    img0 = rng.integers(0, 255, (32, 32, 3), np.uint8)
    img1 = rng.integers(0, 255, (48, 40, 3), np.uint8)
    data = np.zeros((2, 48, 40, 3), np.uint8)
    data[0, :32, :32], data[1] = img0, img1
    dev = ImageBank(jnp.asarray(data),
                    jnp.asarray([[32, 32], [48, 40]], np.int32))
    crops = np.asarray(
        sample_crops(dev, jnp.array([0, 0], jnp.int32), jax.random.key(1), 32)
    )
    np.testing.assert_array_equal(crops[0], img0)
    np.testing.assert_array_equal(crops[1], img0)
    # a 32-crop of img1 must come from img1's content (every row real)
    c1 = np.asarray(
        sample_crops(dev, jnp.array([1], jnp.int32), jax.random.key(2), 32)
    )[0]
    # img1 has no zero pixels with probability ~1 - 48*40*3/255 ... not
    # guaranteed; instead check the crop appears in img1 as a sub-window
    found = any(
        np.array_equal(c1, img1[t:t + 32, l:l + 32])
        for t in range(48 - 32 + 1)
        for l in range(40 - 32 + 1)
    )
    assert found


def test_sample_crops_augment_variants():
    """flips/rotations produce exactly the dihedral variants of the image,
    each with ~50% independent probability (host augment semantics,
    datasets.py / SRN data/util.py:116-128)."""
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(1, 4, 4, 3)
    dev = ImageBank(jnp.asarray(img), jnp.asarray([[4, 4]], np.int32))
    idx = jnp.zeros((1,), jnp.int32)
    variants = set()
    n, n_h = 200, 0
    for i in range(n):
        c = np.asarray(
            sample_crops(dev, idx, jax.random.key(i), 4, flips=True,
                         rotations=True)[0]
        )
        # must be one of the 8 dihedral transforms of img
        base = img[0]
        forms = []
        for h in (False, True):
            for v in (False, True):
                for t in (False, True):
                    f = base[:, ::-1] if h else base
                    f = f[::-1] if v else f
                    f = f.transpose(1, 0, 2) if t else f
                    forms.append(f)
        matches = [k for k, f in enumerate(forms) if np.array_equal(c, f)]
        assert matches, "crop is not a dihedral transform of the source"
        variants.add(matches[0])
        if np.array_equal(c[:1], base[:, ::-1][:1]):
            n_h += 1
    assert len(variants) >= 6  # all 8 in expectation; allow tiny-n slack


def test_sample_dsn_batch_shapes_and_pairing():
    # constant-valued clean images: the crop's value IS the picked index
    n_clean = 5
    clean_data = np.stack([
        np.full((64, 64, 3), 10 * i, np.uint8) for i in range(n_clean)
    ])
    clean_d = ImageBank(jnp.asarray(clean_data),
                        jnp.asarray([[64, 64]] * n_clean, np.int32))
    noisy_data = np.stack([
        np.full((20, 20, 3), 100 + i, np.uint8) for i in range(3)
    ])
    noisy_d = ImageBank(jnp.asarray(noisy_data),
                        jnp.asarray([[20, 20]] * 3, np.int32))
    idx = jnp.array([0, 1, 2], jnp.int32)
    batch = sample_dsn_batch(
        clean_d, noisy_d, idx, jax.random.key(0), crop=66, scale=4
    )
    # crop rounds down to a multiple of scale: 66 -> 64, disc = 16
    assert batch["input"].shape == (3, 64, 64, 3)
    assert batch["disc"].shape == (3, 16, 16, 3)
    assert batch["input"].dtype == jnp.uint8
    # disc crops come from THE GIVEN noisy indices, in order
    np.testing.assert_array_equal(
        np.asarray(batch["disc"])[:, 0, 0, 0], [100, 101, 102]
    )
    # clean pick is uniform over the whole clean bank, independent of the
    # noisy index (DSNTrainDataset pairing law, data_loader.py random pair)
    picks = []
    for i in range(400):
        b = sample_dsn_batch(
            clean_d, noisy_d, idx[:1], jax.random.key(i), crop=64, scale=4
        )
        picks.append(int(np.asarray(b["input"])[0, 0, 0, 0]) // 10)
    counts = np.bincount(picks, minlength=n_clean)
    assert (counts > 0).all() and counts.max() < 3.0 * counts.min()


@pytest.mark.slow
def test_banked_cli_runs_multi_device(corpus, tmp_path):
    """Drive the REAL dsn_train CLI with --device_bank on a 2-device data
    mesh (batch 2 on the 8-CPU conftest mesh): banks upload replicated,
    index windows shard over 'data', training completes, metrics and the
    final checkpoint land on disk."""
    from dasr_tpu.cli import dsn_train

    out = tmp_path / "banked"
    dsn_train.main([
        "--source_dir", str(corpus["source"]),
        "--target_dir", str(corpus["target"]),
        "--generator", "DeResnet", "--discriminator", "FSD",
        "--filter", "avg_pool", "--num_res_blocks", "1", "--no_per_loss",
        "--crop_size", "96", "--batch_size", "2",
        "--num_epochs", "2", "--num_decay_epochs", "1",
        "--val_interval", "99", "--save_model_interval", "99",
        "--device_bank", "--steps_per_call", "2", "--no_bf16",
        "--experiments_root", str(out), "--save_path", "run",
    ])
    lines = [json.loads(ln) for ln in open(out / "run" / "metrics.jsonl")]
    # 2 epochs x (4 noisy / batch 2) = 4 steps, in two k=2 windows
    assert lines and lines[-1]["step"] == 4
    for k, v in lines[-1].items():
        if k.startswith("loss/"):
            assert np.isfinite(v)
    assert (out / "run" / "checkpoints").exists()


@pytest.mark.slow
def test_banked_cli_respects_budget_fallback(corpus, tmp_path, capsys):
    """Over-budget corpora fall back to the host loader (and the run still
    completes) — the gate VERDICT r3 found crashing."""
    from dasr_tpu.cli import dsn_train

    out = tmp_path / "fallback"
    dsn_train.main([
        "--source_dir", str(corpus["source"]),
        "--target_dir", str(corpus["target"]),
        "--generator", "DeResnet", "--discriminator", "FSD",
        "--filter", "avg_pool", "--num_res_blocks", "1", "--no_per_loss",
        "--crop_size", "96", "--batch_size", "2", "--num_workers", "2",
        "--num_epochs", "1", "--num_decay_epochs", "1",
        "--val_interval", "99", "--save_model_interval", "99",
        "--device_bank", "--device_bank_gb", "1e-6", "--no_bf16",
        "--experiments_root", str(out), "--save_path", "run",
    ])
    assert "using the host loader" in capsys.readouterr().out
    lines = [json.loads(ln) for ln in open(out / "run" / "metrics.jsonl")]
    assert lines and lines[-1]["step"] == 2


@pytest.mark.slow
def test_banked_cli_single_device_layout_path(corpus, tmp_path):
    """batch 3 doesn't divide the 8-CPU mesh -> 1-device mesh -> the
    executable-layout upload path (put_banks_for_step) drives training."""
    from dasr_tpu.cli import dsn_train

    out = tmp_path / "banked1"
    dsn_train.main([
        "--source_dir", str(corpus["source"]),
        "--target_dir", str(corpus["target"]),
        "--generator", "DeResnet", "--discriminator", "FSD",
        "--filter", "avg_pool", "--num_res_blocks", "1", "--no_per_loss",
        "--crop_size", "96", "--batch_size", "3",
        "--num_epochs", "1", "--num_decay_epochs", "1",
        "--val_interval", "99", "--save_model_interval", "99",
        "--device_bank", "--no_bf16", "--flips", "--rotations",
        "--experiments_root", str(out), "--save_path", "run",
    ])
    lines = [json.loads(ln) for ln in open(out / "run" / "metrics.jsonl")]
    assert lines and lines[-1]["step"] == 1
    for k, v in lines[-1].items():
        if k.startswith("loss/"):
            assert np.isfinite(v)


def test_banked_cli_small_image_fallback(tmp_path, capsys):
    """Images smaller than the crop -> host loader (whose _rand_crop
    truncates; uniform sizes here so the truncated items still stack),
    not a bank-build crash."""
    from dasr_tpu.cli import dsn_train

    rng = np.random.default_rng(5)
    dirs = {k: tmp_path / k for k in ("source", "target")}
    for d in dirs.values():
        d.mkdir()
    for i in range(4):
        save_img(rng.random((96, 120, 3)).astype(np.float32),
                 str(dirs["target"] / f"t{i}.png"))
        save_img(rng.random((40, 44, 3)).astype(np.float32),
                 str(dirs["source"] / f"s{i}.png"))

    out = tmp_path / "small"
    dsn_train.main([
        "--source_dir", str(dirs["source"]),
        "--target_dir", str(dirs["target"]),
        "--generator", "DeResnet", "--discriminator", "FSD",
        "--filter", "avg_pool", "--num_res_blocks", "1", "--no_per_loss",
        "--crop_size", "128", "--batch_size", "2", "--num_workers", "2",
        "--num_epochs", "1", "--num_decay_epochs", "1",
        "--val_interval", "99", "--save_model_interval", "99",
        "--device_bank", "--no_bf16",
        "--experiments_root", str(out), "--save_path", "run",
    ])
    assert "smaller than the 128px crop; using the host loader" in (
        capsys.readouterr().out
    )
    lines = [json.loads(ln) for ln in open(out / "run" / "metrics.jsonl")]
    assert lines and lines[-1]["step"] == 2
