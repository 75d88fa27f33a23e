"""BAPPS 2AFC/JND datasets, scoring, and the lpips_train CLI."""

import os

import numpy as np
import pytest


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def twoafc_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "2afc"
    judges = [0.0, 1.0, 0.5, 1.0, 0.0, 0.5]
    for i, j in enumerate(judges):
        ref = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        # p0 = light noise, p1 = heavy noise (so L2 prefers p0)
        p0 = np.clip(ref + rng.integers(-8, 8, ref.shape), 0, 255).astype(np.uint8)
        p1 = np.clip(ref + rng.integers(-80, 80, ref.shape), 0, 255).astype(np.uint8)
        _write_png(str(root / "ref" / f"{i}.png"), ref)
        _write_png(str(root / "p0" / f"{i}.png"), p0)
        _write_png(str(root / "p1" / f"{i}.png"), p1)
        os.makedirs(root / "judge", exist_ok=True)
        np.save(root / "judge" / f"{i}.npy", np.array([j], np.float32))
    return str(root), np.array(judges, np.float32)


def test_twoafc_dataset_and_score(twoafc_root):
    from dasr_tpu.data.bapps import TwoAFCDataset, score_2afc

    root, judges = twoafc_root
    ds = TwoAFCDataset(root, load_size=32)
    assert len(ds) == 6
    item = ds[0]
    assert item["ref"].shape == (32, 32, 3)
    assert item["ref"].min() >= -1.0 and item["ref"].max() <= 1.0

    def l2(a, b):
        return np.mean((a - b) ** 2, axis=(1, 2, 3))

    score, verbose = score_2afc(l2, ds, batch_size=4)
    # L2 always prefers p0 (d0 < d1) -> agreement = mean(1 - judge)
    expected = float(np.mean(1.0 - judges))
    assert score == pytest.approx(expected)
    assert (verbose["d0s"] < verbose["d1s"]).all()


def test_jnd_score_perfect_and_inverted(tmp_path):
    from dasr_tpu.data.bapps import JNDDataset, score_jnd, voc_ap

    rng = np.random.default_rng(1)
    root = tmp_path / "jnd"
    sames = [1.0, 1.0, 0.0, 0.0]
    for i, s in enumerate(sames):
        p0 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        noise = 0 if s else 60
        p1 = np.clip(p0 + rng.integers(-noise, noise + 1, p0.shape), 0, 255)
        _write_png(str(root / "p0" / f"{i}.png"), p0)
        _write_png(str(root / "p1" / f"{i}.png"), p1.astype(np.uint8))
        os.makedirs(root / "same", exist_ok=True)
        np.save(root / "same" / f"{i}.npy", np.array([s], np.float32))

    ds = JNDDataset(str(root), load_size=32)

    def l2(a, b):
        return np.mean((a - b) ** 2, axis=(1, 2, 3))

    score, _ = score_jnd(l2, ds)
    assert score == pytest.approx(1.0)  # identical pairs rank first

    # hand-checked AP for an imperfect ranking: sames sorted by distance
    # [1, 0, 1, 0] -> precs [1, 1/2, 2/3, 1/2], recs [1/2, 1/2, 1, 1];
    # envelope -> AP = 0.5*1 + 0.5*(2/3)
    ap = voc_ap(np.array([0.5, 0.5, 1.0, 1.0]), np.array([1.0, 0.5, 2 / 3, 0.5]))
    assert ap == pytest.approx(0.5 + 0.5 * 2 / 3)


def test_lpips_train_cli_smoke(twoafc_root, tmp_path):
    import torch

    from dasr_tpu.cli.lpips_train import main

    root, _ = twoafc_root
    save_dir = str(tmp_path / "ckpt")
    trainable = main([
        "train", "--datasets", root, "--net", "alex", "--nepoch", "1",
        "--nepoch_decay", "0", "--batch_size", "2", "--load_size", "32",
        "--print_freq", "1", "--save_dir", save_dir, "--from_scratch",
    ])
    out = os.path.join(save_dir, "latest_net_.pth")
    assert os.path.exists(out)
    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert "lin0.model.1.weight" in sd
    # exported heads match the trained values and are nonnegative (clamped)
    w0 = sd["lin0.model.1.weight"].numpy().reshape(-1)
    np.testing.assert_allclose(
        w0, np.asarray(trainable["lins"]["lin0"]).reshape(-1), rtol=1e-6
    )
    assert (w0 >= 0).all()


def test_lpips_eval_cli_l2(twoafc_root, tmp_path):
    from dasr_tpu.cli.lpips_train import main

    root, judges = twoafc_root
    out = str(tmp_path / "res.json")
    results = main([
        "eval", "--datasets", root, "--dataset_mode", "2afc", "--model", "l2",
        "--load_size", "32", "--batch_size", "3", "--out", out,
    ])
    assert os.path.exists(out)
    # reference L2 model also prefers the lightly-noised patch
    assert results[root] == pytest.approx(float(np.mean(1.0 - judges)))
