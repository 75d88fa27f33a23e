"""dsn_test CLI: folder inference + realness DDM dump from an orbax
checkpoint (reference: codes/DSN/test.py, with the stale D signature
fixed)."""

import os

import jax
import numpy as np

from dasr_tpu.cli import dsn_test
from dasr_tpu.data.io import read_img, save_img
from dasr_tpu.train.checkpoints import save_checkpoint
from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer


def test_dsn_test_cli_orbax(tmp_path, rng):
    cfg = DSNConfig(generator="DeResnet", discriminator="FSD",
                    filter="avg_pool", num_res_blocks=2, upscale_factor=4)
    trainer = DSNTrainer(cfg)
    state = trainer.init_state(jax.random.key(0), lr_size=16, hr_size=64)
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, state, 3)

    in_dir, out_dir = str(tmp_path / "hr"), str(tmp_path / "out")
    os.makedirs(in_dir)
    for i in range(3):
        save_img(rng.random((64, 64, 3)).astype(np.float32),
                 os.path.join(in_dir, f"h{i}.png"))

    dsn_test.main([
        "--input_dir", in_dir, "--output_dir", out_dir,
        "--checkpoint", ckpt_dir, "--generator", "DeResnet",
        "--num_res_blocks", "2", "--save_realness",
        "--discriminator", "FSD", "--filter", "avg_pool",
    ])

    for i in range(3):
        lr = read_img(os.path.join(out_dir, f"h{i}.png"))
        assert lr.shape == (16, 16, 3)
        ddm = np.load(os.path.join(out_dir, f"h{i}_ddm.npy"))
        assert ddm.shape == (1, 1, 16, 16)
        assert np.isfinite(ddm).all() and 0.0 <= ddm.min() <= ddm.max() <= 1.0


def test_dsn_create_dataset_no_ddm(tmp_path, rng):
    """--no_ddm reproduces the legacy FSSR-style generator-only dataset
    (reference: DSN/create_dataset.py — LR pngs, no DDM npy files)."""
    from dasr_tpu.cli import dsn_create_dataset
    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer

    cfg = DSNConfig(generator="DeResnet", discriminator="FSD",
                    filter="avg_pool", num_res_blocks=1, upscale_factor=4)
    trainer = DSNTrainer(cfg)
    state = trainer.init_state(jax.random.key(0), lr_size=16, hr_size=64)
    ckpt_dir = str(tmp_path / "ck")
    save_checkpoint(ckpt_dir, state, 1)

    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    os.makedirs(src), os.makedirs(tgt)
    for i in range(2):
        save_img(rng.random((16, 16, 3)).astype(np.float32),
                 os.path.join(src, f"s{i}.png"))
        save_img(rng.random((64, 64, 3)).astype(np.float32),
                 os.path.join(tgt, f"t{i}.png"))

    res = str(tmp_path / "res")
    dsn_create_dataset.main([
        "--source_dir", src, "--target_dir", tgt,
        "--checkpoint", ckpt_dir, "--generator", "DeResnet",
        "--discriminator", "FSD", "--filter", "avg_pool",
        "--num_res_blocks", "1", "--name", "legacy",
        "--results_root", res, "--no_ddm",
    ])
    out = os.path.join(res, "legacy")
    assert sorted(os.listdir(os.path.join(out, "imgs_from_target"))) == [
        "t0.png", "t1.png"
    ]
    ddm_dir = os.path.join(out, "ddm_target")
    assert not os.path.isdir(ddm_dir) or not os.listdir(ddm_dir)
