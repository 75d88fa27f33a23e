"""Multi-chip inference reachable from the CLIs (VERDICT r2 item #4).

``srn_test --mesh N [--spatial_shard]`` and ``dsn_create_dataset --mesh N``
route through ops/tiled.tiled_apply(mesh=...) / spatially_sharded_apply;
these tests pin the plumbing on the 8-device CPU mesh: mesh-fanned output
must equal the single-device output of the same path.
"""

import json
import os

import numpy as np
import pytest

from dasr_tpu.core import mesh as meshlib


def _sr_opt(tmp_path, chop):
    return {
        "name": "meshtest",
        "model": "sr",
        "scale": 4,
        "chop": chop,
        "val_lpips": False,
        "datasets": {},
        "path": {"root": str(tmp_path)},
        "network_G": {
            "which_model_G": "RRDB_net", "nf": 16, "nb": 1, "gc": 8,
            "in_nc": 3, "out_nc": 3, "norm_type": None, "mode": "CNA",
        },
        "train": {},
    }


def test_prepare_mesh_tiled_matches_single_device(rng, tmp_path):
    from dasr_tpu.core.config import dict_to_nonedict
    from dasr_tpu.models.registry import create_model

    lr = rng.random((160, 96, 3)).astype(np.float32)

    m1 = create_model(dict_to_nonedict(_sr_opt(tmp_path, chop=True)))
    m1.init()
    want = m1.test(lr)

    m8 = create_model(dict_to_nonedict(_sr_opt(tmp_path, chop=True)))
    m8.init()
    # same params on both models so outputs are comparable
    m8.params = m1.params
    m8.prepare_mesh(meshlib.make_mesh(n_data=8))
    got = m8.test(lr)

    assert got.shape == want.shape == (640, 384, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_prepare_mesh_spatial_shard_matches_unsharded(rng, tmp_path):
    from dasr_tpu.core.config import dict_to_nonedict
    from dasr_tpu.models.registry import create_model

    lr = rng.random((180, 64, 3)).astype(np.float32)  # uneven H (180 % 8 != 0)

    m1 = create_model(dict_to_nonedict(_sr_opt(tmp_path, chop=False)))
    m1.init()
    want = m1.test(lr)

    m8 = create_model(dict_to_nonedict(_sr_opt(tmp_path, chop=False)))
    m8.init()
    m8.params = m1.params
    m8.prepare_mesh(meshlib.make_mesh(n_data=8), spatial_shard=True)
    got = m8.test(lr)

    assert got.shape == want.shape == (720, 256, 3)
    # halo 20 covers the nb=1 receptive influence -> exact
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_srn_test_cli_mesh_flag(rng, tmp_path):
    """Flag plumbing: srn_test --mesh 8 --spatial_shard runs end to end."""
    from dasr_tpu.data.io import save_img

    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    for i in range(2):
        save_img(
            rng.random((160, 64, 3)).astype(np.float32),
            str(lr_dir / f"im{i}.png"),
        )
    opt = _sr_opt(tmp_path, chop=False)
    opt["datasets"] = {
        "test_1": {"name": "meshset", "mode": "LR", "dataroot_LR": str(lr_dir)}
    }
    cfg = tmp_path / "test_mesh.json"
    cfg.write_text(json.dumps(opt))

    from dasr_tpu.cli import srn_test

    srn_test.main(["-opt", str(cfg), "--mesh", "8", "--spatial_shard"])
    out_dir = tmp_path / "results" / "meshtest" / "meshset"
    outs = sorted(os.listdir(out_dir))
    assert outs == ["im0.png", "im1.png"]


def test_dsn_create_dataset_cli_mesh_flag(rng, tmp_path):
    """dsn_create_dataset --mesh 8: tiled G fan-out produces the same
    imgs/DDMs as the single-device run."""
    from dasr_tpu.data.io import save_img

    src = tmp_path / "source"; src.mkdir()
    tgt = tmp_path / "target"; tgt.mkdir()
    save_img(rng.random((48, 48, 3)).astype(np.float32), str(src / "s0.png"))
    # > 256x256 threshold so the mesh run actually tiles
    save_img(rng.random((320, 320, 3)).astype(np.float32), str(tgt / "t0.png"))

    from dasr_tpu.cli import dsn_create_dataset, dsn_train

    exp = tmp_path / "exp"
    dsn_train.main([
        "--source_dir", str(src), "--target_dir", str(tgt),
        "--generator", "DeResnet", "--discriminator", "FSD",
        "--filter", "avg_pool", "--num_res_blocks", "1",
        # crop 48 -> LR 12: below alex-LPIPS's 32-px floor (the torch
        # reference also crashes there), so the per-loss must be off
        "--no_per_loss",
        "--crop_size", "48", "--batch_size", "1", "--num_workers", "0",
        "--num_epochs", "1", "--num_decay_epochs", "1",
        "--val_interval", "5", "--save_model_interval", "1",
        "--experiments_root", str(exp), "--save_path", "d",
    ])
    ckpt = str(exp / "d" / "checkpoints")

    outs = {}
    for name, extra in (("single", []), ("mesh", ["--mesh", "8"])):
        res = tmp_path / f"res_{name}"
        dsn_create_dataset.main([
            "--source_dir", str(src), "--target_dir", str(tgt),
            "--checkpoint", ckpt, "--generator", "DeResnet",
            "--discriminator", "FSD", "--filter", "avg_pool",
            "--num_res_blocks", "1", "--name", "n", "--results_root", str(res),
        ] + extra)
        from dasr_tpu.data.io import read_img

        outs[name] = (
            read_img(str(res / "n" / "imgs_from_target" / "t0.png")),
            np.load(res / "n" / "ddm_target" / "t0.npy"),
        )

    # mesh run tiles (halo 64 HR px > the nb=1 DeResnet receptive field)
    # while the single run is un-tiled. Interiors must agree to PNG
    # quantization; image borders differ by design (tile halos give the
    # edge reflect context where the un-tiled conv zero-pads — the
    # documented tiled-path deviation, ops/tiled.py docstring).
    b = 20  # LR px
    np.testing.assert_allclose(
        outs["mesh"][0][b:-b, b:-b], outs["single"][0][b:-b, b:-b],
        atol=2 / 255,
    )
    np.testing.assert_allclose(
        outs["mesh"][1][..., b:-b, b:-b], outs["single"][1][..., b:-b, b:-b],
        atol=2e-2,
    )
