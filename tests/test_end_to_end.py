"""Full-pipeline smoke test on synthetic data (the reference's debug-mode
path, SURVEY.md §4): DSN train -> LR+DDM generation -> DASR train ->
srn_test, all through the CLIs."""

import json
import os

import numpy as np
import pytest

from dasr_tpu.data.io import save_img

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(0)
    dirs = {k: root / k for k in ("source", "target", "valid_hr", "valid_lr")}
    for d in dirs.values():
        d.mkdir()
    # target: clean HR images; source: noisy LR images
    for i in range(4):
        hr = rng.random((160, 160, 3)).astype(np.float32)
        save_img(hr, str(dirs["target"] / f"t{i}.png"))
        lr = rng.random((48, 48, 3)).astype(np.float32)
        save_img(lr, str(dirs["source"] / f"s{i}.png"))
        save_img(rng.random((128, 128, 3)).astype(np.float32), str(dirs["valid_hr"] / f"v{i}.png"))
        save_img(rng.random((32, 32, 3)).astype(np.float32), str(dirs["valid_lr"] / f"v{i}.png"))
    paths_yml = root / "paths.yml"
    paths_yml.write_text(
        "synth:\n  tdsr:\n"
        f"    source: '{dirs['source']}'\n"
        f"    target: '{dirs['target']}'\n"
        f"    valid_hr: '{dirs['valid_hr']}'\n"
        f"    valid_lr: '{dirs['valid_lr']}'\n"
    )
    return root, dirs, paths_yml


def test_full_pipeline(synth_data, tmp_path):
    root, dirs, paths_yml = synth_data
    work = tmp_path

    # --- stage 1: DSN training (2 tiny epochs) ---
    from dasr_tpu.cli import dsn_train

    exp_root = work / "DSN_experiments"
    dsn_train.main(
        [
            "--source_dir", str(dirs["source"]),
            "--target_dir", str(dirs["target"]),
            "--valid_hr_dir", str(dirs["valid_hr"]),
            "--valid_lr_dir", str(dirs["valid_lr"]),
            "--generator", "DeResnet", "--discriminator", "FSD",
            "--filter", "avg_pool",
            "--num_res_blocks", "1",
            "--crop_size", "128", "--crop_size_val", "128",
            "--batch_size", "2", "--num_workers", "2",
            "--num_epochs", "3", "--num_decay_epochs", "1",
            "--val_interval", "1", "--save_model_interval", "1",
            # 3 epochs x 2 steps with K=4 ends with 2 batches pending ->
            # exercises the trailing partial-scan flush; uint8 wire form
            # exercises the in-step u8->f32 cast
            "--steps_per_call", "4", "--transfer_uint8",
            "--experiments_root", str(exp_root),
            "--save_path", "dsn_synth",
        ]
    )
    ckpt_dir = exp_root / "dsn_synth" / "checkpoints"
    assert ckpt_dir.exists()
    assert (exp_root / "dsn_synth" / "metrics.jsonl").exists()
    # the flush trained the trailing batches: final iteration == 6, not 4
    steps = sorted(int(p) for p in os.listdir(ckpt_dir) if p.isdigit())
    assert steps and steps[-1] == 6, steps

    # --- stage 2: LR + DDM generation ---
    from dasr_tpu.cli import dsn_create_dataset

    res_root = work / "DSN_results"
    dsn_create_dataset.main(
        [
            "--source_dir", str(dirs["source"]),
            "--target_dir", str(dirs["target"]),
            "--checkpoint", str(ckpt_dir),
            "--generator", "DeResnet", "--discriminator", "FSD",
            "--filter", "avg_pool",
            "--num_res_blocks", "1",
            "--name", "synth_LRs",
            "--results_root", str(res_root),
            "--including_source_ddm",
        ]
    )
    img_dir = res_root / "synth_LRs" / "imgs_from_target"
    ddm_dir = res_root / "synth_LRs" / "ddm_target"
    imgs = sorted(os.listdir(img_dir))
    ddms = sorted(os.listdir(ddm_dir))
    assert len(imgs) == 4 and len(ddms) == 4
    ddm = np.load(ddm_dir / ddms[0])
    assert ddm.ndim == 4 and ddm.shape[:2] == (1, 1)  # reference layout
    assert ddm.shape[2] == 40 and ddm.shape[3] == 40  # 160/4 LR size
    assert np.isfinite(ddm).all()
    assert (res_root / "synth_LRs" / "ddm_source").exists()

    # --- stage 3: DASR training (4 iters, tiny net) ---
    from dasr_tpu.cli import srn_train

    srn_root = work / "SRN_experiments"
    cfg = {
        "name": "synth_dasr",
        "model": "DASR_FS_ESRGAN_patchGAN",  # legacy alias must normalize
        "use_tb_logger": True,
        "scale": 4,
        "chop": False,
        "val_lpips": False,
        "multiweights": True,
        "datasets": {
            "train": {
                "name": "synth",
                "mode": "LRHR_wavelet_unpair_fake_weights_EQ",
                "dataroot_HR": str(dirs["target"]),
                "dataroot_fake_LR": str(img_dir),
                "dataroot_real_LR": str(dirs["source"]),
                "dataroot_fake_weights": str(ddm_dir),
                "batch_size": 2,
                "HR_size": 64,
                "n_workers": 2,
                "use_flip": True,
                "use_rot": True,
            },
            "val": {
                "name": "valsynth",
                "mode": "LRHR",
                "dataroot_HR": str(dirs["valid_hr"]),
                "dataroot_LR": str(dirs["valid_lr"]),
            },
        },
        "path": {"root": str(srn_root)},
        "network_G": {"which_model_G": "RRDB_net", "nf": 16, "nb": 1, "gc": 8,
                      "in_nc": 3, "out_nc": 3, "norm_type": None, "mode": "CNA"},
        "network_D": {"which_model_D": "discriminator_patch", "nf": 16,
                      "in_nc": 9, "n_layers": 2, "norm_type": "Batch"},
        "train": {
            "lr_G": 1e-4, "beta1_G": 0.9, "lr_D": 1e-4, "beta1_D": 0.9,
            "lr_scheme": "MultiStepLR", "lr_steps": [3], "lr_gamma": 0.5,
            "fs": "wavelet", "norm": True, "sup_LL": True,
            "pixel_criterion": "l1", "pixel_weight": 1, "pixel_LL_weight": 1,
            "feature_criterion": "LPIPS", "feature_weight": 1,
            "gan_type": "vanilla", "ragan": False,
            "gan_H_target": 0.005, "gan_H_source": 0,
            "G_update_inter": 1, "D_update_inter": 1,
            "manual_seed": 0, "niter": 4, "val_freq": 4,
        },
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4},
        "max_val_images": 2,
    }
    cfg_path = work / "train_synth.json"
    cfg_path.write_text(json.dumps(cfg))
    # steps_per_call=2: scanned multi-step dispatch path (math identical;
    # exactness is pinned in test_train_steps.py)
    srn_train.main(["-opt", str(cfg_path), "--steps_per_call", "2"])
    state_dir = srn_root / "synth_dasr" / "training_state"
    assert state_dir.exists() and os.listdir(state_dir)
    assert (srn_root / "synth_dasr" / "val_images").exists()
    # use_tb_logger mirrors scalars into a real TensorBoard event file
    tb_dir = srn_root / "synth_dasr" / "tb_logger"
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(tb_dir))

    # --- stage 4: srn_test on the val set with the tiny trained G ---
    from dasr_tpu.cli import srn_test

    test_cfg = {
        "name": "synth_test",
        "model": "DASR",
        "scale": 4,
        "chop": False,
        "val_lpips": False,
        "datasets": {
            "test_1": {
                "name": "valsynth",
                "mode": "LRHR",
                "dataroot_HR": str(dirs["valid_hr"]),
                "dataroot_LR": str(dirs["valid_lr"]),
            }
        },
        "path": {"root": str(work / "results_root")},
        "network_G": cfg["network_G"],
        "network_D": cfg["network_D"],
        "train": {"gan_H_target": 0.005, "gan_H_source": 0},
    }
    test_path = work / "test_synth.json"
    test_path.write_text(json.dumps(test_cfg))
    host_avg = srn_test.main(["-opt", str(test_path)])
    out_dir = work / "results_root" / "results" / "synth_test" / "valsynth"
    assert len(os.listdir(out_dir)) == 4

    # --device_metrics: one jitted dispatch per image must reproduce the
    # host f64 protocol. Tolerance here is dominated by the CPU backend's
    # sequential f32 reductions (43k-element MSE sums accumulate up to
    # ~1e-2 dB of drift vs the host's f64); on the real chip's tree
    # reductions the measured parity is <1e-3 dB (BENCH_NOTES r3).
    dev_avg = srn_test.main(["-opt", str(test_path), "--device_metrics"])
    for k in ("psnr", "ssim", "psnr_y", "ssim_y"):
        tol = 3e-2 if "psnr" in k else 1e-3
        assert abs(host_avg["valsynth"][k] - dev_avg["valsynth"][k]) < tol, k
