"""CPU smoke test for the auto_reproduce orchestrator — the reference's
headline entry point (codes/Auto_Reproduce.py:30-40): DSN train -> LR+DDM
generation -> DASR train, all in-process, stage handoff file-based.

Uses the orchestrator's smoke knobs (--num_epochs/--niter overrides,
--dsn_extra/--dsn_create_extra/--srn_template) to shrink the nets and
budgets; the stage sequencing, paths.yml plumbing, launcher
hyperparameter sets, derived-JSON rewiring (create_auto_json semantics,
Auto_Reproduce.py:8-27) and output tree layout are the production code
paths. The full-size measured run lives in BENCH_NOTES (round 3)."""

import json
import os

import numpy as np


def test_auto_reproduce_smoke(tmp_path, capsys):
    from dasr_tpu.data.io import save_img

    rng = np.random.default_rng(0)
    root = tmp_path / "corpus"
    dirs = {d: root / d for d in ("source", "target", "valid_hr", "valid_lr")}
    for d in dirs.values():
        os.makedirs(d)
    for i in range(4):
        save_img(rng.random((144, 144, 3)).astype(np.float32),
                 str(dirs["target"] / f"t{i}.png"))
        save_img(rng.random((36, 36, 3)).astype(np.float32),
                 str(dirs["source"] / f"s{i}.png"))
    for i in range(2):
        save_img(rng.random((64, 64, 3)).astype(np.float32),
                 str(dirs["valid_hr"] / f"v{i}.png"))
        save_img(rng.random((16, 16, 3)).astype(np.float32),
                 str(dirs["valid_lr"] / f"v{i}.png"))
    paths_yml = tmp_path / "paths.yml"
    paths_yml.write_text(
        "aim2019:\n  tdsr:\n"
        + "".join(f"    {k}: '{v}'\n" for k, v in dirs.items())
    )

    # tiny stage-3 template: same structure as the shipped config
    shipped = os.path.join(
        os.path.dirname(__file__), "..", "dasr_tpu", "configs",
        "train_DASR_auto_reproduce.json",
    )
    with open(shipped) as f:
        cfg = json.load(f)
    cfg["val_lpips"] = False
    cfg["network_G"].update({"nf": 16, "nb": 1, "gc": 8})
    cfg["network_D"].update({"nf": 16})
    cfg["datasets"]["train"].update({"batch_size": 2, "HR_size": 64,
                                     "n_workers": 2})
    cfg["logger"]["print_freq"] = 1
    cfg["max_val_images"] = 2
    template = tmp_path / "template.json"
    template.write_text(json.dumps(cfg))

    from dasr_tpu.cli import auto_reproduce

    work = tmp_path / "work"
    os.makedirs(work)
    auto_reproduce.main([
        "--dataset", "aim2019", "--artifact", "tdsr",
        "--paths_yml", str(paths_yml),
        "--work_root", str(work),
        "--num_epochs", "1", "--niter", "2",
        "--srn_template", str(template),
        "--dsn_extra",
        # crop 128 -> LR 32: the smallest input alex-LPIPS is valid on
        "--num_res_blocks 2 --crop_size 128 --batch_size 2 --num_workers 2 "
        "--val_interval 1 --save_model_interval 1 --decode_cache_gb 1",
        "--dsn_create_extra", "--num_res_blocks 2",
    ])

    # BOTH train stages must have run true multi-device SPMD on the 8-CPU
    # mesh (batch 2 -> 2-device data mesh). make_mesh_for_batch silently
    # degrades to 1 device when batch and device counts don't divide, which
    # would let orchestrator SPMD regressions hide (VERDICT r3 stretch #8).
    mesh_lines = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("[mesh] ")
    ]
    assert len(mesh_lines) == 2, mesh_lines  # dsn_train + srn_train
    for ln in mesh_lines:
        n_data = int(ln.split("data=")[1].split()[0])
        assert n_data >= 2, f"stage fell back to a 1-device mesh: {ln}"

    # stage-handoff tree, byte-layout per create_dataset_modified.py:86-96
    lrs = work / "DSN_results" / "0603_DSN_LRs_aim2019"
    assert sorted(os.listdir(lrs / "imgs_from_target")) == [
        f"t{i}.png" for i in range(4)
    ]
    ddm = np.load(lrs / "ddm_target" / "t0.npy")
    assert ddm.shape == (1, 1, 36, 36) and np.isfinite(ddm).all()

    # DSN experiment tree + finite metrics
    dsn_exp = work / "DSN_experiments" / "0603_DSN_aim2019"
    assert (dsn_exp / "checkpoints").is_dir()
    last = [json.loads(line) for line in open(dsn_exp / "metrics.jsonl")][-1]
    assert all(np.isfinite(v) for k, v in last.items() if k != "time")

    # derived stage-3 JSON rewired to the DSN outputs (create_auto_json)
    derived = json.load(open(work / "train_DASR_auto_reproduce_aim2019.json"))
    assert derived["datasets"]["train"]["dataroot_fake_LR"] == str(
        lrs / "imgs_from_target"
    )
    assert derived["datasets"]["train"]["dataroot_HR"] == str(dirs["target"])
    assert derived["train"]["niter"] == 2

    # SRN experiment tree: training state + val images + finite losses
    srn_exp = work / "SRN_experiments" / "0603_DASR_SRN_auto_reproduce_aim2019"
    assert os.listdir(srn_exp / "training_state")
    lines = [json.loads(line) for line in open(srn_exp / "metrics.jsonl")]
    loss_lines = [l for l in lines if "loss/l_g_pix" in l]
    assert loss_lines and all(
        np.isfinite(v) for l in loss_lines for k, v in l.items() if k != "time"
    )
