"""dsn_train CLI window plumbing: the scanned multi-step dispatch and the
lagged gated metric readback must not change the training math or the
metrics that reach disk.

Trainer-level scan exactness is covered in test_train_steps; this drives
the REAL CLI twice (steps_per_call 1 vs 2, identical seed/corpus) and
compares the written metrics line-for-line — validating the pending-
window stacking, the lagged drain (reads one window late), and the
end-of-run force flush as one pipeline."""

import json

import numpy as np
import pytest

from dasr_tpu.data.io import save_img

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dsn_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsncli")
    rng = np.random.default_rng(7)
    dirs = {k: root / k for k in ("source", "target")}
    for d in dirs.values():
        d.mkdir()
    for i in range(4):
        save_img(rng.random((160, 160, 3)).astype(np.float32),
                 str(dirs["target"] / f"t{i}.png"))
        save_img(rng.random((48, 48, 3)).astype(np.float32),
                 str(dirs["source"] / f"s{i}.png"))
    return dirs


def _run(dirs, out_root, k):
    from dasr_tpu.cli import dsn_train

    dsn_train.main(
        [
            "--source_dir", str(dirs["source"]),
            "--target_dir", str(dirs["target"]),
            "--generator", "DeResnet", "--discriminator", "FSD",
            "--filter", "avg_pool",
            "--num_res_blocks", "1",
            "--crop_size", "128",
            "--batch_size", "2", "--num_workers", "2",
            "--num_epochs", "2", "--num_decay_epochs", "1",
            "--val_interval", "99", "--save_model_interval", "99",
            # f32 compute: scan vs unrolled bf16 compilations legitimately
            # round differently (~1e-3 rel after a few steps); this test
            # pins the WINDOW PLUMBING, so run where math is bit-stable
            "--steps_per_call", str(k), "--transfer_uint8", "--no_bf16",
            "--experiments_root", str(out_root),
            "--save_path", f"k{k}",
        ]
    )
    lines = [
        json.loads(ln)
        for ln in open(out_root / f"k{k}" / "metrics.jsonl")
    ]
    # drop wall-clock-dependent fields
    return [
        {kk: v for kk, v in d.items()
         if kk not in ("time",) and not kk.startswith("perf/")}
        for d in lines
    ]


def test_steps_per_call_metrics_identical(dsn_corpus, tmp_path):
    """k=1 (per-step dispatch, lagged drain) and k=2 (scanned windows)
    must write the same metric steps with bit-identical loss values: the
    Loader's per-(seed, epoch, index) RNG makes batches identical, and
    scan-of-2 is exactness-tested against 2 sequential steps."""
    a = _run(dsn_corpus, tmp_path / "a", 1)
    b = _run(dsn_corpus, tmp_path / "b", 2)
    # both runs end with the forced final-window flush at iteration 4
    assert a and b
    assert a[-1]["step"] == b[-1]["step"] == 4
    for ka, vb in b[-1].items():
        va = a[-1][ka]
        assert va == pytest.approx(vb, rel=2e-5, abs=1e-6), (ka, va, vb)
