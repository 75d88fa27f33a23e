"""DASR trainer <-> reference checkpoint-format round trip.

save_reference_formats writes {iter}_{G,D_target,D_source}.pth +
{iter}.state (base_model.py:50-74 layout); a FRESH DASRModel configured
with those paths (as check_resume would write them, options.py:107-122)
must restore parameters AND Adam moments exactly and continue training.
"""

import os

import jax
import numpy as np
import pytest

from dasr_tpu.models.registry import DASRModel


def _opt(tmp_path, paths=None):
    return {
        "model": "DASR", "scale": 4, "multiweights": True, "bf16": False,
        "network_G": {"which_model_G": "RRDB_net", "nf": 16, "nb": 1, "gc": 8,
                      "norm_type": None},
        "network_D": {"which_model_D": "discriminator_patch", "nf": 16,
                      "in_nc": 9, "n_layers": 2},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "lr_steps": [100],
                  "fs": "wavelet", "gan_H_target": 0.005, "gan_H_source": 0.005,
                  "feature_weight": 0.0, "manual_seed": 0},
        "path": dict(paths or {}),
    }


def _batch(rng, b=2, lr=8):
    hr = lr * 4
    return {
        "LR_fake": rng.random((b, lr, lr, 3)).astype(np.float32),
        "LR_real": rng.random((b, lr, lr, 3)).astype(np.float32),
        "HR": rng.random((b, hr, hr, 3)).astype(np.float32),
        "HR_unpair": rng.random((b, hr, hr, 3)).astype(np.float32),
        "fake_w": rng.random((b, lr // 2, lr // 2, 1)).astype(np.float32),
    }


@pytest.mark.slow
def test_save_reference_then_resume_identical(tmp_path, rng):
    m1 = DASRModel(_opt(tmp_path)).init(jax.random.key(0), lr_size=8)
    # two real steps so optimizer moments are non-trivial
    for _ in range(2):
        m1.train_step(_batch(rng))
    out = str(tmp_path / "models")
    m1.save_reference_formats(out, 2)
    files = sorted(os.listdir(out))
    assert files == ["2.state", "2_D_source.pth", "2_D_target.pth", "2_G.pth"]

    m2 = DASRModel(_opt(tmp_path, {
        "pretrain_model_G": os.path.join(out, "2_G.pth"),
        "pretrain_model_D_target": os.path.join(out, "2_D_target.pth"),
        "pretrain_model_D_source": os.path.join(out, "2_D_source.pth"),
        "resume_state": os.path.join(out, "2.state"),
    })).init(jax.random.key(99), lr_size=8)
    m2.load()
    assert int(m2.state.step) == 2

    # params restored exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(m1.state.g.params),
        jax.tree_util.tree_leaves(m2.state.g.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for attr in ("d_target", "d_source"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(m1.state, attr).params),
            jax.tree_util.tree_leaves(getattr(m2.state, attr).params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # one more step from both: identical trajectories (same batch)
    batch = _batch(rng)
    met1 = m1.train_step(dict(batch))
    met2 = m2.train_step(dict(batch))
    for k in met1:
        np.testing.assert_allclose(met1[k], met2[k], rtol=2e-4, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(m1.state.g.params),
        jax.tree_util.tree_leaves(m2.state.g.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
