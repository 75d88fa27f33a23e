"""SRN-stage device bank (data/device_bank.sample_dasr_batch +
SRNTrainer.train_banked_step + srn_train --device_bank): the in-step
replica of DASRUnpairedDataset's five-tensor sampling law, its exactness
vs the plain train step, and the REAL CLI on the conftest CPU mesh."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasr_tpu.data.device_bank import (
    ImageBank,
    build_bank,
    build_ddm_bank,
    sample_dasr_batch,
)
from dasr_tpu.data.io import save_img


def _posimg(h, w):
    """uint8 image whose channels encode absolute (y, x) position."""
    y, x = np.mgrid[0:h, 0:w]
    im = np.zeros((h, w, 3), np.uint8)
    im[..., 0], im[..., 1], im[..., 2] = y, x, 7
    return im


def _pos_banks(scale=2, n_fake=2, n_real=1, lr_hw=12):
    hr_hw = lr_hw * scale
    fake = np.stack([_posimg(lr_hw, lr_hw)] * n_fake)
    hr = np.stack([_posimg(hr_hw, hr_hw)] * n_fake)
    real = np.stack([_posimg(lr_hw, lr_hw)] * n_real)
    yy, xx = np.mgrid[0:lr_hw, 0:lr_hw]
    ddm = np.repeat((yy * 100 + xx).astype(np.float32)[None, :, :, None],
                    n_fake, axis=0)
    mk = lambda d, hw: ImageBank(
        jnp.asarray(d), jnp.asarray([[hw, hw]] * d.shape[0], np.int32)
    )
    return mk(fake, lr_hw), mk(hr, hr_hw), mk(real, lr_hw), mk(ddm, lr_hw)


def test_build_ddm_bank_resize_and_pad():
    """DDMs are bilinear-resized to their fake-LR's FULL size at build time
    (host order: resize whole map, then crop — fake_w_dataset.py:66), then
    zero-padded into one array; same-size maps pass through exactly."""
    import tempfile

    lr_sizes = np.array([[8, 10], [6, 6]], np.int32)
    with tempfile.TemporaryDirectory() as d:
        # map 0 already LR-sized (identity); map 1 at half size (resized)
        m0 = np.arange(80, dtype=np.float32).reshape(1, 1, 8, 10)
        m1 = np.ones((1, 1, 3, 3), np.float32) * 2.5
        np.save(os.path.join(d, "a.npy"), m0)
        np.save(os.path.join(d, "b.npy"), m1)
        files = [os.path.join(d, "a.npy"), os.path.join(d, "b.npy")]
        bank = build_ddm_bank(files, lr_sizes)
    assert bank.data.shape == (2, 8, 10, 1) and bank.data.dtype == np.float32
    np.testing.assert_array_equal(bank.data[0, :, :, 0],
                                  m0[0, 0].astype(np.float32))
    # constant map stays constant under bilinear resize; padding is zero
    np.testing.assert_allclose(bank.data[1, :6, :6, 0], 2.5)
    assert bank.data[1, 6:].sum() == 0 and bank.data[1, :, 6:].sum() == 0
    np.testing.assert_array_equal(bank.sizes, lr_sizes)
    with pytest.raises(ValueError, match="DDMs vs"):
        build_ddm_bank(files[:1], lr_sizes)


def test_sample_dasr_batch_alignment_no_augment():
    """Position-encoded banks, augment off: the HR crop starts at exactly
    scale x the fake-LR crop offset (datasets._rand_crop_aligned), and the
    DDM crop tracks the fake-LR crop pixel-for-pixel."""
    scale, hr_size = 2, 8
    fb, hb, rb, db = _pos_banks(scale=scale)
    b = sample_dasr_batch(
        fb, hb, rb, db, jnp.array([0, 1], np.int32), jax.random.key(0),
        hr_size, scale, use_flip=False, use_rot=False,
    )
    lf = np.round(np.asarray(b["LR_fake"]) * 255)
    hrc = np.round(np.asarray(b["HR"]) * 255)
    w = np.asarray(b["fake_w"])
    lr_size = hr_size // scale
    for i in range(2):
        t, l = int(lf[i, 0, 0, 0]), int(lf[i, 0, 0, 1])
        # the whole LR crop window is contiguous content
        np.testing.assert_array_equal(
            lf[i, :, :, 0], np.add.outer(np.arange(lr_size) + t,
                                         np.zeros(lr_size, int))
        )
        assert hrc[i, 0, 0, 0] == t * scale and hrc[i, 0, 0, 1] == l * scale
        np.testing.assert_array_equal(
            w[i, :, :, 0],
            np.add.outer((np.arange(lr_size) + t) * 100,
                         np.arange(lr_size) + l),
        )


def _dihedral_state(crop255):
    """Recover (hflip, vflip, transpose) from a position-encoded crop:
    channel 0 encodes y, channel 1 encodes x; transpose moves y onto
    axis 1, vflip makes y decreasing, hflip makes x decreasing."""
    c0, c1 = crop255[..., 0], crop255[..., 1]
    r = bool(abs(c0[0, 1] - c0[0, 0]) > abs(c0[1, 0] - c0[0, 0]))
    y_ax = c0[0, :] if r else c0[:, 0]
    x_ax = c1[:, 0] if r else c1[0, :]
    return (bool(x_ax[1] < x_ax[0]), bool(y_ax[1] < y_ax[0]), r)


def test_sample_dasr_batch_joint_augment():
    """One dihedral draw per ITEM applied to all five tensors (the host
    _augment augments the list jointly, datasets.py:47-62) — and all 8
    states are reachable over many draws."""
    scale, hr_size = 2, 8
    fb, hb, rb, db = _pos_banks(scale=scale)
    seen = set()
    for s in range(40):
        b = sample_dasr_batch(
            fb, hb, rb, db, jnp.array([0], np.int32), jax.random.key(s),
            hr_size, scale, use_flip=True, use_rot=True,
        )
        states = [
            _dihedral_state(np.round(np.asarray(b[k])[0] * 255))
            for k in ("LR_fake", "LR_real", "HR", "HR_unpair")
        ]
        # fake_w encodes y*100+x; recover its state from the two parts
        w = np.asarray(b["fake_w"])[0, :, :, 0]
        wst = _dihedral_state(np.stack([w // 100, w % 100], axis=-1))
        states.append(wst)
        assert len(set(states)) == 1, states
        seen.add(states[0])
    assert seen == {(h, v, r) for h in (0, 1) for v in (0, 1) for r in (0, 1)}


def test_sample_dasr_batch_flip_only_gates():
    """use_flip without use_rot: only hflip states occur (the host gates
    vflip+transpose on use_rot, datasets._augment)."""
    scale, hr_size = 2, 8
    fb, hb, rb, db = _pos_banks(scale=scale)
    seen = set()
    for s in range(24):
        b = sample_dasr_batch(
            fb, hb, rb, db, jnp.array([0], np.int32), jax.random.key(s),
            hr_size, scale, use_flip=True, use_rot=False,
        )
        seen.add(_dihedral_state(np.round(np.asarray(b["LR_fake"])[0] * 255)))
    assert seen == {(False, False, False), (True, False, False)}


def test_sample_dasr_batch_uniform_picks():
    """The real-LR image pick and the unpaired-HR pick are uniform over
    their banks and independent of the fake index (host law:
    rng.integers(len(paths)) per item, datasets.py:178,186)."""
    scale, hr_size = 2, 8
    n_real, n_hr = 5, 4
    lr_hw, hr_hw = 8, 16
    # constant-valued images: value identifies the source index
    real = np.stack([np.full((lr_hw, lr_hw, 3), i, np.uint8)
                     for i in range(n_real)])
    hr = np.stack([np.full((hr_hw, hr_hw, 3), 10 + i, np.uint8)
                   for i in range(n_hr)])
    fake = np.zeros((n_hr, lr_hw, lr_hw, 3), np.uint8)
    mk = lambda d, hw: ImageBank(
        jnp.asarray(d), jnp.asarray([[hw, hw]] * d.shape[0], np.int32)
    )
    fb, hb, rb = mk(fake, lr_hw), mk(hr, hr_hw), mk(real, lr_hw)
    picks_r, picks_u = [], []
    for s in range(120):
        b = sample_dasr_batch(
            fb, hb, rb, None, jnp.array([0], np.int32), jax.random.key(s),
            hr_size, scale, use_flip=False, use_rot=False,
        )
        picks_r.append(int(round(float(b["LR_real"][0, 0, 0, 0]) * 255)))
        picks_u.append(int(round(float(b["HR_unpair"][0, 0, 0, 0]) * 255)) - 10)
        # ddm_bank=None -> all-ones weights (the UnpairDataset law)
        np.testing.assert_array_equal(np.asarray(b["fake_w"][0]), 1.0)
    cr = np.bincount(picks_r, minlength=n_real)
    cu = np.bincount(picks_u, minlength=n_hr)
    assert (cr > 0).all() and (cu > 0).all()
    assert cr.max() < 4.0 * max(1, cr.min())
    assert cu.max() < 4.0 * max(1, cu.min())


def test_banked_step_matches_train_step():
    """train_banked_step == train_step on the SAME sampled batch (key
    derivation reproduced host-side): params agree to f32 fusion noise
    (the two jits compile the cast/fusion boundaries differently; the
    delta is ~1e-8, not a semantic difference) and metrics agree."""
    from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer

    cfg = SRNConfig(scale=4, nf=8, nb=1, gc=4, d_nf=8, d_n_layers=1,
                    feature_weight=0.0, gan_H_target=0.005, seed=5)
    tr = SRNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=8)

    rng = np.random.default_rng(0)
    mk = lambda d, hw: ImageBank(
        jnp.asarray(d), jnp.asarray([[hw, hw]] * d.shape[0], np.int32)
    )
    fb = mk(rng.integers(0, 255, (3, 40, 40, 3), np.uint8), 40)
    hb = mk(rng.integers(0, 255, (3, 160, 160, 3), np.uint8), 160)
    rb = mk(rng.integers(0, 255, (2, 40, 40, 3), np.uint8), 40)
    db = mk(rng.random((3, 40, 40, 1)).astype(np.float32), 40)

    idx = np.array([[0, 2]], np.int32)
    seed_w = 17
    s1, m1 = tr.train_banked_step(state, fb, hb, rb, db, idx, seed_w, 32)

    key = jax.random.fold_in(jax.random.key(cfg.seed), np.uint32(seed_w))
    _, sub = jax.random.split(key)
    batch = sample_dasr_batch(fb, hb, rb, db, jnp.asarray(idx[0]), sub,
                              32, 4, True, True)
    s2, m2 = tr.train_step(state, batch)
    for a, b in zip(jax.tree.leaves(s1.g.params), jax.tree.leaves(s2.g.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-4, atol=1e-6)
    # K=2 window: scan path returns the LAST step's (scalar) metrics
    idx2 = np.array([[0, 2], [1, 0]], np.int32)
    s3, m3 = tr.train_banked_step(state, fb, hb, rb, db, idx2, seed_w, 32)
    assert int(s3.step) == 2
    assert all(np.asarray(v).shape == () for v in m3.values())


@pytest.fixture(scope="module")
def srn_corpus(tmp_path_factory):
    """Tiny stage-3 corpus: fake LR + paired HR + real LR + DDM .npy."""
    root = tmp_path_factory.mktemp("srn_bank")
    rng = np.random.default_rng(7)
    dirs = {k: root / k for k in ("fake_lr", "hr", "real_lr", "ddm",
                                  "val_hr", "val_lr")}
    for d in dirs.values():
        d.mkdir()
    for i in range(4):
        save_img(rng.random((40 + 4 * i, 44, 3)).astype(np.float32),
                 str(dirs["fake_lr"] / f"t{i}.png"))
        save_img(rng.random((4 * (40 + 4 * i), 176, 3)).astype(np.float32),
                 str(dirs["hr"] / f"t{i}.png"))
        save_img(rng.random((40, 40, 3)).astype(np.float32),
                 str(dirs["real_lr"] / f"r{i}.png"))
        # reference DDM layout (1, 1, h, w), at half the LR size so the
        # build-time bilinear resize path runs
        np.save(dirs["ddm"] / f"t{i}.npy",
                rng.random((1, 1, (40 + 4 * i) // 2, 22)).astype(np.float32))
    for i in range(2):
        save_img(rng.random((64, 64, 3)).astype(np.float32),
                 str(dirs["val_hr"] / f"v{i}.png"))
        save_img(rng.random((16, 16, 3)).astype(np.float32),
                 str(dirs["val_lr"] / f"v{i}.png"))
    return dirs


def _srn_cfg(dirs, tmp_path, batch_size=2, extra=None):
    shipped = os.path.join(
        os.path.dirname(__file__), "..", "dasr_tpu", "configs",
        "train_DASR_auto_reproduce.json",
    )
    with open(shipped) as f:
        cfg = json.load(f)
    cfg["val_lpips"] = False
    cfg["network_G"].update({"nf": 16, "nb": 1, "gc": 8})
    cfg["network_D"].update({"nf": 16})
    cfg["datasets"]["train"].update({
        "batch_size": batch_size, "HR_size": 64, "n_workers": 2,
        "dataroot_HR": str(dirs["hr"]),
        "dataroot_fake_LR": str(dirs["fake_lr"]),
        "dataroot_real_LR": str(dirs["real_lr"]),
        "dataroot_fake_weights": str(dirs["ddm"]),
    })
    cfg["datasets"]["val"].update({
        "dataroot_HR": str(dirs["val_hr"]), "dataroot_LR": str(dirs["val_lr"]),
    })
    cfg["path"]["root"] = str(tmp_path / "exp")
    cfg["train"]["niter"] = 4
    cfg["train"]["val_freq"] = 99
    cfg["logger"]["print_freq"] = 1
    cfg["logger"]["save_checkpoint_freq"] = 99
    if extra:
        cfg.update(extra)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return p


def test_srn_banked_cli_runs_multi_device(srn_corpus, tmp_path, capsys):
    """The REAL srn_train CLI with --device_bank on a 2-device data mesh
    (batch 2 on the conftest 8-CPU mesh): banks replicate, index windows
    shard over 'data', metrics land, the final state saves."""
    from dasr_tpu.cli import srn_train

    cfg = _srn_cfg(srn_corpus, tmp_path)
    srn_train.main(["-opt", str(cfg), "--device_bank",
                    "--steps_per_call", "2"])
    out = capsys.readouterr().out
    assert "device bank:" in out and "GiB resident" in out
    exp = tmp_path / "exp" / "DASR_SRN_auto_reproduce"
    lines = [json.loads(ln) for ln in open(exp / "metrics.jsonl")]
    loss = [l for l in lines if "loss/l_g_pix" in l]
    assert loss and loss[-1]["step"] == 4
    assert all(np.isfinite(v) for l in loss for k, v in l.items()
               if k.startswith("loss/"))
    assert os.listdir(exp / "training_state")


@pytest.mark.slow
def test_srn_banked_cli_budget_fallback(srn_corpus, tmp_path, capsys):
    """Over-budget corpus -> logged fallback to the host loader, run still
    completes with the same step count."""
    from dasr_tpu.cli import srn_train

    cfg = _srn_cfg(srn_corpus, tmp_path)
    srn_train.main(["-opt", str(cfg), "--device_bank",
                    "--device_bank_gb", "1e-7"])
    out = capsys.readouterr().out
    assert "using the host loader" in out
    exp = tmp_path / "exp" / "DASR_SRN_auto_reproduce"
    lines = [json.loads(ln) for ln in open(exp / "metrics.jsonl")]
    assert [l for l in lines if "loss/l_g_pix" in l][-1]["step"] == 4


@pytest.mark.slow
def test_srn_banked_cli_single_device_layout_path(srn_corpus, tmp_path):
    """batch 3 doesn't divide the conftest 8-CPU mesh -> 1-device mesh ->
    the layout-pinned make_banked_srn_step path drives training."""
    from dasr_tpu.cli import srn_train

    cfg = _srn_cfg(srn_corpus, tmp_path, batch_size=3)
    srn_train.main(["-opt", str(cfg), "--device_bank"])
    exp = tmp_path / "exp" / "DASR_SRN_auto_reproduce"
    lines = [json.loads(ln) for ln in open(exp / "metrics.jsonl")]
    loss = [l for l in lines if "loss/l_g_pix" in l]
    assert loss and loss[-1]["step"] == 4
    assert all(np.isfinite(v) for l in loss for k, v in l.items()
               if k.startswith("loss/"))


def test_srn_banked_cli_mode_fallback(srn_corpus, tmp_path, capsys):
    """A non-DASR-mode config logs the gate reason and uses the host
    loader (no crash, no bank)."""
    from dasr_tpu.cli import srn_train

    cfg = _srn_cfg(srn_corpus, tmp_path,
                   extra={"train": None})  # placeholder, rebuilt below
    data = json.loads(cfg.read_text())
    # restore train block, then break the gate via update cadence
    shipped = json.load(open(os.path.join(
        os.path.dirname(__file__), "..", "dasr_tpu", "configs",
        "train_DASR_auto_reproduce.json")))
    data["train"] = shipped["train"]
    data["train"].update({"niter": 2, "val_freq": 99,
                          "G_update_inter": 2, "D_update_inter": 1})
    cfg.write_text(json.dumps(data))
    srn_train.main(["-opt", str(cfg), "--device_bank"])
    out = capsys.readouterr().out
    assert "G/D_update_inter != 1" in out and "using the host loader" in out


def test_adaptive_banked_step_matches_train_step():
    """DASRAdaptiveTrainer.train_banked_step (ddm_bank=None — the
    'LRHR_unpair' mode computes weights online) == train_step on the same
    sampled batch; the sampler's all-ones fake_w is ignored."""
    from dasr_tpu.train.dasr_adaptive_trainer import (
        AdaptiveConfig,
        DASRAdaptiveTrainer,
    )

    cfg = AdaptiveConfig(scale=4, nf=8, nb=1, gc=4, nb_ada=1, d_nf=8,
                         d_n_layers=1, feature_weight=0.0,
                         gan_H_target=0.005, use_patchD_opt=True, seed=3)
    tr = DASRAdaptiveTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=8)

    rng = np.random.default_rng(1)
    mk = lambda d, hw: ImageBank(
        jnp.asarray(d), jnp.asarray([[hw, hw]] * d.shape[0], np.int32)
    )
    fb = mk(rng.integers(0, 255, (3, 40, 40, 3), np.uint8), 40)
    hb = mk(rng.integers(0, 255, (3, 160, 160, 3), np.uint8), 160)
    rb = mk(rng.integers(0, 255, (2, 40, 40, 3), np.uint8), 40)

    idx = np.array([[0, 2]], np.int32)
    s1, m1 = tr.train_banked_step(state, fb, hb, rb, None, idx, 9, 32)

    key = jax.random.fold_in(jax.random.key(cfg.seed), np.uint32(9))
    _, sub = jax.random.split(key)
    batch = sample_dasr_batch(fb, hb, rb, None, jnp.asarray(idx[0]), sub,
                              32, 4, True, True)
    s2, m2 = tr.train_step(state, batch)
    for a, b in zip(jax.tree.leaves(s1.base.g.params),
                    jax.tree.leaves(s2.base.g.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-4, atol=1e-6)


def test_adaptive_banked_cli_runs(srn_corpus, tmp_path, capsys):
    """srn_train --device_bank with the DASR_Adaptive_Model +
    'LRHR_unpair' pair (3 banks, online DDM) on the conftest mesh."""
    from dasr_tpu.cli import srn_train

    shipped = os.path.join(
        os.path.dirname(__file__), "..", "dasr_tpu", "configs", "train",
        "train_DASR_Adaptive.json",
    )
    from dasr_tpu.core.config import _strip_json_comments

    cfg = json.loads(_strip_json_comments(open(shipped).read()))
    cfg["val_lpips"] = False
    cfg["network_G"].update({"nf": 16, "nb": 1, "gc": 8, "ada_nb": 1})
    cfg["network_D"].update({"nf": 16})
    cfg["datasets"]["train"].update({
        "batch_size": 2, "HR_size": 64, "n_workers": 2,
        "dataroot_HR": str(srn_corpus["hr"]),
        "dataroot_fake_LR": str(srn_corpus["fake_lr"]),
        "dataroot_real_LR": str(srn_corpus["real_lr"]),
    })
    cfg["datasets"]["val"].update({
        "dataroot_HR": str(srn_corpus["val_hr"]),
        "dataroot_LR": str(srn_corpus["val_lr"]),
    })
    cfg["path"]["root"] = str(tmp_path / "exp")
    cfg["train"].update({"niter": 2, "val_freq": 99})
    cfg["logger"].update({"print_freq": 1, "save_checkpoint_freq": 99})
    p = tmp_path / "ada.json"
    p.write_text(json.dumps(cfg))
    srn_train.main(["-opt", str(p), "--device_bank"])
    out = capsys.readouterr().out
    assert "device bank:" in out and "GiB resident" in out
    exp = tmp_path / "exp" / cfg["name"]
    lines = [json.loads(ln) for ln in open(exp / "metrics.jsonl")]
    loss = [l for l in lines if any(k.startswith("loss/") for k in l)]
    assert loss and loss[-1]["step"] == 2
    assert all(np.isfinite(v) for l in loss for k, v in l.items()
               if k.startswith("loss/"))
