"""Tests for offline tools, LPIPS CLIs/training, and self-ensemble."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.data.io import save_img


def test_net_interp_blends(tmp_path, rng):
    from dasr_tpu.nn.generators import RRDBNet
    from dasr_tpu.scripts.net_interp import interpolate_params
    from dasr_tpu.train.checkpoints import restore_checkpoint, save_checkpoint

    m = RRDBNet(nf=8, nb=1, gc=4)
    va = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    vb = m.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    blended = interpolate_params(va, vb, 0.25)
    la = jax.tree.leaves(va)[0]
    lb = jax.tree.leaves(vb)[0]
    lm = jax.tree.leaves(blended)[0]
    np.testing.assert_allclose(lm, 0.75 * np.asarray(la) + 0.25 * np.asarray(lb), atol=1e-6)
    # round trip through orbax
    save_checkpoint(str(tmp_path / "ck"), blended, 0)
    restored, step = restore_checkpoint(str(tmp_path / "ck"))
    assert step == 0


def test_transfer_params_copies_matching(rng):
    from dasr_tpu.nn.generators import RRDBNet
    from dasr_tpu.scripts.transfer_params import transfer

    src_m = RRDBNet(nf=8, nb=1, gc=4, upscale=2)
    dst_m = RRDBNet(nf=8, nb=1, gc=4, upscale=4)
    src = src_m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    dst = dst_m.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    merged, copied = transfer(src, dst)
    assert copied > 0
    # trunk conv weights copied from src
    s0 = np.asarray(jax.tree.leaves(src["params"]["conv_block_0"])[0])
    m0 = np.asarray(jax.tree.leaves(merged["params"]["conv_block_0"])[0])
    np.testing.assert_allclose(m0, s0)


def test_back_projection_reduces_lr_error(rng):
    from dasr_tpu.ops.resize import imresize_np
    from dasr_tpu.scripts.misc_tools import back_projection

    hr = rng.random((32, 32, 3))
    lr = imresize_np(hr, 0.25)
    sr0 = np.clip(hr + rng.normal(0, 0.05, hr.shape), 0, 1)
    err0 = np.abs(imresize_np(sr0, 0.25) - lr).mean()
    sr = back_projection(sr0, lr, 4, n_iters=5)
    err1 = np.abs(imresize_np(sr, 0.25) - lr).mean()
    assert err1 < err0 * 0.5


def test_misc_tools_color2gray_and_rename(tmp_path, rng):
    from dasr_tpu.scripts import misc_tools

    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(3):
        save_img(rng.random((8, 8, 3)).astype(np.float32), str(src / f"a{i}.png"))
    misc_tools.main(["color2gray", "--input_dir", str(src), "--out", str(tmp_path / "gray")])
    assert len(os.listdir(tmp_path / "gray")) == 3


def test_misc_tools_rf_table_and_param_count(capsys):
    """rf_table reproduces the reference receptive_cal FSD numbers
    (DSN/receptive_cal.py __main__: rf 17, jump 1 after 4 5x5/s1 convs) and
    param_count reproduces the known ESRGAN RRDB size."""
    from dasr_tpu.scripts import misc_tools

    misc_tools.main(["rf_table", "--net", "FSD", "--imsize", "64"])
    out = capsys.readouterr().out
    last = [l for l in out.strip().splitlines() if l.strip().startswith("4")][-1]
    cols = last.split()
    assert cols[4:7] == ["64", "1", "17"], cols

    misc_tools.main(["rf_table", "--net", "nld_s2", "--imsize", "64"])
    out = capsys.readouterr().out
    assert "16" in out  # stride-2 stack halves n twice

    misc_tools.main(["param_count", "--which_model_G", "RRDB_net"])
    out = capsys.readouterr().out
    assert "16,697,987" in out


def test_misc_tools_extract_enlarge_patches(tmp_path, rng):
    from dasr_tpu.data.io import read_img
    from dasr_tpu.scripts import misc_tools

    src = tmp_path / "ori"
    src.mkdir()
    img = rng.random((64, 64, 3)).astype(np.float32)
    save_img(img, str(src / "fig.png"))
    misc_tools.main([
        "extract_enlarge_patches", "--input_dir", str(src),
        "--out", str(tmp_path / "figs"), "--h_start", "10", "--h_len", "16",
        "--w_start", "20", "--w_len", "24", "--ratio", "2",
        "--line_width", "2", "--color", "green",
    ])
    patch = read_img(str(tmp_path / "figs" / "patch" / "fig_patch.png"))
    assert patch.shape == (32, 48, 3)  # 16x24 enlarged x2
    rect = read_img(str(tmp_path / "figs" / "rect" / "fig_rect.png"))
    assert rect.shape == img.shape
    # border pixels painted green, interior patch preserved
    np.testing.assert_allclose(rect[9, 21], [0.0, 1.0, 0.0], atol=2 / 255)
    np.testing.assert_allclose(rect[12, 22], img[12, 22], atol=2 / 255)


def test_compute_dists_pair_cli(tmp_path, rng):
    from dasr_tpu.cli import compute_dists

    a = rng.random((32, 32, 3)).astype(np.float32)
    save_img(a, str(tmp_path / "a.png"))
    save_img(np.clip(a + 0.2, 0, 1), str(tmp_path / "b.png"))
    d_same = compute_dists.main(["pair", "-p0", str(tmp_path / "a.png"), "-p1", str(tmp_path / "a.png")])
    d_diff = compute_dists.main(["pair", "-p0", str(tmp_path / "a.png"), "-p1", str(tmp_path / "b.png")])
    assert d_same < 1e-6
    assert d_diff > d_same


def test_compute_dists_dirs_html_report(tmp_path, rng):
    from dasr_tpu.cli import compute_dists

    d0, d1 = tmp_path / "d0", tmp_path / "d1"
    d0.mkdir(), d1.mkdir()
    for i in range(2):
        a = rng.random((16, 16, 3)).astype(np.float32)
        save_img(a, str(d0 / f"{i}.png"))
        save_img(np.clip(a + 0.1 * (i + 1), 0, 1), str(d1 / f"{i}.png"))
    html_dir = tmp_path / "report"
    mean = compute_dists.main([
        "dirs", "-d0", str(d0), "-d1", str(d1), "--model", "l2",
        "--html", str(html_dir),
    ])
    assert mean > 0
    index = (html_dir / "index.html").read_text()
    assert "0.png" in index and "<table>" in index
    assert len(os.listdir(html_dir / "images")) == 4


def test_sr_model_test_async_chop_path(rng):
    """test_async must interoperate with the chop/tiled inference paths
    (which may return host arrays) — np.asarray drains either."""
    from dasr_tpu.models.registry import create_model

    opt = {
        "model": "sr", "scale": 4, "chop": True, "chop_parity": True,
        "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
        "train": {}, "path": {},
    }
    m = create_model(opt).init(lr_size=8)
    m.chop_threshold = 0  # force the chop path on a small image
    x = rng.random((24, 24, 3)).astype(np.float32)
    out_async = np.asarray(m.test_async(x))
    out_sync = m.test(x)
    assert out_async.shape == (96, 96, 3)
    np.testing.assert_array_equal(out_async, out_sync)


def test_sr_model_loads_full_training_state(tmp_path, rng):
    """pretrain_model_G may point at a *full* DASR training-state orbax dir
    (g/d_target/... TrainState trees); load_network must unwrap g.params."""
    from dasr_tpu.models.registry import create_model

    opt = {
        "model": "DASR",
        "scale": 4,
        "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
        "network_D": {"which_model_D": "discriminator_patch", "nf": 8,
                      "in_nc": 9, "n_layers": 1, "norm_type": "Batch"},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "fs": "wavelet",
                  "gan_H_target": 0.005, "gan_H_source": 0},
        "path": {},
    }
    dasr = create_model(opt).init(lr_size=8)
    state_dir = str(tmp_path / "training_state")
    dasr.save(state_dir, 5)

    sr_opt = {
        "model": "sr", "scale": 4,
        "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
        "train": {},
        "path": {"pretrain_model_G": state_dir},
    }
    sr = create_model(sr_opt)
    sr.load()
    out = sr.test(rng.random((8, 8, 3)).astype(np.float32))
    assert out.shape == (32, 32, 3)
    # loaded G must equal the DASR state's generator params
    import jax

    g_params = dasr.state.g.params
    leaves_a = jax.tree.leaves(sr.params)
    leaves_b = jax.tree.leaves(g_params)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_twoafc_training_step(rng):
    from dasr_tpu.losses.lpips import LPIPS
    from dasr_tpu.losses.lpips_train import TwoAFCTrainer

    lpips = LPIPS(net="alex")
    z = jnp.zeros((1, 64, 64, 3))
    variables = lpips.init(jax.random.key(0), z, z)
    tr = TwoAFCTrainer()
    trainable, backbone, opt_state = tr.init(jax.random.key(1), variables)
    batch = {
        "ref": jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32)) * 2 - 1,
        "p0": jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32)) * 2 - 1,
        "p1": jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32)) * 2 - 1,
        "judge": jnp.ones((2, 1, 1, 1)) * 0.8,
    }
    new_tr, opt_state, metrics = tr.step(trainable, opt_state, backbone, batch)
    assert np.isfinite(float(metrics["loss"]))
    # lins stay nonnegative after clamping
    for w in jax.tree.leaves(new_tr["lins"]):
        assert float(jnp.min(w)) >= 0.0


def test_sr_model_x8_self_ensemble(rng):
    from dasr_tpu.models.registry import create_model

    opt = {"model": "sr", "scale": 4,
           "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
           "train": {"lr_G": 1e-4, "lr_steps": [10]}}
    m = create_model(opt).init(lr_size=8)
    lr = rng.random((8, 8, 3)).astype(np.float32)
    out = m.test_x8(lr)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


def test_sr_model_save_load_roundtrip(tmp_path, rng):
    from dasr_tpu.models.registry import create_model

    opt = {"model": "sr", "scale": 4,
           "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
           "train": {"lr_G": 1e-4, "lr_steps": [10]}}
    m = create_model(opt).init(lr_size=8)
    m.save(str(tmp_path), 7)
    m2 = create_model(opt).init(lr_size=8)
    m2.load_network(str(tmp_path / "G"))
    lr = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(m.test(lr), m2.test(lr), atol=1e-6)


def test_dsn_wgan_step(rng):
    import jax

    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer

    cfg = DSNConfig(num_res_blocks=1, wgan=True, use_per_loss=False)
    tr = DSNTrainer(cfg)
    state = tr.init_state(jax.random.key(0), lr_size=16, hr_size=64)
    batch = {
        "input": rng.random((2, 64, 64, 3)).astype(np.float32),
        "bicubic": rng.random((2, 16, 16, 3)).astype(np.float32),
        "disc": rng.random((2, 16, 16, 3)).astype(np.float32),
    }
    state, metrics = tr.train_step(state, batch)
    assert np.isfinite(float(metrics["loss/d_tex_loss"]))
    assert np.isfinite(float(metrics["loss/g_tex_loss"]))


def test_auto_test_cli(tmp_path, rng):
    import json

    from dasr_tpu.cli import auto_test
    from dasr_tpu.models.registry import create_model

    # save one checkpoint then sweep it with a minimal test JSON
    opt = {"model": "sr", "scale": 4,
           "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
           "train": {"lr_G": 1e-4, "lr_steps": [10]}}
    m = create_model(opt).init(lr_size=8)
    models_dir = tmp_path / "models"
    m.save(str(models_dir), 3)

    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    save_img(rng.random((8, 8, 3)).astype(np.float32), str(lr_dir / "x.png"))
    cfg = {
        "name": "sweep", "model": "sr", "scale": 4, "chop": False,
        "datasets": {"test_1": {"name": "t", "mode": "LR",
                                 "dataroot_LR": str(lr_dir)}},
        "path": {"root": str(tmp_path / "out")},
        "network_G": opt["network_G"],
        "train": opt["train"],
    }
    tpl = tmp_path / "test.json"
    tpl.write_text(json.dumps(cfg))
    auto_test.main(["-opt", str(tpl), "--models_dir", str(models_dir / "G")])
    assert (tmp_path / "out" / "results" / "sweep_3" / "t" / "x.png").exists()


def test_add_corruptions_cli(tmp_path, rng):
    """add_corruptions: all three corruption modes write images of the same
    size with the expected degradations (reference: DSN/add_corruptions.py
    defaults std 8 / blur 1.6 / quality 30)."""
    from dasr_tpu.cli import add_corruptions
    from dasr_tpu.data.io import read_img, save_img

    src = tmp_path / "in"
    src.mkdir()
    base = rng.random((32, 32, 3)).astype(np.float32)
    save_img(base, str(src / "a.png"))

    for mode in ("noise", "blur", "jpeg"):
        out = tmp_path / mode
        add_corruptions.main([
            "--input_dir", str(src), "--output_dir", str(out),
            "--corruption", mode,
        ])
        img = read_img(str(out / "a.png"))  # jpeg mode roundtrips in-memory
        assert img.shape == (32, 32, 3)
        diff = float(np.abs(img - base).mean())
        assert diff > 1e-4, mode  # actually corrupted
        # a pure-noise source is the worst case for blur/jpeg: both strip
        # most high-frequency energy, so just cap the damage loosely
        assert diff < 0.35, mode


def test_test_dataloader_cli(tmp_path, rng):
    """test_dataloader: dumps dataloader output crops for eyeballing
    (reference: SRN/test_dataloader.py)."""
    import json

    from dasr_tpu.cli import test_dataloader
    from dasr_tpu.data.io import save_img

    hr_dir, lr_dir = tmp_path / "hr", tmp_path / "lr"
    hr_dir.mkdir(), lr_dir.mkdir()
    for i in range(2):
        save_img(rng.random((64, 64, 3)).astype(np.float32),
                 str(hr_dir / f"{i}.png"))
        save_img(rng.random((16, 16, 3)).astype(np.float32),
                 str(lr_dir / f"{i}.png"))
    cfg = {
        "name": "dl", "scale": 4,
        "datasets": {"train": {"name": "x", "mode": "LRHR",
                               "dataroot_HR": str(hr_dir),
                               "dataroot_LR": str(lr_dir),
                               "batch_size": 1, "HR_size": 32,
                               "use_flip": True, "use_rot": True,
                               "n_workers": 0}},
        "path": {"root": str(tmp_path)},
    }
    opt_path = tmp_path / "dl.json"
    opt_path.write_text(json.dumps(cfg))
    out = tmp_path / "vis"
    test_dataloader.main(["-opt", str(opt_path), "--out", str(out), "--n", "2"])
    dumped = os.listdir(out)
    assert len(dumped) >= 2 and any(f.endswith(".png") for f in dumped)
