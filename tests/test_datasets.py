"""Dataset mode + loader tests on synthetic files."""

import numpy as np
import pytest

from dasr_tpu.data.datasets import create_dataset
from dasr_tpu.data.io import save_img
from dasr_tpu.data.pipeline import Loader


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    (root / "hr").mkdir()
    (root / "lr_fake").mkdir()
    (root / "lr_real").mkdir()
    (root / "ddm").mkdir()
    (root / "ddm_real").mkdir()
    (root / "mix").mkdir()
    for i in range(4):
        save_img(rng.random((96, 96, 3)).astype(np.float32), str(root / "hr" / f"i{i}.png"))
        save_img(rng.random((24, 24, 3)).astype(np.float32), str(root / "lr_fake" / f"i{i}.png"))
        save_img(rng.random((24, 24, 3)).astype(np.float32), str(root / "lr_real" / f"i{i}.png"))
        np.save(str(root / "ddm" / f"i{i}.npy"), rng.random((1, 1, 12, 12)).astype(np.float32))
        np.save(str(root / "ddm_real" / f"i{i}.npy"), rng.random((1, 1, 12, 12)).astype(np.float32))
        # mix dir: fake-prefixed + real files
        save_img(rng.random((24, 24, 3)).astype(np.float32), str(root / "mix" / f"fake_{i}.png"))
        save_img(rng.random((24, 24, 3)).astype(np.float32), str(root / "mix" / f"real_{i}.png"))
    return root


def _dasr_opt(root, mode):
    return {
        "mode": mode, "phase": "train", "scale": 4, "HR_size": 64,
        "dataroot_HR": str(root / "hr"),
        "dataroot_fake_LR": str(root / "lr_fake"),
        "dataroot_real_LR": str(root / "lr_real"),
        "dataroot_fake_weights": str(root / "ddm"),
        "dataroot_real_weights": str(root / "ddm_real"),
        "use_flip": True, "use_rot": True,
    }


def test_dasr_dataset_alignment(data_root):
    ds = create_dataset(_dasr_opt(data_root, "LRHR_wavelet_unpair_fake_weights_EQ"))
    item = ds.__getitem__(0, rng=np.random.default_rng(42))
    assert item["LR_fake"].shape == (16, 16, 3)
    assert item["HR"].shape == (64, 64, 3)
    assert item["fake_w"].shape == (16, 16, 1)
    assert item["LR_real"].shape == (16, 16, 3)
    assert item["HR_unpair"].shape == (64, 64, 3)


def test_eq_dataset_real_weights(data_root):
    ds = create_dataset(_dasr_opt(data_root, "LRHR_wavelet_unpair_fake_real_w_EQ"))
    item = ds.__getitem__(1, rng=np.random.default_rng(1))
    assert "real_w" in item and item["real_w"].shape == (16, 16, 1)


def test_unpair_dataset_no_weights(data_root):
    """LRHR_unpair (Adaptive mode) over plain PNG dirs: must not attempt
    any DDM load (regression: it used to default the weights dir to the
    fake-LR PNG dir and crash in np.load)."""
    opt = _dasr_opt(data_root, "LRHR_unpair")
    # an Adaptive config carries no weight roots at all
    opt.pop("dataroot_fake_weights")
    opt.pop("dataroot_real_weights")
    ds = create_dataset(opt)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert "fake_w" not in item
    assert item["LR_fake"].shape == (16, 16, 3)
    assert item["HR"].shape == (64, 64, 3)
    assert item["HR_unpair"].shape == (64, 64, 3)


def test_transfer_uint8_bit_exact(data_root):
    """transfer_uint8 items, cast to f32/255, must equal the f32 pipeline
    bit-for-bit (images originate as 8-bit PNGs; crops/flips are index ops)."""
    opt_f32 = _dasr_opt(data_root, "LRHR_wavelet_unpair_fake_weights_EQ")
    opt_u8 = dict(opt_f32, transfer_uint8=True)
    ds_f, ds_u = create_dataset(opt_f32), create_dataset(opt_u8)
    for i in range(3):
        a = ds_f.__getitem__(i, rng=np.random.default_rng(i))
        b = ds_u.__getitem__(i, rng=np.random.default_rng(i))
        for k in ("LR_fake", "LR_real", "HR", "HR_unpair"):
            assert b[k].dtype == np.uint8
            np.testing.assert_array_equal(
                a[k], b[k].astype(np.float32) / 255.0, err_msg=k
            )
        np.testing.assert_array_equal(a["fake_w"], b["fake_w"])  # stays f32


def test_facade_uint8_batch_matches_f32(data_root, tmp_path):
    """DASRModel.train_step on a uint8 batch == the same f32 batch exactly
    (the facade casts on device)."""
    import jax

    from dasr_tpu.models.registry import create_model

    opt = {
        "model": "DASR", "scale": 4,
        "network_G": {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4},
        "network_D": {"which_model_D": "discriminator_patch", "nf": 8,
                      "in_nc": 9, "n_layers": 1, "norm_type": "Batch"},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "fs": "wavelet",
                  "feature_weight": 0, "gan_H_target": 0.005,
                  "gan_H_source": 0},
        "path": {},
    }
    rng = np.random.default_rng(3)
    u8 = {
        "LR_fake": rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8),
        "LR_real": rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8),
        "HR": rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8),
        "HR_unpair": rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8),
        "fake_w": rng.random((2, 4, 4, 1)).astype(np.float32),
    }
    f32 = {
        k: (v.astype(np.float32) / 255.0 if v.dtype == np.uint8 else v)
        for k, v in u8.items()
    }

    m_a = create_model(opt).init(lr_size=8)
    import copy

    m_b = create_model(copy.deepcopy(opt)).init(lr_size=8)
    m_b.state = m_a.state
    m_a.train_step(f32)
    m_b.train_step(u8)
    for a, b in zip(
        jax.tree.leaves(m_a.state.g.params), jax.tree.leaves(m_b.state.g.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dsn_dataset_transfer_options(data_root):
    from dasr_tpu.data.datasets import DSNTrainDataset

    ds = DSNTrainDataset(
        str(data_root / "lr_real"), str(data_root / "hr"), crop_size=64,
        upscale_factor=4, transfer_uint8=True, device_bicubic=True,
    )
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert "bicubic" not in item
    assert item["input"].dtype == np.uint8 and item["input"].shape == (64, 64, 3)
    assert item["disc"].dtype == np.uint8 and item["disc"].shape == (16, 16, 3)

    # host-bicubic from a u8 crop == from the f32 pipeline
    ds_u8 = DSNTrainDataset(
        str(data_root / "lr_real"), str(data_root / "hr"), crop_size=64,
        upscale_factor=4, transfer_uint8=True,
    )
    ds_f32 = DSNTrainDataset(
        str(data_root / "lr_real"), str(data_root / "hr"), crop_size=64,
        upscale_factor=4,
    )
    a = ds_u8.__getitem__(1, rng=np.random.default_rng(1))
    b = ds_f32.__getitem__(1, rng=np.random.default_rng(1))
    np.testing.assert_allclose(a["bicubic"], b["bicubic"], atol=1e-7)
    np.testing.assert_array_equal(a["input"].astype(np.float32) / 255.0, b["input"])


def test_mix_dataset(data_root):
    opt = {
        "mode": "LRHR_wavelet_unpair", "phase": "train", "scale": 4,
        "HR_size": 64, "prefix": "fake",
        "dataroot_HR": str(data_root / "hr"),
        "dataroot_LR": str(data_root / "mix"),
        "dataroot_weights": str(data_root / "ddm"),
    }
    ds = create_dataset(opt)
    flags = set()
    for i in range(len(ds)):
        item = ds.__getitem__(i, rng=np.random.default_rng(i))
        assert item["LR"].shape == (16, 16, 3)
        assert item["HR"].shape == (64, 64, 3)
        assert item["weights"].shape[:2] == (64, 64)
        flags.add(float(item["is_fake"]))
    assert flags == {0.0, 1.0}  # both branches exercised


def test_trans_dataset_ref(data_root):
    opt = _dasr_opt(data_root, "LRHR_Trans_Wavelet_GAN")
    opt["dataroot_ref"] = str(data_root / "hr")
    ds = create_dataset(opt)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["ref"].shape == (64, 64, 3)


def test_loader_determinism(data_root):
    ds = create_dataset(_dasr_opt(data_root, "LRHR_wavelet_unpair_fake_weights_EQ"))
    l1 = Loader(ds, batch_size=2, num_workers=2, seed=7)
    l2 = Loader(ds, batch_size=2, num_workers=2, seed=7)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_allclose(b1["HR"], b2["HR"])
    assert b1["HR"].shape == (2, 64, 64, 3)
    # different epoch -> different batch
    l1.set_epoch(1)
    b3 = next(iter(l1))
    assert np.abs(b3["HR"] - b1["HR"]).max() > 0


def test_loader_propagates_worker_errors(data_root):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i, rng=None):
            raise ValueError("broken item")

    loader = Loader(Broken(), batch_size=2, num_workers=2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="broken item"):
        next(iter(loader))


def test_decode_cache_exact_and_bounded(tmp_path, rng):
    """enable_decode_cache returns byte-identical reads, read-only entries,
    and respects the budget."""
    from dasr_tpu.data import io as dio

    paths = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.png")
        dio.save_img(rng.random((32, 32, 3)).astype(np.float32), p)
        paths.append(p)

    cold = [dio.read_img(p) for p in paths]
    cold_u8 = [dio.read_img_u8(p) for p in paths]
    try:
        dio.enable_decode_cache(1.0)
        warm1 = [dio.read_img(p) for p in paths]  # populates
        warm2 = [dio.read_img(p) for p in paths]  # hits
        for a, b, c in zip(cold, warm1, warm2):
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(a, c)
        for a, b in zip(cold_u8, [dio.read_img_u8(p) for p in paths]):
            np.testing.assert_array_equal(a, b)
        # cached u8 reads are read-only views; float reads stay writable
        assert not dio.read_img_u8(paths[0]).flags.writeable
        assert dio.read_img(paths[0]).flags.writeable
        # zero budget caches nothing
        dio.enable_decode_cache(0)
        assert not dio._CACHE
        got = dio.read_img_u8(paths[0])
        np.testing.assert_array_equal(got, cold_u8[0])
    finally:
        dio.enable_decode_cache(0)


def test_ceil_size_fake_lr_crops_stack(tmp_path, rng):
    """Non-scale-multiple HR (e.g. 94 px) + ceil-size fake LR (24 px): the
    aligned crop must stay inside the HR so batches stack (the reference's
    latent truncate-then-collate crash; users had to modcrop first)."""
    for d in ("hr", "lr_fake", "lr_real", "ddm"):
        (tmp_path / d).mkdir()
    for i in range(4):
        save_img(rng.random((94, 94, 3)).astype(np.float32),
                 str(tmp_path / "hr" / f"i{i}.png"))
        save_img(rng.random((24, 24, 3)).astype(np.float32),  # ceil(94/4)
                 str(tmp_path / "lr_fake" / f"i{i}.png"))
        save_img(rng.random((24, 24, 3)).astype(np.float32),
                 str(tmp_path / "lr_real" / f"i{i}.png"))
        np.save(str(tmp_path / "ddm" / f"i{i}.npy"),
                rng.random((1, 1, 24, 24)).astype(np.float32))
    ds = create_dataset({
        "mode": "LRHR_wavelet_unpair_fake_weights_EQ", "phase": "train",
        "scale": 4, "HR_size": 64,
        "dataroot_HR": str(tmp_path / "hr"),
        "dataroot_fake_LR": str(tmp_path / "lr_fake"),
        "dataroot_real_LR": str(tmp_path / "lr_real"),
        "dataroot_fake_weights": str(tmp_path / "ddm"),
        "use_flip": True, "use_rot": True,
    })
    for epoch in range(3):
        for batch in Loader(ds, batch_size=4, num_workers=2, seed=epoch):
            assert batch["HR"].shape == (4, 64, 64, 3)
            assert batch["LR_fake"].shape == (4, 16, 16, 3)
