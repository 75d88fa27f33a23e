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
