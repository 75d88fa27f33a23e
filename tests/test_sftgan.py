"""SFTNet .pth importer parity vs a torch functional oracle, and the
sftgan_test CLI end-to-end on synthetic weights.

The oracle implements the reference SFT_Net's *documented* architecture
(codes/SRN/models/modules/sft_arch.py:40-75 — CondNet, SFT residual trunk,
pixel-shuffle HR branch) directly with torch.nn.functional ops reading a
reference-format state dict, so the importer's name map and the
PixelShuffle channel-order permutation are both pinned numerically.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _make_reference_sd(rng, n_blocks=2):
    """Random reference-format SFT_Net state dict (conv0 takes 3 channels —
    the published SFTGAN layout; the in-repo sft_arch.py says 4 but its
    forward is the broken/bypassed one)."""
    sd = {}

    def conv(name, cin, cout, k):
        sd[name + ".weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, k, k)).astype(np.float32)
        )
        sd[name + ".bias"] = torch.tensor(
            rng.normal(0, 0.1, (cout,)).astype(np.float32)
        )

    def sft_layer(prefix):
        conv(prefix + ".SFT_scale_conv0", 32, 32, 1)
        conv(prefix + ".SFT_scale_conv1", 32, 64, 1)
        conv(prefix + ".SFT_shift_conv0", 32, 32, 1)
        conv(prefix + ".SFT_shift_conv1", 32, 64, 1)

    conv("conv0", 3, 64, 3)
    for i in range(n_blocks):
        sft_layer(f"sft_branch.{i}.sft0")
        conv(f"sft_branch.{i}.conv0", 64, 64, 3)
        sft_layer(f"sft_branch.{i}.sft1")
        conv(f"sft_branch.{i}.conv1", 64, 64, 3)
    sft_layer(f"sft_branch.{n_blocks}")
    conv(f"sft_branch.{n_blocks + 1}", 64, 64, 3)
    conv("HR_branch.0", 64, 256, 3)
    conv("HR_branch.3", 64, 256, 3)
    conv("HR_branch.6", 64, 64, 3)
    conv("HR_branch.8", 64, 3, 3)
    conv("CondNet.0", 8, 128, 4)
    for j in (2, 4, 6):
        conv(f"CondNet.{j}", 128, 128, 1)
    conv("CondNet.8", 128, 32, 1)
    return sd


def _torch_forward(sd, img_chw, seg_chw, n_blocks=2):
    def conv(x, name, stride=1, pad=0):
        return F.conv2d(x, sd[name + ".weight"], sd[name + ".bias"],
                        stride=stride, padding=pad)

    def lrelu(x):
        return F.leaky_relu(x, 0.1)

    def sft(fea, cond, prefix):
        scale = conv(lrelu(conv(cond, prefix + ".SFT_scale_conv0")),
                     prefix + ".SFT_scale_conv1")
        shift = conv(lrelu(conv(cond, prefix + ".SFT_shift_conv0")),
                     prefix + ".SFT_shift_conv1")
        return fea * (scale + 1) + shift

    cond = lrelu(conv(seg_chw, "CondNet.0", stride=4))
    for j in (2, 4, 6):
        cond = lrelu(conv(cond, f"CondNet.{j}"))
    cond = conv(cond, "CondNet.8")

    fea = conv(img_chw, "conv0", pad=1)
    h = fea
    for i in range(n_blocks):
        r = sft(h, cond, f"sft_branch.{i}.sft0")
        r = F.relu(conv(r, f"sft_branch.{i}.conv0", pad=1))
        r = sft(r, cond, f"sft_branch.{i}.sft1")
        r = conv(r, f"sft_branch.{i}.conv1", pad=1)
        h = h + r
    h = sft(h, cond, f"sft_branch.{n_blocks}")
    h = conv(h, f"sft_branch.{n_blocks + 1}", pad=1)
    h = fea + h
    h = F.relu(F.pixel_shuffle(conv(h, "HR_branch.0", pad=1), 2))
    h = F.relu(F.pixel_shuffle(conv(h, "HR_branch.3", pad=1), 2))
    h = F.relu(conv(h, "HR_branch.6", pad=1))
    return conv(h, "HR_branch.8", pad=1)


def test_sftnet_import_parity():
    from dasr_tpu.nn.sft import SFTNet
    from dasr_tpu.train.checkpoints import import_sftnet_params

    rng = np.random.default_rng(0)
    n_blocks = 2
    sd = _make_reference_sd(rng, n_blocks)

    img = rng.random((1, 12, 12, 3)).astype(np.float32)
    seg = rng.random((1, 48, 48, 8)).astype(np.float32)

    ref = _torch_forward(
        sd,
        torch.tensor(img.transpose(0, 3, 1, 2)),
        torch.tensor(seg.transpose(0, 3, 1, 2)),
        n_blocks,
    ).numpy().transpose(0, 2, 3, 1)

    variables = import_sftnet_params(
        {k: v.numpy() for k, v in sd.items()}, n_blocks=n_blocks
    )
    out = SFTNet(n_blocks=n_blocks).apply(variables, img, seg)
    # random 0.1-std weights blow activations up to ~5e2 through the 256-wide
    # sums; 1e-3 abs here is ~2e-6 relative
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


def test_sftgan_cli(tmp_path):
    from dasr_tpu.cli import sftgan_test
    from dasr_tpu.data.io import save_img

    rng = np.random.default_rng(1)
    sd = _make_reference_sd(rng, n_blocks=2)
    model_path = str(tmp_path / "sft.pth")
    torch.save(sd, model_path)

    img_dir, seg_dir, out_dir = (
        str(tmp_path / d) for d in ("imgs", "segs", "out")
    )
    os.makedirs(img_dir), os.makedirs(seg_dir)
    save_img(rng.random((40, 44, 3)).astype(np.float32),
             os.path.join(img_dir, "a.png"))
    # modcrop(8) -> 40x40, /4 -> 10x10 LR; seg maps live at HR scale (x4)
    torch.save(torch.tensor(rng.random((8, 40, 40)).astype(np.float32)),
               os.path.join(seg_dir, "a_bic.pth"))

    sftgan_test.main([
        "--model", model_path, "--img_dir", img_dir, "--seg_dir", seg_dir,
        "--out", out_dir, "--n_blocks", "2",
    ])
    from dasr_tpu.data.io import read_img

    out = read_img(os.path.join(out_dir, "a_rlt.png"))
    assert out.shape == (40, 40, 3)


def test_sftnet_export_import_roundtrip(rng):
    """export_sftnet_state_dict is the exact inverse of
    import_sftnet_params (incl. the PixelShuffle channel permutation)."""
    import jax
    import jax.numpy as jnp

    from dasr_tpu.nn.sft import SFTNet
    from dasr_tpu.train.checkpoints import (
        export_sftnet_state_dict,
        import_sftnet_params,
    )

    n_blocks = 2
    model = SFTNet(n_blocks=n_blocks)
    variables = model.init(
        jax.random.key(3), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 32, 32, 8))
    )
    img = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    seg = jnp.asarray(rng.random((1, 32, 32, 8)).astype(np.float32))
    want = np.asarray(model.apply(variables, img, seg))

    sd = export_sftnet_state_dict(variables, n_blocks=n_blocks)
    back = import_sftnet_params(
        {k: v.numpy() for k, v in sd.items()}, n_blocks=n_blocks
    )
    got = np.asarray(model.apply(back, img, seg))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_transfer_params_sft_surgery(tmp_path, rng):
    """--sft grafts the SRResNet torso into a fresh SFT net exactly like
    transfer_params_sft.py:17-37; everything else is kaiming*0.1 weights /
    zero biases; the result round-trips through import_sftnet_params."""
    from dasr_tpu.scripts.transfer_params import main as tp_main

    nb = 2

    def conv(sd, name, cin, cout, k=3):
        sd[name + ".weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, k, k)).astype(np.float32)
        )
        sd[name + ".bias"] = torch.tensor(
            rng.normal(0, 0.1, (cout,)).astype(np.float32)
        )

    # SRResNet-shaped source (model.* naming, scripts/SRN.py layout)
    src = {}
    conv(src, "model.0", 3, 64)
    for i in range(nb):
        conv(src, f"model.1.sub.{i}.res.0", 64, 64)
        conv(src, f"model.1.sub.{i}.res.2", 64, 64)
    conv(src, f"model.1.sub.{nb}", 64, 64)
    conv(src, "model.2", 64, 256)
    conv(src, "model.5", 64, 256)
    conv(src, "model.8", 64, 64)
    conv(src, "model.10", 64, 3)
    src_path = os.path.join(tmp_path, "srresnet.pth")
    torch.save(src, src_path)

    out_path = os.path.join(tmp_path, "sft_ini.pth")
    tp_main(["--src", src_path, "--out", out_path, "--sft",
             "--sft_nb", str(nb)])

    out = torch.load(out_path, weights_only=True)
    # grafted torso is bit-equal to the source
    for dst, s in [
        ("conv0", "model.0"),
        (f"sft_branch.0.conv0", "model.1.sub.0.res.0"),
        (f"sft_branch.{nb + 1}", f"model.1.sub.{nb}"),
        ("HR_branch.0", "model.2"),
        ("HR_branch.8", "model.10"),
    ]:
        np.testing.assert_array_equal(
            out[dst + ".weight"].numpy(), src[s + ".weight"].numpy(), err_msg=dst
        )
        np.testing.assert_array_equal(
            out[dst + ".bias"].numpy(), src[s + ".bias"].numpy(), err_msg=dst
        )
    # fresh parts: zero biases, nonzero small weights
    assert float(out["CondNet.0.bias"].abs().max()) == 0.0
    assert float(out["sft_branch.0.sft0.SFT_scale_conv0.bias"].abs().max()) == 0.0
    w = out["CondNet.0.weight"].numpy()
    assert 0 < np.abs(w).max() < 0.2
    # and the result is importable as a flax SFTNet
    from dasr_tpu.train.checkpoints import import_sftnet_params

    params = import_sftnet_params(
        {k: v.numpy() for k, v in out.items()}, n_blocks=nb
    )
    from dasr_tpu.nn.sft import SFTNet
    import jax.numpy as jnp

    y = SFTNet(n_blocks=nb).apply(
        params,
        jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32)),
        jnp.asarray(rng.random((1, 32, 32, 8)).astype(np.float32)),
    )
    assert y.shape == (1, 32, 32, 3) and bool(jnp.isfinite(y).all())
