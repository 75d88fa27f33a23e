"""LPIPS pipeline numeric parity with synthetic weights on both sides.

The image has no egress, so the real torchvision backbone cannot be
downloaded; this test instead generates a random alexnet-format state dict
+ random v0.1-format lin heads, loads them through the SAME importer the
parity harness uses (losses/lpips.py:load_lpips_params), and checks the
flax LPIPS value against a torch *functional* oracle implementing the
documented net-lin algorithm (codes/PerceptualSimilarity/models/
networks_basic.py:27-111). This verifies the whole pipeline; only the
weight *values* await the published files (see PARITY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dasr_tpu.losses.lpips import LPIPS, load_lpips_params

_ALEX_CONV_IDS = (0, 3, 6, 8, 10)
_ALEX_SHAPES = [
    (64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
    (256, 384, 3, 3), (256, 256, 3, 3),
]
_CHNS = (64, 192, 384, 256, 256)


def _make_backbone_sd():
    g = torch.Generator().manual_seed(7)
    sd = {}
    for i, shp in zip(_ALEX_CONV_IDS, _ALEX_SHAPES):
        sd[f"features.{i}.weight"] = torch.randn(*shp, generator=g) * 0.05
        sd[f"features.{i}.bias"] = torch.randn(shp[0], generator=g) * 0.01
    return sd


def _make_lin_sd():
    g = torch.Generator().manual_seed(8)
    return {
        f"lin{k}.model.1.weight": torch.rand(1, c, 1, 1, generator=g) * 0.1
        for k, c in enumerate(_CHNS)
    }


def _torch_lpips(bsd, lsd, a, b):
    """Functional net-lin alex LPIPS per the documented algorithm."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        outs = []
        cfg = [(0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1)]
        pools_after = {0: True, 1: True}  # maxpool3x3/2 after taps 0 and 1
        for t, (i, s, p) in enumerate(cfg):
            x = F.conv2d(x, bsd[f"features.{i}.weight"], bsd[f"features.{i}.bias"],
                         stride=s, padding=p)
            x = F.relu(x)
            outs.append(x)
            if pools_after.get(t):
                x = F.max_pool2d(x, 3, 2)
        return outs

    fa, fb = feats(a), feats(b)
    total = 0.0
    for k in range(5):
        na = fa[k] / (fa[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = fb[k] / (fb[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        diff = (na - nb) ** 2
        w = lsd[f"lin{k}.model.1.weight"]
        d = F.conv2d(diff, w)
        total = total + d.mean(dim=(2, 3), keepdim=True)
    return total


def test_lpips_synthetic_weight_parity(tmp_path, rng):
    bsd, lsd = _make_backbone_sd(), _make_lin_sd()
    bpath, lpath = str(tmp_path / "alex.pth"), str(tmp_path / "lin.pth")
    torch.save(bsd, bpath)
    torch.save(lsd, lpath)

    lpips = LPIPS(net="alex")
    z = jnp.zeros((1, 64, 64, 3))
    base = lpips.init(jax.random.PRNGKey(0), z, z)
    variables = load_lpips_params(
        "alex", lin_path=lpath, backbone_path=bpath, base_params=base
    )

    a = rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1
    b = rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1
    got = float(lpips.apply(variables, jnp.asarray(a), jnp.asarray(b)).sum())

    want = float(_torch_lpips(
        bsd, lsd,
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)),
    ).sum())
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_parity_cli_runs_random_init(tmp_path, rng, capsys):
    """The harness runs end to end without weights, with the banner."""
    import json as _json

    from dasr_tpu.data.io import save_img
    from dasr_tpu.cli import parity

    hr, lr = tmp_path / "hr", tmp_path / "lr"
    hr.mkdir(), lr.mkdir()
    for i in range(2):
        save_img(rng.random((64, 64, 3)).astype(np.float32), str(hr / f"{i}.png"))
        save_img(rng.random((16, 16, 3)).astype(np.float32), str(lr / f"{i}.png"))
    out = tmp_path / "report.md"
    avg = parity.main([
        "--hr_dir", str(hr), "--lr_dir", str(lr), "--nb", "1", "--nf", "8",
        "--gc", "4", "--out", str(out),
    ])
    assert np.isfinite(avg["psnr"]) and "lpips" in avg
    text = out.read_text()
    assert "WEIGHTS NOT SUPPLIED" in text and "RANDOM-INIT" in text
    last = capsys.readouterr().out.strip().splitlines()[-1]
    payload = _json.loads(last)
    assert payload["weights_supplied"] is False


def test_default_lpips_variables_env_backbone(tmp_path, monkeypatch):
    """default_lpips_variables honors DASR_TPU_LPIPS_BACKBONE (and an
    explicit backbone_path), so the TRAINING CLIs consume user-supplied
    torchvision weights, not just the eval CLIs."""
    from dasr_tpu.losses.lpips import default_lpips_variables

    bpath = str(tmp_path / "alexnet.pth")
    torch.save(_make_backbone_sd(), bpath)

    base = default_lpips_variables("alex")
    monkeypatch.setenv("DASR_TPU_LPIPS_BACKBONE", bpath)
    via_env = default_lpips_variables("alex")
    via_arg = default_lpips_variables("alex", backbone_path=bpath)

    sd = _make_backbone_sd()
    want = sd["features.0.weight"].numpy().transpose(2, 3, 1, 0)
    for vars_, label in ((via_env, "env"), (via_arg, "arg")):
        got = np.asarray(vars_["params"]["backbone"]["stack"]["conv0"]["kernel"])
        np.testing.assert_allclose(got, want, atol=1e-7, err_msg=label)
    # without the env var the backbone stays at its deterministic init
    base2 = np.asarray(base["params"]["backbone"]["stack"]["conv0"]["kernel"])
    assert np.abs(base2 - want).max() > 1e-3
