"""LPIPS DistModel breadth: squeezenet backbone, v0.0 heads, L2/DSSIM.

(reference: codes/PerceptualSimilarity/models/dist_model.py:40-73,
pretrained_networks.py:6-42, networks_basic.py:66-67 & 150-185)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dasr_tpu.losses.lpips import (
    LPIPS,
    create_dist_model,
    dssim_distance,
    l2_distance,
    load_lpips_params,
    reference_lin_weights_path,
)

_FIRES = {3: (16, 64), 4: (16, 64), 6: (32, 128), 7: (32, 128),
          9: (48, 192), 10: (48, 192), 11: (64, 256), 12: (64, 256)}
_FIRE_IN = {3: 64, 4: 128, 6: 128, 7: 256, 9: 256, 10: 384, 11: 384, 12: 512}
_SQUEEZE_CHNS = (64, 128, 256, 384, 384, 512, 512)


def _make_squeeze_sd():
    g = torch.Generator().manual_seed(3)

    def rc(cout, cin, k):
        return (torch.randn(cout, cin, k, k, generator=g) * 0.08,
                torch.randn(cout, generator=g) * 0.01)

    sd = {}
    sd["features.0.weight"], sd["features.0.bias"] = rc(64, 3, 3)
    for i, (s, e) in _FIRES.items():
        cin = _FIRE_IN[i]
        for name, (co, ci, k) in (
            ("squeeze", (s, cin, 1)),
            ("expand1x1", (e, s, 1)),
            ("expand3x3", (e, s, 3)),
        ):
            w, b = rc(co, ci, k)
            sd[f"features.{i}.{name}.weight"] = w
            sd[f"features.{i}.{name}.bias"] = b
    return sd


def _torch_squeeze_feats(sd, x):
    def c(p, v, stride=1, pad=0):
        return F.conv2d(v, sd[p + ".weight"], sd[p + ".bias"], stride=stride,
                        padding=pad)

    def fire(i, v):
        s = F.relu(c(f"features.{i}.squeeze", v))
        return torch.cat(
            [F.relu(c(f"features.{i}.expand1x1", s)),
             F.relu(c(f"features.{i}.expand3x3", s, pad=1))], 1)

    outs = []
    v = F.relu(c("features.0", x, stride=2))
    outs.append(v)
    v = F.max_pool2d(v, 3, 2, ceil_mode=True)
    v = fire(4, fire(3, v))
    outs.append(v)
    v = F.max_pool2d(v, 3, 2, ceil_mode=True)
    v = fire(7, fire(6, v))
    outs.append(v)
    v = F.max_pool2d(v, 3, 2, ceil_mode=True)
    v = fire(9, v)
    outs.append(v)
    v = fire(10, v)
    outs.append(v)
    v = fire(11, v)
    outs.append(v)
    v = fire(12, v)
    outs.append(v)
    return outs


def _make_lin_sd(chns):
    g = torch.Generator().manual_seed(4)
    return {f"lin{k}.model.1.weight": torch.rand(1, c, 1, 1, generator=g) * 0.1
            for k, c in enumerate(chns)}


def test_squeeze_lpips_synthetic_parity(tmp_path, rng):
    bsd, lsd = _make_squeeze_sd(), _make_lin_sd(_SQUEEZE_CHNS)
    bpath, lpath = str(tmp_path / "sq.pth"), str(tmp_path / "lin.pth")
    torch.save(bsd, bpath)
    torch.save(lsd, lpath)

    lpips = LPIPS(net="squeeze")
    z = jnp.zeros((1, 64, 64, 3))
    base = lpips.init(jax.random.PRNGKey(0), z, z)
    variables = load_lpips_params(
        "squeeze", lin_path=lpath, backbone_path=bpath, base_params=base
    )

    a = rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1
    b = rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1
    got = float(lpips.apply(variables, jnp.asarray(a), jnp.asarray(b)).sum())

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    ta = (torch.from_numpy(a.transpose(0, 3, 1, 2)) - shift) / scale
    tb = (torch.from_numpy(b.transpose(0, 3, 1, 2)) - shift) / scale
    fa, fb = _torch_squeeze_feats(bsd, ta), _torch_squeeze_feats(bsd, tb)
    want = 0.0
    for k in range(7):
        na = fa[k] / (fa[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = fb[k] / (fb[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = F.conv2d((na - nb) ** 2, lsd[f"lin{k}.model.1.weight"])
        want += float(d.mean())
    np.testing.assert_allclose(got, want, rtol=3e-4)


def test_v00_skips_scaling_layer(rng):
    a = rng.random((1, 32, 32, 3)).astype(np.float32) * 2 - 1
    m01 = LPIPS(net="alex", version="0.1")
    m00 = LPIPS(net="alex", version="0.0")
    v = m01.init(jax.random.PRNGKey(0), jnp.asarray(a), jnp.asarray(a))
    b = rng.random((1, 32, 32, 3)).astype(np.float32) * 2 - 1
    d01 = float(m01.apply(v, jnp.asarray(a), jnp.asarray(b)).sum())
    d00 = float(m00.apply(v, jnp.asarray(a), jnp.asarray(b)).sum())
    assert d01 != pytest.approx(d00)  # the bug is reproduced, not ignored


@pytest.mark.skipif(
    reference_lin_weights_path("squeeze", "0.1") is None,
    reason="reference weights not mounted",
)
def test_bundled_squeeze_and_v00_heads_import():
    for version in ("0.0", "0.1"):
        lpips = LPIPS(net="squeeze", version=version)
        z = jnp.zeros((1, 64, 64, 3))
        base = lpips.init(jax.random.PRNGKey(0), z, z)
        lin = reference_lin_weights_path("squeeze", version)
        variables = load_lpips_params("squeeze", lin_path=lin, base_params=base)
        import torch as _t

        sd = _t.load(lin, map_location="cpu", weights_only=True)
        for k in range(7):
            key = f"lin{k}.model.1.weight"
            if key not in sd:
                key = f"lin{k}.model.0.weight"
            want = sd[key].numpy()[0, :, 0, 0]
            got = np.asarray(variables["params"][f"lin{k}"])[:, 0]
            np.testing.assert_allclose(got, want, atol=0)


def test_l2_and_dssim_modes(rng):
    a = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    b = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    l2 = np.asarray(l2_distance(a, b))
    np.testing.assert_allclose(l2, ((a - b) ** 2).mean(axis=(1, 2, 3)), rtol=1e-6)
    assert float(np.asarray(l2_distance(a, a)).sum()) == 0.0
    ds = dssim_distance(a, b)
    assert ds.shape == (2,) and (ds > 0).all() and (ds < 1).all()
    np.testing.assert_allclose(dssim_distance(a, a), 0.0, atol=1e-7)

    fn = create_dist_model("l2")
    np.testing.assert_allclose(np.asarray(fn(a, b)), l2, rtol=1e-6)
    fn2 = create_dist_model("ssim")
    np.testing.assert_allclose(fn2(a, b), ds)


def test_lpips_too_small_input_raises():
    """Tiny inputs collapse an alex stage to zero spatial size; the torch
    reference raises there, and so do we (instead of a silent NaN mean)."""
    import pytest

    from dasr_tpu.losses.lpips import LPIPS

    m = LPIPS(net="alex")
    x = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError, match="too small"):
        m.init(jax.random.PRNGKey(0), x, x)
