"""Haar DWT tests: block-formula identities, energy, odd-size padding."""

import jax.numpy as jnp
import numpy as np

from dasr_tpu.ops.dwt import dwt_init, haar_bands, haar_dwt


def _brute_haar(x):
    """Independent per-block Haar (pywt convention) on HWC numpy arrays."""
    h, w, c = x.shape
    ll = np.zeros((h // 2, w // 2, c))
    lh = np.zeros_like(ll)
    hl = np.zeros_like(ll)
    hh = np.zeros_like(ll)
    for i in range(h // 2):
        for j in range(w // 2):
            a, b = x[2 * i, 2 * j], x[2 * i, 2 * j + 1]
            cc, d = x[2 * i + 1, 2 * j], x[2 * i + 1, 2 * j + 1]
            ll[i, j] = (a + b + cc + d) / 2
            lh[i, j] = (a + b - cc - d) / 2
            hl[i, j] = (a - b + cc - d) / 2
            hh[i, j] = (a - b - cc + d) / 2
    return ll, lh, hl, hh


def test_haar_matches_brute_force(rng):
    x = rng.random((8, 10, 3)).astype(np.float32)
    got = haar_dwt(jnp.asarray(x))
    want = _brute_haar(x.astype(np.float64))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-6)


def test_haar_energy_preserved(rng):
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    bands = haar_dwt(jnp.asarray(x))
    e_in = float(jnp.sum(jnp.asarray(x) ** 2))
    e_out = sum(float(jnp.sum(b**2)) for b in bands)
    assert abs(e_in - e_out) / e_in < 1e-5


def test_haar_odd_size_reflect_pads(rng):
    x = rng.random((2, 7, 9, 3)).astype(np.float32)
    ll, lh, hl, hh = haar_dwt(jnp.asarray(x))
    assert ll.shape == (2, 4, 5, 3)
    # padded row/col equal their reflected neighbours -> last block uses
    # duplicated values; LL of a duplicated 1x2 block = mean * sqrt stuff
    xp = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="reflect")
    want = np.stack([np.stack(_brute_haar(img.astype(np.float64)), 0) for img in xp])
    got = np.stack([np.asarray(b) for b in (ll, lh, hl, hh)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_haar_bands_norm_and_cat(rng):
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    ll, high = haar_bands(jnp.asarray(x), norm=True, cs="cat")
    ll0, lh, hl, hh = haar_dwt(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll0) * 0.5, atol=1e-6)
    assert high.shape == (1, 4, 4, 9)
    np.testing.assert_allclose(
        np.asarray(high[..., :3]), np.asarray(lh) * 0.5 + 0.5, atol=1e-6
    )
    _, s = haar_bands(jnp.asarray(x), norm=False, cs="sum")
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(lh + hl + hh) / 3.0, atol=1e-6
    )


def test_dwt_init_sign_convention(rng):
    """SRN utils variant: (LL, cat(HL, LH, HH)) with negated LH/HL signs."""
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    ll, high = dwt_init(jnp.asarray(x))
    ll_p, lh_p, hl_p, hh_p = haar_dwt(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(high[..., :3]), -np.asarray(hl_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(high[..., 3:6]), -np.asarray(lh_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(high[..., 6:]), np.asarray(hh_p), atol=1e-6)
