"""Single-level Haar DWT, XLA-fusible.

The reference calls ``pytorch_wavelets.DWTForward(J=1, wave='haar',
mode='reflect')`` (reference: codes/DSN/model.py:76, codes/SRN/models/
DASR_model.py:56) — a native-library conv under torch. Here the Haar
transform is a pure reshape-and-add on NHWC tensors: each 2x2 block
``[[a, b], [c, d]]`` (rows = H) maps to

    LL = (a + b + c + d) / 2      (pywt cA)
    LH = (a + b - c - d) / 2      (pywt cH: highpass along H)
    HL = (a - b + c - d) / 2      (pywt cV: highpass along W)
    HH = (a - b - c + d) / 2      (pywt cD)

which matches pywt/pytorch_wavelets haar numerics exactly for even sizes
(filters [1,1]/sqrt2 and [1,-1]/sqrt2 applied separably with stride 2); odd
sizes are reflect-padded by one at the bottom/right first, as
pytorch_wavelets' ``mode='reflect'`` does for length-2 filters.

``dwt_init`` reproduces the *other* Haar in the reference — the hand-rolled
strided-slice version (reference: codes/SRN/utils/util.py:211-224) whose LH/HL
carry opposite signs — used by the wavelet VGG discriminator input path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pad_to_even(x: jax.Array) -> jax.Array:
    h, w = x.shape[-3], x.shape[-2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = jnp.pad(x, pad, mode="reflect")
    return x


def _blocks(x: jax.Array):
    """Split NHWC into the four stride-2 phases a, b, c, d of 2x2 blocks."""
    x = _pad_to_even(x)
    a = x[..., 0::2, 0::2, :]
    b = x[..., 0::2, 1::2, :]
    c = x[..., 1::2, 0::2, :]
    d = x[..., 1::2, 1::2, :]
    return a, b, c, d


def haar_dwt(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(LL, LH, HL, HH) of an ...HWC image, pywt/pytorch_wavelets convention."""
    a, b, c, d = _blocks(x)
    ll = (a + b + c + d) * 0.5
    lh = (a + b - c - d) * 0.5
    hl = (a - b + c - d) * 0.5
    hh = (a - b - c + d) * 0.5
    return ll, lh, hl, hh


def haar_bands(
    x: jax.Array, norm: bool = True, cs: str = "cat"
) -> Tuple[jax.Array, jax.Array]:
    """(LL, high-band tensor) in the reference's discriminator input format.

    Mirrors ``Discriminator.filter_wavelet`` (DSN/model.py:108-118) and
    ``DASR_Model.wavelet_s`` (SRN/models/DASR_model.py:442-452): with
    ``norm`` the high bands are mapped ``*0.5 + 0.5`` and LL ``*0.5``;
    ``cs='cat'`` concatenates (LH, HL, HH) along channels (9ch for RGB),
    ``cs='sum'`` averages them (3ch).
    """
    ll, lh, hl, hh = haar_dwt(x)
    if norm:
        ll = ll * 0.5
        lh, hl, hh = lh * 0.5 + 0.5, hl * 0.5 + 0.5, hh * 0.5 + 0.5
    if cs == "cat":
        high = jnp.concatenate([lh, hl, hh], axis=-1)
    elif cs == "sum":
        high = (lh + hl + hh) / 3.0
    else:
        raise NotImplementedError(f"Wavelet format [{cs}] not recognized")
    return ll, high


def dwt_init(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """SRN utils Haar variant: (LL, cat(HL, LH, HH)) with its sign convention.

    Reference: codes/SRN/utils/util.py:211-224. Note LH/HL there are the
    *negated* pywt bands and the concat order is (HL, LH, HH).
    """
    a, b, c, d = _blocks(x)
    ll = (a + b + c + d) * 0.5
    hl = (-a - c + b + d) * 0.5
    lh = (-a + c - b + d) * 0.5
    hh = (a - c - b + d) * 0.5
    return ll, jnp.concatenate([hl, lh, hh], axis=-1)
