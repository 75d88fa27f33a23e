"""Mask-based batch split/merge (reference: codes/SRN/utils/util.py:150-176).

The DASR trainers avoid these at train time (the mask is always static
halves, SURVEY.md §7), but the utilities exist for API parity and for
variable masks (e.g. the Mix dataset). ``b_split`` returns (fake, real)
where mask==0 selects fake — same convention as the reference.

TPU note: boolean gathers produce data-dependent shapes, so under jit use
``b_select`` (padding-free masked select) instead; the numpy versions here
are for host-side composition.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def b_split(batch: np.ndarray, mask) -> tuple:
    mask = np.asarray(mask).astype(int)
    fake = batch[mask == 0]
    real = batch[mask == 1]
    return fake, real


def b_merge(real: np.ndarray, fake: np.ndarray, mask) -> np.ndarray:
    mask = np.asarray(mask).astype(int)
    out = np.empty((len(mask),) + tuple(fake.shape[1:]), dtype=fake.dtype)
    out[mask == 0] = fake
    out[mask == 1] = real
    return out


def b_select(real, fake, mask):
    """jit-safe elementwise merge: mask==1 -> real, 0 -> fake (static shape)."""
    m = jnp.reshape(mask, (-1,) + (1,) * (real.ndim - 1)).astype(real.dtype)
    return m * real + (1 - m) * fake
