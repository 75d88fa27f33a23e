"""Domain-distance map (DDM) back-projection.

The reference splats every discriminator patch score over its receptive
field with a Python double loop and normalizes by hit counts
(reference: codes/DSN/receptive_cal.py:34-60, driven by
codes/DSN/create_dataset_modified.py:14-24). That computation is separable:
the axis-aligned receptive-field boxes factor into per-axis interval
indicator matrices U (n_h x H) and V (n_w x W), so

    ddm = (U^T . scores . V) / (U^T 1 . 1 V)

— two small matmuls on the MXU instead of an O(n_h * n_w * rf^2) host loop.
Boundary clamping and the reference's ``int()`` truncation of the fractional
``start`` offset are reproduced exactly (verified against a brute-force
replica in tests/test_rf_splat.py).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-discriminator conv stacks [kernel, stride, padding] used for the
# receptive-field geometry (reference: create_dataset_modified.py:114-121).
CONVNETS = {
    "FSD": [[5, 1, 2]] * 4,
    "nld_s1": [[4, 1, 1]] * 4,
    "nld_s2": [[4, 2, 1], [4, 2, 1], [4, 1, 1], [4, 1, 1]],
}


def receptive_field(
    imsize: int, convnet: Sequence[Sequence[int]]
) -> Tuple[int, int, int, float]:
    """(n_out, jump, rf, start) for a conv stack (reference: receptive_cal.py:8-53)."""
    n, j, r, start = imsize, 1, 1, 0.5
    for k, s, p in convnet:
        n_out = math.floor((n - k + 2 * p) / s) + 1
        actual_p = (n_out - 1) * s - n + k
        p_left = math.floor(actual_p / 2)
        start = start + ((k - 1) / 2 - p_left) * j
        r = r + (k - 1) * j
        j = j * s
        n = n_out
    return n, j, r, start


def _interval_matrix(n_cells: int, length: int, jump: int, rf: int, start: float):
    """Indicator matrix M[i, p] = 1 iff pixel p lies in cell i's RF box.

    Box bounds replicate the reference's ``weights_matrix`` arithmetic
    (receptive_cal.py:34-43): lo = int(max(0, start + i*jump - rf//2)),
    hi = int(start + i*jump + rf - rf//2), then clamped by slicing.
    """
    m = np.zeros((n_cells, length), dtype=np.float32)
    half = rf // 2
    for i in range(n_cells):
        lo = int(max(0.0, start + i * jump - half))
        hi = int(start + i * jump + rf - half)
        m[i, lo : max(lo, min(hi, length))] = 1.0
    return m


@functools.lru_cache(maxsize=64)
def _splat_matrices(out_h: int, out_w: int, convnet_key: tuple):
    convnet = [list(c) for c in convnet_key]
    n_h, jump, rf, start = receptive_field(out_h, convnet)
    n_w, _, _, _ = receptive_field(out_w, convnet)
    u = _interval_matrix(n_h, out_h, jump, rf, start)
    v = _interval_matrix(n_w, out_w, jump, rf, start)
    return u, v


def ddm_splat(
    scores: jax.Array,
    out_h: int,
    out_w: int,
    convnet: Sequence[Sequence[int]],
) -> jax.Array:
    """Back-project D patch scores (...hw) to a dense (...out_h, out_w) DDM.

    Cropped/variable D output sizes are handled like the reference: the RF
    geometry is derived from (out_h, out_w), and scores are truncated to the
    predicted grid if they disagree by a pixel.
    """
    key = tuple(tuple(c) for c in convnet)
    u, v = _splat_matrices(out_h, out_w, key)
    scores = scores[..., : u.shape[0], : v.shape[0]]
    u = jnp.asarray(u, scores.dtype)
    v = jnp.asarray(v, scores.dtype)
    num = jnp.einsum(
        "ip,...ij,jq->...pq", u, scores, v, precision=jax.lax.Precision.HIGHEST
    )
    cnt = jnp.outer(u.sum(axis=0), v.sum(axis=0))
    return num / cnt


def ddm_shape_for(filter_type: str, lr_h: int, lr_w: int) -> Tuple[int, int]:
    """DDM spatial size per FS type (reference: create_dataset_modified.py:15-20)."""
    if filter_type.lower() in ("gau", "avg_pool"):
        return lr_h, lr_w
    if filter_type.lower() == "wavelet":
        return lr_h // 2, lr_w // 2
    raise NotImplementedError(f"Frequency Separation [{filter_type}] not recognized")
