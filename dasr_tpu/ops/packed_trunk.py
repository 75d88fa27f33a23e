"""2x2 space-to-depth packed formulation of the DSN DeResnet trunk.

The DSN degradation generator (reference: codes/DSN/model.py:25-55,
De_resnet) runs its 8 conv-PReLU-conv residual blocks at FULL HR
resolution (256x256 crops in the aim2019 recipe) with 64 channels — the
measured slow regime of the v5e conv emitter (~45 TF/s at >=256 spatial;
BENCH_NOTES "v5e conv-emitter efficiency map"). Packing 2x2 spatial
phases into channels moves every trunk conv to 128x128 spatial with
256->256 channels — the measured peak regime (~412 TF/s) — at 4x the
FLOPs (the packed 3x3 kernel is half zeros).

This is an EXACT rewrite of the same function (same parameter tree):

* packed channel layout is phase-major: channel = (p*2+q)*C + c, where
  (p, q) is the (row, col) phase of the original pixel;
* a SAME 3x3 conv on the original image equals a SAME 3x3 conv on the
  packed image with the kernel scattered by phase arithmetic — output
  phase (p, q) at packed position I needs original taps 2I+p+dy, which
  live at packed row I + (p+dy)//2, input phase (p+dy) % 2; solving
  dy = 2*r + pi - p for row offset r and input phase pi lands every tap
  inside the 3-tap window, with |{valid}| = 9 of 18 (in-phase, offset)
  slots per output phase (the kernel is half zeros — the MXU does not
  care);
* zero padding in packed space taps exactly the original SAME halo (the
  out-of-halo original rows are never addressed by any valid slot);
* PReLU (scalar slope) and the residual add are phase-uniform, so the
  whole trunk stays packed with ONE pack at the head;
* the trailing stride-2 downsample conv consumes the packed layout
  directly (stride-2 output pixels ARE phase (0,0)) and emits the
  ordinary unpacked half-resolution tensor — the unpack is free.

Only the accumulation order inside each conv changes (one 576-term
contraction instead of 9x64 staged), so results match to float rounding,
not bit-exactly; tests/test_packed_trunk.py pins the f32 tolerance
(forward AND grads, every scale, same parameter tree).

Wired: ``DeResnet(packed_trunk=True)`` (nn/generators.py), reachable from
training via ``dsn_train --packed_trunk`` / ``DSNConfig.packed_trunk``.
Full-train-step A/B on the v5e (BENCH_NOTES r4 "packed DeResnet trunk"):
REJECTED for training — 45.2 vs 35.8 ms/step; inside the fwd+bwd program
the packed convs emit at the same ~47 TF/s as the plain trunk, so the
extra pack/unpack and backward glue only add cost. Kept as a tested
exact opt-in (defaults stay plain).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "pack_space_to_depth",
    "unpack_depth_to_space",
    "pack_kernel",
    "pack_kernel_strided",
    "packed_conv",
    "resblock_chain",
    "packed_resblock_chain",
]


def _phase_maps():
    """(dy_index, dx_index, valid) lookup tables, shape (3, 3, 4, 4) =
    (row_off+1, col_off+1, in_phase_idx, out_phase_idx)."""
    dyi = np.zeros((3, 3, 4, 4), np.int32)
    dxi = np.zeros((3, 3, 4, 4), np.int32)
    valid = np.zeros((3, 3, 4, 4), np.float32)
    for r in range(3):
        for s in range(3):
            for pr in range(2):
                for pc in range(2):
                    for p in range(2):
                        for q in range(2):
                            dy = 2 * (r - 1) + pr - p
                            dx = 2 * (s - 1) + pc - q
                            if -1 <= dy <= 1 and -1 <= dx <= 1:
                                pi, po = pr * 2 + pc, p * 2 + q
                                dyi[r, s, pi, po] = dy + 1
                                dxi[r, s, pi, po] = dx + 1
                                valid[r, s, pi, po] = 1.0
    return dyi, dxi, valid


_DYI, _DXI, _VALID = _phase_maps()


def pack_space_to_depth(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4C), phase-major channels."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, 4, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b, h, w, 4 * c)


def unpack_depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C), inverse of pack_space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 4, c).transpose(0, 3, 1, 2, 4).reshape(b, 2, 2, h, w, c)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, 2 * h, 2 * w, c)


def pack_kernel(w: jax.Array) -> jax.Array:
    """HWIO (3, 3, C, C) -> packed HWIO (3, 3, 4C, 4C)."""
    c_in, c_out = w.shape[2], w.shape[3]
    wp = w[_DYI, _DXI] * _VALID[..., None, None].astype(w.dtype)
    # (r, s, pi, po, ci, co) -> (r, s, pi, ci, po, co)
    wp = wp.transpose(0, 1, 2, 4, 3, 5)
    return wp.reshape(3, 3, 4 * c_in, 4 * c_out)


def pack_kernel_strided(w: jax.Array) -> jax.Array:
    """HWIO (3, 3, C, Cout) -> (3, 3, 4C, Cout): the stride-2 SAME-ish
    conv (torch pad=1) as a stride-1 conv on the packed layout keeping
    only output phase (0, 0)."""
    c_in, c_out = w.shape[2], w.shape[3]
    wp = w[_DYI[..., 0], _DXI[..., 0]] * _VALID[..., 0, None, None].astype(w.dtype)
    wp = wp.transpose(0, 1, 2, 3, 4)  # (r, s, pi, ci, co) already ordered
    return wp.reshape(3, 3, 4 * c_in, c_out)


def pack_bias(b: jax.Array) -> jax.Array:
    return jnp.tile(b, 4)


def packed_conv(x: jax.Array, wp: jax.Array, bp: jax.Array | None = None) -> jax.Array:
    y = lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bp is not None:
        y = y + bp.astype(y.dtype)
    return y


def _prelu(x, slope):
    return jnp.where(x >= 0, x, x * slope.astype(x.dtype))


def resblock_chain(x: jax.Array, params) -> jax.Array:
    """Reference chain: [conv3x3 -> PReLU -> conv3x3 -> add] * N at full res."""

    def conv(v, w, b):
        y = lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(y.dtype)

    for (w1, b1, w2, b2, slope) in params:
        r = _prelu(conv(x, w1, b1), slope)
        x = x + conv(r, w2, b2)
    return x


def packed_resblock_chain(x: jax.Array, params) -> jax.Array:
    """Same function as resblock_chain, computed in the packed layout."""
    xp = pack_space_to_depth(x)
    for (w1, b1, w2, b2, slope) in params:
        r = _prelu(packed_conv(xp, pack_kernel(w1), pack_bias(b1)), slope)
        xp = xp + packed_conv(r, pack_kernel(w2), pack_bias(b2))
    return unpack_depth_to_space(xp)
