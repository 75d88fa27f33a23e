"""Phase-major space-to-depth convolution — used by the fused RRDBNet tail.

A 3x3 conv at resolution HxW is exactly equivalent to four "phase" convs at
(H/2)x(W/2) on the 2x2 space-to-depth packing of the input: each output
phase (dy,dx) reads a 2x2 coarse window whose (offset, input-phase) taps map
1:1 onto the nine fine taps

    u = 2*oy + py + dy - 1,   v = 2*ox + px + dx - 1    (valid iff 0<=u,v<3)

and ``nearest_repeat_x2 + conv3x3`` (the reference's ``upconv_blcok``,
codes/SRN/models/modules/block.py:854-861) collapses to four 2x2 phase convs
at the *input* resolution whose kernels are tap-SUMS of the 3x3 kernel (per
dimension phase 0 reads {W0 | W1+W2}, phase 1 reads {W0+W1 | W2}) — same
math, 2.25x fewer MACs, no HBM round-trip of the repeated tensor.

Layout is PHASE-MAJOR: packed channel index = (py*2+px)*C + c. Measured on
the target chip this matters enormously: phase-major keeps the channel dim
(the TPU lane dimension) intact through every pack/unpack transpose, while
the channel-major/phase-minor variant interleaves lanes at 4-element
granularity and runs ~2x slower end to end (tools/probe_conv.py rdbp_*).

Why only the tail uses this: the upsample stages are single convs at large
spatial sizes, where v5e XLA conv throughput is worst (52 TFLOP/s at 256^2
vs 88 at 128^2 for 64ch; measured) and the phase form is a pure win with no
glue. Inside the RDB trunk the dense-block chunk arithmetic would need
cross-phase gathers that cost more than the conv savings (measured: packed
RDB 1.2-2.9 ms vs 0.73 ms grouped-scatter) — the trunk instead uses the
grouped-scatter formulation in nn/blocks.py.

All transforms are apply-time only: parameters keep the reference layout
(3x3 HWIO), so checkpoint import/export is unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def pack22(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channel layout."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, hc, wc, py, px, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack22(xp: jax.Array) -> jax.Array:
    """Inverse of :func:`pack22` (depth-to-space, phase-major input)."""
    b, hc, wc, cp = xp.shape
    c = cp // 4
    x = xp.reshape(b, hc, wc, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, hc, py, wc, px, c)
    return x.reshape(b, hc * 2, wc * 2, c)


def pack_kernel22(w: jax.Array, dy: int, dx: int) -> jax.Array:
    """Fine (3,3,cin,cout) HWIO kernel -> phase-(dy,dx) packed kernel
    (2,2,4*cin,cout); input channel index = (py*2+px)*cin + c."""
    kh, kw, cin, cout = w.shape
    z = jnp.zeros((cin, cout), w.dtype)
    rows = []
    for oy in range(2):
        cols = []
        for ox in range(2):
            taps = []
            for py in range(2):
                for px in range(2):
                    u = 2 * oy + py + dy - 1
                    v = 2 * ox + px + dx - 1
                    taps.append(w[u, v] if 0 <= u < kh and 0 <= v < kw else z)
            cols.append(jnp.stack(taps, 0).reshape(4 * cin, cout))
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)  # (2, 2, 4cin, cout)


def _conv(v, k, pad_h, pad_w):
    return jax.lax.conv_general_dilated(
        v, k, (1, 1), (pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fat_phase_conv(x, phase_kernels, bias, act):
    """One conv with all four phase kernels concatenated along cout (N is
    4x wider — the MXU-saturating regime; separate per-phase convs measured
    ~4x slower at cout 64), over the 1-padded input. Each phase's result for
    coarse position m then sits at spatial offset (dy,dx) in channel block
    p — recovered by a single shifted-slice gather fused with bias and act
    (one elementwise pass; applying act AFTER a bare concat instead costs a
    full extra HBM round-trip, measured 1.17 ms at 256^2x256)."""
    k = jnp.concatenate(phase_kernels, -1)  # (2,2,cin_k,4*cout)
    cout = phase_kernels[0].shape[-1]
    t = _conv(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), k, (0, 0), (0, 0))
    h, w = x.shape[1], x.shape[2]
    pieces = [
        t[:, dy:dy + h, dx:dx + w, p * cout:(p + 1) * cout]
        for p, (dy, dx) in enumerate(_PHASES)
    ]
    y = jnp.concatenate(pieces, -1)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    if act is not None:
        y = act(y)
    return y


def packed_conv22(xp: jax.Array, w_fine: jax.Array, bias=None, act=None) -> jax.Array:
    """SAME 3x3 conv in 2x2-packed (phase-major) space: ``xp`` is pack22 of
    the fine input; returns pack22 of the fine conv output."""
    ks = [
        pack_kernel22(w_fine.astype(xp.dtype), dy, dx) for dy, dx in _PHASES
    ]
    return _fat_phase_conv(xp, ks, bias, act)


# --------------------------------------------------------------------------
# Fused nearest-x2 upsampler (repeat + conv3x3 == 4 phase 2x2 convs)
# --------------------------------------------------------------------------

_TAPS = {(0, 0): (0,), (0, 1): (1, 2), (1, 0): (0, 1), (1, 1): (2,)}


def upconv_phase_kernel(w: jax.Array, dy: int, dx: int) -> jax.Array:
    """Fine (3,3,cin,cout) kernel -> (2,2,cin,cout) phase kernel for
    ``conv3x3(nearest_repeat2(x))``; entries are tap sums (module doc)."""
    rows = []
    for oy in range(2):
        cols = []
        for ox in range(2):
            acc = 0
            for u in _TAPS[(dy, oy)]:
                for v in _TAPS[(dx, ox)]:
                    acc = acc + w[u, v]
            cols.append(acc)
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)


def fused_upconv2(
    x: jax.Array, w_fine: jax.Array, bias=None, act=None, unpack: bool = True
) -> jax.Array:
    """``act(conv3x3_same(nearest_repeat_x2(x)) + bias)`` without
    materializing the repeated tensor. With ``unpack=False`` the result
    stays in phase-major pack22 form of the 2x-resolution output —
    exactly the input format :func:`packed_conv22` expects."""
    ks = [
        upconv_phase_kernel(w_fine.astype(x.dtype), dy, dx)
        for dy, dx in _PHASES
    ]
    y = _fat_phase_conv(x, ks, bias, act)
    return unpack22(y) if unpack else y
