"""Fused Residual-Dense-Block Pallas kernel.

The ESRGAN trunk (23 x 3 RDBs) is HBM-bandwidth-bound under plain XLA: each
of the five dense convs round-trips grown concat activations (~600 MB per
RDB at batch16 128^2 bf16). This kernel computes a whole RDB per spatial
tile with every intermediate resident in VMEM:

  * the dense concats are pre-factored into per-source scatter weights
    (dasr_tpu.nn.blocks.RDB5C), then each level's conv is ONE im2col matmul:
    nine shifted slices of the level buffer are stored into a VMEM scratch
    (the store resets Mosaic value layouts — the trick that makes this
    compile; direct concat of shifted slices does not lower) and multiplied
    by a (9*cin, cout) weight matrix on the MXU;
  * the growth channels are zero-padded 32 -> 64 so every lane extent is a
    multiple Mosaic accepts; padded weight rows are zero, so the math is
    unchanged;
  * boundary semantics match the SAME-zero-padded conv chain exactly: the
    input is zero-padded by the chain's receptive halo (5) and every
    intermediate x_l is masked to zero outside the true image extent;
  * grid = (batch, h_tiles, w_tiles); the (tile+2*HALO)^2 input window is
    DMA'd from HBM with 8/128-aligned extents.

Training uses ``fused_rdb`` through a custom VJP whose backward runs the
mathematically-identical XLA scatter path, so gradients are exact without a
hand-written backward kernel.

STATUS (v5e, measured): compiles in ~27 s, bf16-exact vs the scatter path,
but runs ~6.1 ms per RDB at batch16 128^2 vs ~2 ms for the XLA scatter
formulation — XLA's conv fusion currently wins, so the production trunk
(nn.blocks.RDB5C) keeps the scatter path and this kernel is an opt-in
baseline for future kernel work (double-buffered DMA, multi-tile programs,
8-aligned level grids are the known next steps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5  # receptive halo of the 5-conv chain


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


def _mask(level: int, size: int, row0, col0, h: int, w: int):
    """Validity mask for level-`level` features: feature (li, lj) sits at
    padded coord (row0 + level + li, col0 + level + lj); the image occupies
    [HALO, HALO + h) x [HALO, HALO + w)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0) + row0 + level
    cols = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1) + col0 + level
    ok = (rows >= HALO) & (rows < HALO + h) & (cols >= HALO) & (cols < HALO + w)
    return ok.astype(jnp.float32)[:, :, None]


def _rdb_kernel(h: int, w: int, tile: int, gc: int, nc: int, cpad: int,
                kpad: int,
                x_ref, w0, w1, w2, w3, w4, b_ref,
                out_ref, xbuf, col0b, col1b, col2b, col3b, col4b,
                xl1, xl2, xl3, xl4, sem):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    row0 = ti * tile
    col0 = tj * tile
    s = tile + 2 * HALO
    s_buf = _round8(s)

    copy = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(row0, s_buf), pl.ds(col0, s_buf), :], xbuf, sem
    )
    copy.start()
    copy.wait()

    dt = xbuf.dtype
    bvec = b_ref[:]  # (1, 4*gc + nc) f32

    def b(k):
        if k < 4:
            return bvec[:, k * gc : (k + 1) * gc][0]
        return bvec[:, 4 * gc : 4 * gc + nc][0]

    def lrelu(v):
        return jnp.where(v >= 0, v, v * 0.2)

    def im2col_matmul(level_val, colbuf, wmat):
        """9 shifted slices -> scratch -> one (rows, 9*cin)@(9*cin, cout)."""
        sz = level_val.shape[0]
        cin = level_val.shape[2]
        out_sz = sz - 2
        for i, (dy, dx) in enumerate(
            [(a, bb) for a in range(3) for bb in range(3)]
        ):
            colbuf[:, :, i * cin : (i + 1) * cin] = level_val[
                dy : dy + out_sz, dx : dx + out_sz, :
            ]
        patch = colbuf[:].reshape(out_sz * out_sz, 9 * cin)
        y = jnp.dot(patch, wmat[:], preferred_element_type=jnp.float32)
        return y.reshape(out_sz, out_sz, -1)

    def pad_via_scratch(v, xlbuf):
        # channel-pad an intermediate WITHOUT jnp.pad (concat of offset
        # values does not lower in Mosaic): store into a scratch whose
        # upper lanes are zeroed, read back a layout-clean padded value
        c = v.shape[-1]
        xlbuf[:, :, :c] = v
        xlbuf[:, :, c:] = jnp.zeros(v.shape[:2] + (kpad - c,), v.dtype)
        return xlbuf[:]

    x = xbuf[:][:s, :s, :kpad]  # drop DMA-only padding beyond kpad
    p0 = im2col_matmul(x, col0b, w0)  # (s-2)^2 x (4gc + nc)

    x1 = lrelu(p0[..., :gc] + b(0)) * _mask(1, s - 2, row0, col0, h, w)
    p1 = im2col_matmul(pad_via_scratch(x1.astype(dt), xl1), col1b, w1)

    x2 = lrelu(p0[1:-1, 1:-1, gc : 2 * gc] + p1[..., :gc] + b(1)) * _mask(
        2, s - 4, row0, col0, h, w
    )
    p2 = im2col_matmul(pad_via_scratch(x2.astype(dt), xl2), col2b, w2)

    x3 = lrelu(
        p0[2:-2, 2:-2, 2 * gc : 3 * gc]
        + p1[1:-1, 1:-1, gc : 2 * gc]
        + p2[..., :gc]
        + b(2)
    ) * _mask(3, s - 6, row0, col0, h, w)
    p3 = im2col_matmul(pad_via_scratch(x3.astype(dt), xl3), col3b, w3)

    x4 = lrelu(
        p0[3:-3, 3:-3, 3 * gc : 4 * gc]
        + p1[2:-2, 2:-2, 2 * gc : 3 * gc]
        + p2[1:-1, 1:-1, gc : 2 * gc]
        + p3[..., :gc]
        + b(3)
    ) * _mask(4, s - 8, row0, col0, h, w)
    p4 = im2col_matmul(pad_via_scratch(x4.astype(dt), xl4), col4b, w4)

    x5 = (
        p0[4:-4, 4:-4, 4 * gc :]
        + p1[3:-3, 3:-3, 3 * gc :]
        + p2[2:-2, 2:-2, 2 * gc :]
        + p3[1:-1, 1:-1, gc:]
        + p4
        + b(4)
    )
    center = x[HALO : HALO + tile, HALO : HALO + tile, :nc].astype(jnp.float32)
    out_ref[0] = (center + 0.2 * x5).astype(dt)


def _scatter_weights(kernels, gc: int, nc: int):
    """Per-source weight blocks from the 5 RDB kernels (HWIO)."""

    def w_src(s):
        lo = nc + (s - 1) * gc if s >= 1 else 0
        hi = lo + (gc if s >= 1 else nc)
        return jnp.concatenate(
            [kernels[j][:, :, lo:hi, :] for j in range(s, 5)], axis=-1
        )

    return tuple(w_src(s) for s in range(5))


def _im2col_weights(kernels, gc: int, nc: int, kpad: int, dt):
    """Scatter weights -> per-level (9*kpad, cout) im2col matrices. Padded
    input channels get zero rows, so the padded lanes contribute 0."""
    ws = _scatter_weights(kernels, gc, nc)
    out = []
    for s, wk in enumerate(ws):
        cin = wk.shape[2]
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, kpad - cin), (0, 0)))
        # taps ordered like the kernel's shift loop (dy-major, dx-minor,
        # channels contiguous per tap)
        out.append(wk.reshape(9 * kpad, wk.shape[-1]).astype(dt))
    return out


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _fused_rdb_impl(x, kernels, biases, tile: int = 32, interpret: bool = False):
    b, h, w, nc = x.shape
    gc = kernels[0].shape[-1]
    assert h % tile == 0 and w % tile == 0, (h, w, tile)
    dt = x.dtype
    cpad = max(128, _round8(nc))  # lane-tile channel padding for the DMA
    kpad = max(64, _round8(nc))  # im2col channel padding (64-lane stores ok)
    w_mats = _im2col_weights(kernels, gc, nc, kpad, dt)
    bvec = jnp.concatenate([bi.astype(jnp.float32) for bi in biases])[None, :]

    s = tile + 2 * HALO
    s_buf = _round8(s)
    extra = s_buf - s
    xp = jnp.pad(
        x,
        ((0, 0), (HALO, HALO + extra), (HALO, HALO + extra), (0, cpad - nc)),
    )

    nh, nw = h // tile, w // tile
    kernel = functools.partial(_rdb_kernel, h, w, tile, gc, nc, cpad, kpad)
    col_scratch = [
        pltpu.VMEM((s - 2 - 2 * lv, s - 2 - 2 * lv, 9 * kpad), dt)
        for lv in range(5)
    ]
    xl_scratch = [
        pltpu.VMEM((s - 2 * lv, s - 2 * lv, kpad), dt) for lv in range(1, 5)
    ]
    return pl.pallas_call(
        kernel,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM, DMA'd
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, tile, tile, nc), lambda bi, i, j: (bi, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nc), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[pltpu.VMEM((s_buf, s_buf, cpad), dt)]
        + col_scratch
        + xl_scratch
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xp, *w_mats, bvec)


def _scatter_reference(x, kernels, biases):
    """The XLA scatter formulation (same math; used for the VJP)."""
    nc = x.shape[-1]
    gc = kernels[0].shape[-1]
    dt = x.dtype
    ws = [wk.astype(dt) for wk in _scatter_weights(kernels, gc, nc)]
    bs = [bi.astype(jnp.float32) for bi in biases]

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def lrelu(v):
        return jnp.where(v >= 0, v, v * 0.2)

    p0 = conv(x, ws[0]).astype(jnp.float32)
    x1 = lrelu(p0[..., :gc] + bs[0]).astype(dt)
    p1 = conv(x1, ws[1]).astype(jnp.float32)
    x2 = lrelu(p0[..., gc : 2 * gc] + p1[..., :gc] + bs[1]).astype(dt)
    p2 = conv(x2, ws[2]).astype(jnp.float32)
    x3 = lrelu(
        p0[..., 2 * gc : 3 * gc] + p1[..., gc : 2 * gc] + p2[..., :gc] + bs[2]
    ).astype(dt)
    p3 = conv(x3, ws[3]).astype(jnp.float32)
    x4 = lrelu(
        p0[..., 3 * gc : 4 * gc]
        + p1[..., 2 * gc : 3 * gc]
        + p2[..., gc : 2 * gc]
        + p3[..., :gc]
        + bs[3]
    ).astype(dt)
    p4 = conv(x4, ws[4]).astype(jnp.float32)
    x5 = (
        p0[..., 4 * gc :]
        + p1[..., 3 * gc :]
        + p2[..., 2 * gc :]
        + p3[..., gc:]
        + p4
        + bs[4]
    )
    return (x.astype(jnp.float32) + 0.2 * x5).astype(dt)


@jax.custom_vjp
def fused_rdb(x, kernels, biases):
    """One RDB5C: x (B,H,W,nc) -> (B,H,W,nc); kernels/biases are the five
    conv params (tuples). Forward runs the Pallas kernel; backward runs the
    VJP of the identical XLA formulation."""
    return _fused_rdb_impl(x, tuple(kernels), tuple(biases))


def _fwd(x, kernels, biases):
    return fused_rdb(x, kernels, biases), (x, tuple(kernels), tuple(biases))


def _bwd(res, g):
    x, kernels, biases = res
    _, vjp = jax.vjp(_scatter_reference, x, kernels, biases)
    return vjp(g)


fused_rdb.defvjp(_fwd, _bwd)
