"""Generator architectures.

Capability map to the reference:
  * ``DSGANGenerator`` — 1:1 LR corruption net, 8 resblocks, sigmoid out
                         (reference: codes/DSN/model.py:7-22)
  * ``DeResnet``       — HR->LR x2/x4 downsampler: conv+PReLU head, 8
                         resblocks, strided-conv downsample, sigmoid out
                         (reference: codes/DSN/model.py:25-55; also registered
                         in the SRN factory, codes/SRN/models/modules/
                         architecture.py:51-102)
  * ``SRResNet``       — SRGAN-style PSNR net (architecture.py:18-49)
  * ``RRDBNet``        — ESRGAN generator: fea conv, nb RRDBs + trunk conv
                         with long skip, n nearest-upconvs, two HR convs
                         (architecture.py:174-205)

All NHWC; ``dtype`` selects the compute precision (bf16 for training/serving,
f32 params).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dasr_tpu.nn.blocks import (
    RRDB,
    ResNetBlock,
    RRDBResidualConv,
    RRDBResidualConvConcat,
    ResidualBlock,
    pixelshuffle_block,
    upconv,
)
from dasr_tpu.nn.layers import PReLU, conv_block

Dtype = Any


class DSGANGenerator(nn.Module):
    n_res_blocks: int = 8
    features: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        h = PReLU()(h)
        for _ in range(self.n_res_blocks):
            h = ResidualBlock(self.features, dtype=self.dtype)(h)
        h = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return nn.sigmoid(h)


class _PReLUParams(nn.Module):
    """PReLU-shaped parameter shell (scalar ``slope``, same name/init) —
    lets packed apply paths share the plain modules' parameter tree."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self):
        return self.param(
            "slope", lambda _k: jnp.asarray(self.init_slope, jnp.float32)
        )


class _ResidualBlockParams(nn.Module):
    """ResidualBlock-shaped parameter shell (Conv_0/PReLU_0/Conv_1)."""

    channels: int

    @nn.compact
    def __call__(self):
        from dasr_tpu.nn.blocks import _ConvParamsMirror

        k1, b1 = _ConvParamsMirror(self.channels, self.channels, name="Conv_0")()
        slope = _PReLUParams(name="PReLU_0")()
        k2, b2 = _ConvParamsMirror(self.channels, self.channels, name="Conv_1")()
        return k1, b1, slope, k2, b2


class DeResnet(nn.Module):
    """DSN degradation generator (reference: codes/DSN/model.py:25-55).

    ``packed_trunk=True`` computes the SAME function (same parameter tree,
    apply-time kernel transforms) with the full-HR-resolution trunk in 2x2
    space-to-depth packed form (ops/packed_trunk.py): every trunk conv
    becomes a 4C->4C conv at half spatial size, and the first stride-2
    downsample conv consumes the packed layout directly (its outputs ARE
    phase (0, 0)), so the unpack is free for scale >= 2. Requires even
    H/W. Accumulation order inside each conv changes, so results match to
    float rounding (tests/test_packed_trunk.py, fwd + grads, every scale).
    Measured on the v5e: REJECTED for the train step (45.2 vs 35.8
    ms/step — packed convs emit no faster inside the fwd+bwd program;
    BENCH_NOTES r4) — opt-in only, defaults stay plain."""

    n_res_blocks: int = 8
    scale: int = 4
    features: int = 64
    packed_trunk: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        if self.packed_trunk:
            return self._packed_apply(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        h = PReLU()(h)
        for _ in range(self.n_res_blocks):
            h = ResidualBlock(self.features, dtype=self.dtype)(h)
        n_down = {1: 0, 2: 1, 4: 2}[self.scale]
        for _ in range(n_down):
            h = nn.Conv(
                self.features,
                (3, 3),
                strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
            )(h)
            h = PReLU()(h)
        h = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return nn.sigmoid(h)

    def _packed_apply(self, x):
        from jax import lax

        from dasr_tpu.nn.blocks import _ConvParamsMirror
        from dasr_tpu.ops.packed_trunk import (
            pack_bias,
            pack_kernel,
            pack_kernel_strided,
            pack_space_to_depth,
            packed_conv,
            unpack_depth_to_space,
        )

        assert x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0, (
            "packed_trunk needs even H/W"
        )
        dtype = self.dtype or x.dtype
        n_down = {1: 0, 2: 1, 4: 2}[self.scale]

        k0, b0 = _ConvParamsMirror(self.features, x.shape[-1], name="Conv_0")()
        hp = packed_conv(
            pack_space_to_depth(x).astype(dtype),
            pack_kernel(k0).astype(dtype),
            pack_bias(b0),
        )
        # PReLU / residual adds are phase-uniform: the plain modules apply
        # to the packed tensor unchanged (and keep the plain names)
        hp = PReLU(name="PReLU_0")(hp)
        for i in range(self.n_res_blocks):
            k1, b1, slope, k2, b2 = _ResidualBlockParams(
                self.features, name=f"ResidualBlock_{i}"
            )()
            r = packed_conv(hp, pack_kernel(k1).astype(dtype), pack_bias(b1))
            r = jnp.where(r >= 0, r, r * slope.astype(r.dtype))
            hp = hp + packed_conv(r, pack_kernel(k2).astype(dtype), pack_bias(b2))
        if n_down == 0:
            h = unpack_depth_to_space(hp)
        else:
            kd, bd = _ConvParamsMirror(
                self.features, self.features, name="Conv_1"
            )()
            h = lax.conv_general_dilated(
                hp,
                pack_kernel_strided(kd).astype(dtype),
                (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bd.astype(dtype)
            h = PReLU(name="PReLU_1")(h)
            for j in range(1, n_down):
                h = nn.Conv(
                    self.features,
                    (3, 3),
                    strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    dtype=self.dtype,
                    name=f"Conv_{1 + j}",
                )(h)
                h = PReLU(name=f"PReLU_{1 + j}")(h)
        h = nn.Conv(
            3, (3, 3), padding="SAME", dtype=self.dtype,
            name=f"Conv_{1 + n_down}",
        )(h)
        return nn.sigmoid(h)


class DeResnetSRN(nn.Module):
    """SRN ``arch.De_Resnet`` family — HR->LR degradation nets built from
    conv_block/ResNetBlock primitives, NO sigmoid output (unlike the DSN
    DeResnet above).

    Variants (selected by ``variant``):
      * ``"strided"``  — arch.De_Resnet (reference: codes/SRN/models/modules/
        architecture.py:51-75): fea conv, long-skip ResNet trunk, log2(scale)
        stride-2 downsample convs (conv_block_downsample == conv_block with
        stride, block.py:190-221), then two After_D conv_blocks.
      * ``"bilinear"`` — arch.De_Resnet_bilinear (architecture.py:78-102):
        trunk, bilinear x0.25 interpolate (align_corners=False, no
        antialias), two After_D conv_blocks.
      * ``"x2"``       — arch.De_Resnetdx2 (architecture.py:137-171): trunk,
        ONE stride-2 downsample conv, two After_D conv_blocks (the
        ``downscale`` argument is ignored by the reference too).
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 8
    downscale: int = 4
    norm_type: Optional[str] = "batch"
    act_type: Optional[str] = "prelu"
    mode: str = "NAC"
    res_scale: float = 1.0
    variant: str = "strided"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        fea = conv_block(self.nf, 3, norm_type=None, act_type=None, dtype=self.dtype)(x)
        h = fea
        for _ in range(self.nb):
            h = ResNetBlock(
                self.nf, norm_type=self.norm_type, act_type=self.act_type,
                mode=self.mode, res_scale=self.res_scale, dtype=self.dtype,
            )(h)
        h = conv_block(
            self.nf, 3, norm_type=self.norm_type, act_type=None,
            mode=self.mode, dtype=self.dtype,
        )(h)
        h = fea + h  # ShortcutBlock
        if self.variant == "strided":
            for _ in range(int(math.log2(self.downscale))):
                h = conv_block(
                    self.nf, 3, stride=2, norm_type=None,
                    act_type=self.act_type, dtype=self.dtype,
                )(h)
        elif self.variant == "x2":
            h = conv_block(
                self.nf, 3, stride=2, norm_type=None,
                act_type=self.act_type, dtype=self.dtype,
            )(h)
        elif self.variant == "bilinear":
            b, hh, ww, c = h.shape
            h = jax.image.resize(
                h.astype(jnp.float32), (b, hh // 4, ww // 4, c), "linear",
                antialias=False,
            ).astype(h.dtype)
        else:
            raise NotImplementedError(self.variant)
        h = conv_block(
            self.nf, 3, norm_type=self.norm_type, act_type=None,
            mode=self.mode, dtype=self.dtype,
        )(h)
        return conv_block(
            self.out_nc, 3, norm_type=self.norm_type, act_type=None,
            mode=self.mode, dtype=self.dtype,
        )(h)


class RRDBNetSEAN(nn.Module):
    """ESRGAN generator with trailing SEAN-conditioned RRDBs
    (reference: codes/SRN/models/modules/architecture.py:873-918).

    forward(x, ddm): fea conv -> nb plain RRDBs -> nb_ada RRDB_SEAN blocks
    (DDM-conditioned) -> LR conv -> +fea long skip -> upconv tail. The DDM
    is a (B, h, w, 1) map at LR resolution."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    nb_ada: int = 1
    upscale: int = 4
    norm_type: Optional[str] = None
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    upsample_mode: str = "upconv"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, ddm):
        from dasr_tpu.nn.adaptive_blocks import RRDBSEAN

        n_up = 1 if self.upscale == 3 else int(math.log2(self.upscale))
        fea = conv_block(self.nf, 3, norm_type=None, act_type=None, dtype=self.dtype)(x)
        h = fea
        for _ in range(self.nb):
            h = RRDB(
                nc=self.nf, gc=self.gc, norm_type=self.norm_type,
                act_type=self.act_type, mode="CNA", dtype=self.dtype,
            )(h)
        for _ in range(self.nb_ada):
            h = RRDBSEAN(nc=self.nf, gc=self.gc, dtype=self.dtype)(h, ddm)
        h = conv_block(
            self.nf, 3, norm_type=self.norm_type, act_type=None,
            mode=self.mode, dtype=self.dtype,
        )(h)
        h = fea + h
        for _ in range(n_up):
            factor = 3 if self.upscale == 3 else 2
            if self.upsample_mode == "upconv":
                h = upconv(self.nf, factor, act_type=self.act_type, dtype=self.dtype)(h)
            else:
                h = pixelshuffle_block(
                    self.nf, factor, act_type=self.act_type, dtype=self.dtype
                )(h)
        h = conv_block(self.nf, 3, norm_type=None, act_type=self.act_type, dtype=self.dtype)(h)
        return conv_block(self.out_nc, 3, norm_type=None, act_type=None, dtype=self.dtype)(h)


class SRResNet(nn.Module):
    """SRGAN generator shape (architecture.py:18-49): conv head, nb residual
    conv3-relu-conv3 blocks (via RRDB-free conv stacks), pixelshuffle ups."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4
    norm_type: Optional[str] = "batch"
    act_type: str = "relu"
    mode: str = "NAC"
    upsample_mode: str = "pixelshuffle"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        n_up = 1 if self.upscale == 3 else int(math.log2(self.upscale))
        fea = conv_block(self.nf, 3, act_type=None, norm_type=None, dtype=self.dtype)(x)
        h = fea
        for _ in range(self.nb):
            r = conv_block(
                self.nf, 3, norm_type=self.norm_type, act_type=self.act_type,
                mode=self.mode, dtype=self.dtype,
            )(h)
            r = conv_block(
                self.nf, 3, norm_type=self.norm_type, act_type=None,
                mode=self.mode, dtype=self.dtype,
            )(r)
            h = h + r
        h = conv_block(
            self.nf, 3, norm_type=self.norm_type, act_type=None,
            mode=self.mode, dtype=self.dtype,
        )(h)
        h = fea + h
        for _ in range(n_up):
            factor = 3 if self.upscale == 3 else 2
            if self.upsample_mode == "pixelshuffle":
                h = pixelshuffle_block(
                    self.nf, factor, act_type=self.act_type, dtype=self.dtype
                )(h)
            else:
                h = upconv(self.nf, factor, act_type=self.act_type, dtype=self.dtype)(h)
        h = conv_block(self.nf, 3, norm_type=None, act_type=self.act_type, dtype=self.dtype)(h)
        return conv_block(self.out_nc, 3, norm_type=None, act_type=None, dtype=self.dtype)(h)


class RRDBNetResidualConv(nn.Module):
    """DDM-conditioned ESRGAN generator for the Adaptive model.

    Reference: architecture.py:208-297 — ``nb_ada`` conditioned blocks
    (resconv or concat flavor) run first on the head features, then ``nb``
    plain RRDBs, trunk conv, long skip, nearest-upconv tail. Called as
    ``apply(params, x, adaptive_weights)`` with a (B,h,w,1) weight map.
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    nb_ada: int = 1
    concat: bool = False  # False: RRDB_Residual_conv; True: _concat variant
    upscale: int = 4
    act_type: str = "leakyrelu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, adaptive_weights):
        n_up = 1 if self.upscale == 3 else int(math.log2(self.upscale))
        fea = conv_block(self.nf, 3, norm_type=None, act_type=None, dtype=self.dtype)(x)
        h = fea
        block_cls = RRDBResidualConvConcat if self.concat else RRDBResidualConv
        for _ in range(self.nb_ada):
            h = block_cls(
                nc=self.nf, gc=self.gc, act_type=self.act_type, dtype=self.dtype
            )(h, adaptive_weights)
        for _ in range(self.nb):
            h = RRDB(
                nc=self.nf, gc=self.gc, act_type=self.act_type, dtype=self.dtype
            )(h)
        h = conv_block(self.nf, 3, norm_type=None, act_type=None, dtype=self.dtype)(h)
        h = fea + h
        for _ in range(n_up):
            factor = 3 if self.upscale == 3 else 2
            h = upconv(self.nf, factor, act_type=self.act_type, dtype=self.dtype)(h)
        h = conv_block(self.nf, 3, norm_type=None, act_type=self.act_type, dtype=self.dtype)(h)
        return conv_block(self.out_nc, 3, norm_type=None, act_type=None, dtype=self.dtype)(h)


class RRDBNet(nn.Module):
    """ESRGAN generator (architecture.py:174-205). nf=64 nb=23 gc=32 by default.

    ``fused_tail=True`` computes the upsampling tail in phase-major packed
    form (ops/packed.py): the two nearest-x2 upconvs become 2x2 phase convs
    at the *input* resolution (no repeated-tensor HBM round-trip), the last
    upconv's output stays packed, and the HR/output convs run as packed 3x3
    convs at half their nominal resolution — where v5e conv throughput is
    2-4x higher (large-spatial 64ch convs measured at ~45-52 TFLOP/s vs
    88+ at small sizes). Exact same math and the SAME parameter tree
    (apply-time weight transforms). Requires even H/W, upsample_mode
    'upconv' and upscale in {2, 4, 8}."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    upscale: int = 4
    norm_type: Optional[str] = None
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    upsample_mode: str = "upconv"
    fused_tail: bool = False
    scan_blocks: bool = False  # lax.scan the trunk over stacked weights
    dtype: Dtype = None

    def _scanned_trunk(self, h):
        """Run the nb RRDBs as ONE lax.scan over apply-time-stacked weights.

        Identical math and parameter tree (stacking is a cheap device-side
        gather of the per-block params); compiles the block body once
        (23x smaller HLO) and lets XLA reuse the same buffers across
        blocks — measured ~6% faster than the unrolled chain and far
        faster to compile."""
        from dasr_tpu.nn.blocks import _RRDBParams, grouped_rdb5c_apply
        from dasr_tpu.nn.layers import act_fn

        dtype = self.dtype or h.dtype
        act = act_fn(self.act_type)
        # same parameter tree as the unrolled RRDB path (param shells)
        kb = [
            _RRDBParams(self.nf, self.gc, name=f"RRDB_{i}")()
            for i in range(self.nb)
        ]
        # stack over blocks: per (j, k) a (nb, 3, 3, cin, cout) kernel array
        stacked = tuple(
            (
                tuple(
                    jnp.stack([kb[i][j][0][k] for i in range(self.nb)]).astype(dtype)
                    for k in range(5)
                ),
                tuple(
                    jnp.stack([kb[i][j][1][k] for i in range(self.nb)]).astype(dtype)
                    for k in range(5)
                ),
            )
            for j in range(3)
        )

        def body(carry, per_block):
            out = carry
            for j in range(3):
                ks, bs = per_block[j]
                out = grouped_rdb5c_apply(
                    out, list(ks), list(bs), act, self.nf, self.gc
                )
            return carry + 0.2 * out, None

        h, _ = jax.lax.scan(body, h, stacked)
        return h

    @nn.compact
    def __call__(self, x):
        from dasr_tpu.nn.blocks import _ConvBlockParams
        from dasr_tpu.nn.layers import act_fn
        from dasr_tpu.ops.packed import packed_conv22, unpack22

        fused = self.fused_tail
        if fused:
            assert self.upsample_mode == "upconv" and self.upscale in (2, 4, 8)
        n_up = 1 if self.upscale == 3 else int(math.log2(self.upscale))
        fea = conv_block(
            self.nf, 3, norm_type=None, act_type=None, dtype=self.dtype,
            name="conv_block_0",
        )(x)
        h = fea
        if self.scan_blocks:
            assert self.norm_type is None and self.mode == "CNA"
            h = self._scanned_trunk(h)
        else:
            for _ in range(self.nb):
                h = RRDB(
                    nc=self.nf, gc=self.gc, norm_type=self.norm_type,
                    act_type=self.act_type, mode="CNA", dtype=self.dtype,
                )(h)
        h = conv_block(
            self.nf, 3, norm_type=self.norm_type, act_type=None,
            mode=self.mode, dtype=self.dtype, name="conv_block_1",
        )(h)
        h = fea + h  # long skip (ShortcutBlock, block.py:97-111)
        for i in range(n_up):
            factor = 3 if self.upscale == 3 else 2
            if self.upsample_mode == "upconv":
                h = upconv(
                    self.nf, factor, act_type=self.act_type, dtype=self.dtype,
                    fused=fused, keep_packed=fused and i == n_up - 1,
                )(h)
            else:
                h = pixelshuffle_block(
                    self.nf, factor, act_type=self.act_type, dtype=self.dtype
                )(h)
        if fused:
            # h is pack22 of the full-res feature map; run the HR and output
            # convs packed (half their nominal spatial size) and unpack the
            # cheap out_nc-channel result at the very end
            dtype = self.dtype or h.dtype
            k2, b2 = _ConvBlockParams(self.nf, self.nf, name="conv_block_2")()
            h = packed_conv22(
                h, k2.astype(dtype), bias=b2, act=act_fn(self.act_type)
            )
            k3, b3 = _ConvBlockParams(self.out_nc, self.nf, name="conv_block_3")()
            return unpack22(packed_conv22(h, k3.astype(dtype), bias=b3))
        h = conv_block(
            self.nf, 3, norm_type=None, act_type=self.act_type, dtype=self.dtype,
            name="conv_block_2",
        )(h)
        return conv_block(
            self.out_nc, 3, norm_type=None, act_type=None, dtype=self.dtype,
            name="conv_block_3",
        )(h)
