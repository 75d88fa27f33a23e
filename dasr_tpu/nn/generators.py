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
import jax.numpy as jnp

from dasr_tpu.nn.blocks import (
    RRDB,
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


class DeResnet(nn.Module):
    n_res_blocks: int = 8
    scale: int = 4
    features: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
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
    """ESRGAN generator (architecture.py:174-205). nf=64 nb=23 gc=32 by default."""

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
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        n_up = 1 if self.upscale == 3 else int(math.log2(self.upscale))
        fea = conv_block(self.nf, 3, norm_type=None, act_type=None, dtype=self.dtype)(x)
        h = fea
        for _ in range(self.nb):
            h = RRDB(
                nc=self.nf, gc=self.gc, norm_type=self.norm_type,
                act_type=self.act_type, mode="CNA", dtype=self.dtype,
            )(h)
        h = conv_block(
            self.nf, 3, norm_type=self.norm_type, act_type=None,
            mode=self.mode, dtype=self.dtype,
        )(h)
        h = fea + h  # long skip (ShortcutBlock, block.py:97-111)
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
