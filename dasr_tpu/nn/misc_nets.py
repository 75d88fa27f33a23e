"""Remaining architecture zoo: EDSR commons, module utils, feature
extractors, CycleGAN generator.

Capability map:
  * ``MeanShift`` / ``EDSRResBlock`` / ``Upsampler`` — EDSR-style commons
    (reference: codes/SRN/models/common.py:7-90, used by scripts/SRN.py)
  * ``ResidualBlockNoBN`` / ``make_layer`` / ``flow_warp`` — misc module
    utils (reference: codes/SRN/models/modules/module_util.py:7-79)
  * ``MINCNet`` — MINC material-feature extractor (architecture.py:1116-1175)
  * ``ResNet101Features`` — truncated ResNet101 extractor
    (architecture.py:1092-1113); weights importable from a torchvision
    state dict like the VGG backbones
  * ``ResnetGenerator`` — CycleGAN-style generator (architecture.py:301-388)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class MeanShift(nn.Module):
    """Fixed RGB mean/std shift conv (common.py:7-18)."""

    rgb_range: float = 1.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)
    sign: int = -1

    @nn.compact
    def __call__(self, x):
        std = jnp.asarray(self.rgb_std, x.dtype)
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        return (x + self.sign * self.rgb_range * mean / std) / std


class EDSRResBlock(nn.Module):
    nf: int = 64
    res_scale: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return x + h * self.res_scale


class Upsampler(nn.Module):
    """Pixel-shuffle upsampler chain (common.py:61-90)."""

    scale: int = 4
    nf: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        import math

        n = 1 if self.scale == 3 else int(math.log2(self.scale))
        r = 3 if self.scale == 3 else 2
        for _ in range(n):
            x = nn.Conv(self.nf * r * r, (3, 3), padding="SAME", dtype=self.dtype)(x)
            b, h, w, c = x.shape
            x = x.reshape(b, h, w, r, r, c // (r * r))
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))
        return x


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv residual, norm-free (module_util.py:36-56)."""

    nf: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype)(x))
        return x + nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype)(h)


def make_layer(block_fn, n: int):
    """Stack n blocks functionally (module_util.py:28-33)."""

    def apply(x):
        for _ in range(n):
            x = block_fn()(x)
        return x

    return apply


def flow_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear warp of NHWC ``x`` by a (B,H,W,2) flow in pixels
    (module_util.py:59-79 semantics, border-clamped)."""
    b, h, w, c = x.shape
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    sy = jnp.clip(grid_y[None] + flow[..., 1], 0, h - 1)
    sx = jnp.clip(grid_x[None] + flow[..., 0], 0, w - 1)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    def gather(yy, xx):
        bidx = jnp.arange(b)[:, None, None]
        return x[bidx, yy, xx]

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class MINCNet(nn.Module):
    """MINC VGG-ish feature net (architecture.py:1116-1175)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        for si, (ch, n) in enumerate(cfg):
            for _ in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x))
            if si < len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class ResNet101Features(nn.Module):
    """First two ResNet101 stages (conv1 + layer1), input-normalized
    (architecture.py:1092-1113)."""

    use_input_norm: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        if self.use_input_norm:
            mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
            x = (x - mean) / std
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=True)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        # layer1: 3 bottlenecks 64-64-256
        for i in range(3):
            identity = x
            h = nn.relu(nn.BatchNorm(use_running_average=True)(
                nn.Conv(64, (1, 1), use_bias=False, dtype=self.dtype)(x)))
            h = nn.relu(nn.BatchNorm(use_running_average=True)(
                nn.Conv(64, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(h)))
            h = nn.BatchNorm(use_running_average=True)(
                nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype)(h))
            if i == 0:
                identity = nn.BatchNorm(use_running_average=True)(
                    nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype)(x))
            x = nn.relu(h + identity)
        return x


class ResnetGenerator(nn.Module):
    """CycleGAN-style generator (architecture.py:301-388): c7s1-64, two
    stride-2 downs, n residual blocks, two transposed-conv ups, c7s1-3."""

    out_nc: int = 3
    ngf: int = 64
    n_blocks: int = 6
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        def inorm(v):
            mean = jnp.mean(v, axis=(-3, -2), keepdims=True)
            var = jnp.var(v, axis=(-3, -2), keepdims=True)
            return (v - mean) * jax.lax.rsqrt(var + 1e-5)

        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.relu(inorm(nn.Conv(self.ngf, (7, 7), padding="VALID", dtype=self.dtype)(x)))
        for mult in (2, 4):
            x = nn.relu(inorm(nn.Conv(
                self.ngf * mult, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                dtype=self.dtype)(x)))
        for _ in range(self.n_blocks):
            h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            h = nn.relu(inorm(nn.Conv(self.ngf * 4, (3, 3), padding="VALID", dtype=self.dtype)(h)))
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            h = inorm(nn.Conv(self.ngf * 4, (3, 3), padding="VALID", dtype=self.dtype)(h))
            x = x + h
        for mult in (2, 1):
            x = nn.relu(inorm(nn.ConvTranspose(
                self.ngf * mult, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype)(x)))
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        return jnp.tanh(nn.Conv(self.out_nc, (7, 7), padding="VALID", dtype=self.dtype)(x))
