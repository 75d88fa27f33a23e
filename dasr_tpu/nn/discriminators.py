"""Discriminator architectures.

Capability map to the reference:
  * ``DiscriminatorBasic`` — FSSR "FSD": 4 convs 5x5 (64/128/256/1),
    Batch or Instance norm, LeakyReLU 0.2, fully-conv patch logits
    (reference: codes/DSN/model.py:173-210, duplicated at
    codes/SRN/models/modules/architecture.py:833-870).
  * ``NLayerDiscriminator`` — pix2pix PatchGAN. Covers both reference
    variants: the DSN one with a configurable stride (codes/DSN/
    model.py:121-170) and the SRN one (always stride 2, middle convs
    bias-free, architecture.py:983-1024) via ``use_bias_middle``.
  * ``FSDiscriminator`` — frequency-separation wrapper: optional
    gaussian/avg-pool high-pass or Haar high-band concat front-end, one of
    the three D bodies, sigmoid unless wgan, relativistic ``y`` input
    (codes/DSN/model.py:60-118 == architecture.py:922-980).
  * ``DiscriminatorVGG`` — VGG-style global D with two linear heads; the
    128-input variant matches architecture.py:442-495 layer-for-layer, other
    input sizes (48/96/192) reuse the same downsample-to-4x4 schedule.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from dasr_tpu.nn.layers import InstanceNorm, get_norm
from dasr_tpu.ops.dwt import haar_bands
from dasr_tpu.ops.filters import filter_high

Dtype = Any


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class DiscriminatorBasic(nn.Module):
    in_ch: int = 3
    norm_layer: str = "Batch"
    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = None

    def _norm(self, x):
        if self.norm_layer.lower() == "batch":
            return nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
            )(x)
        if self.norm_layer.lower() == "instance":
            return InstanceNorm()(x)
        raise NotImplementedError(f"{self.norm_layer} norm layer is not recognized")

    @nn.compact
    def __call__(self, x):
        x = _lrelu(nn.Conv(64, (5, 5), padding="SAME", dtype=self.dtype)(x))
        x = _lrelu(self._norm(nn.Conv(128, (5, 5), padding="SAME", dtype=self.dtype)(x)))
        x = _lrelu(self._norm(nn.Conv(256, (5, 5), padding="SAME", dtype=self.dtype)(x)))
        return nn.Conv(1, (1, 1), dtype=self.dtype)(x)


class NLayerDiscriminator(nn.Module):
    in_ch: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm_layer: str = "Instance"
    stride: int = 2
    # None: torch-DSN rule (bias iff InstanceNorm); False: SRN hardcoded
    use_bias_middle: Optional[bool] = None
    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kw, padw = 4, 1
        if self.use_bias_middle is None:
            use_bias = self.norm_layer.lower() == "instance"
        else:
            use_bias = self.use_bias_middle

        def norm(v):
            n = get_norm(self.norm_layer, self.use_running_average, self.axis_name)
            return n(v)

        def conv(v, ch, s, bias):
            return nn.Conv(
                ch,
                (kw, kw),
                strides=(s, s),
                padding=[(padw, padw), (padw, padw)],
                use_bias=bias,
                dtype=self.dtype,
            )(v)

        x = _lrelu(conv(x, self.ndf, self.stride, True))
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            x = _lrelu(norm(conv(x, self.ndf * nf_mult, self.stride, use_bias)))
        nf_mult = min(2**self.n_layers, 8)
        x = _lrelu(norm(conv(x, self.ndf * nf_mult, 1, use_bias)))
        return conv(x, 1, 1, True)


class FSDiscriminator(nn.Module):
    """High-pass filter front-end + D body (+ sigmoid unless wgan)."""

    d_arch: str = "FSD"
    filter_type: Optional[str] = "gau"  # 'gau' | 'avg_pool' | 'wavelet' | None
    kernel_size: int = 5
    recursions: int = 1
    stride: int = 1
    cs: str = "cat"
    norm_layer: str = "Instance"
    wgan: bool = False
    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = None

    def _filter(self, x):
        ft = (self.filter_type or "").lower()
        if not ft:
            return x
        if ft in ("gau", "avg_pool"):
            return filter_high(
                x,
                kernel_size=self.kernel_size,
                stride=self.stride,
                recursions=self.recursions,
                include_pad=False,
                gaussian=(ft == "gau"),
            )
        if ft == "wavelet":
            _, high = haar_bands(x, norm=True, cs=self.cs)
            return high
        raise NotImplementedError(
            f"Frequency Separation type [{self.filter_type}] not recognized"
        )

    @nn.compact
    def __call__(self, x, y=None):
        body_kw = dict(
            use_running_average=self.use_running_average,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )
        arch = self.d_arch.lower()
        n_in = 9 if (self.filter_type or "").lower() == "wavelet" and self.cs == "cat" else 3
        if arch == "fsd":
            net = DiscriminatorBasic(in_ch=n_in, norm_layer=self.norm_layer, **body_kw)
        elif arch == "nld_s1":
            net = NLayerDiscriminator(
                in_ch=n_in, ndf=64, n_layers=2, norm_layer=self.norm_layer,
                stride=1, **body_kw,
            )
        elif arch == "nld_s2":
            net = NLayerDiscriminator(
                in_ch=n_in, ndf=64, n_layers=2, norm_layer=self.norm_layer,
                stride=2, **body_kw,
            )
        else:
            raise NotImplementedError(
                f"Discriminator architecture [{self.d_arch}] not recognized"
            )
        out = net(self._filter(x))
        if y is not None:
            out = out - jnp.mean(net(self._filter(y)), axis=0, keepdims=True)
        if not self.wgan:
            out = nn.sigmoid(out)
        return out


class DiscriminatorVGG(nn.Module):
    """VGG-style global discriminator, downsampling to 4x4 then 2 linears.

    ``input_size=128`` reproduces Discriminator_VGG_128
    (architecture.py:442-495); 48/96/192 reuse the same
    (3x3 s1 + 4x4 s2 + BN) pair schedule with the reference's channel caps.
    """

    input_size: int = 128
    in_ch: int = 3
    nf: int = 64
    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        def bn(v):
            return nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
            )(v)

        def conv(v, ch, k, s, bias):
            p = 1
            return nn.Conv(
                ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                use_bias=bias, dtype=self.dtype,
            )(v)

        size = self.input_size
        ch = self.nf
        # stage 0: conv3 s1 (bias, no norm) + conv4 s2 + BN
        x = _lrelu(conv(x, ch, 3, 1, True))
        x = _lrelu(bn(conv(x, ch, 4, 2, False)))
        size //= 2
        while size > 4:
            next_ch = min(ch * 2, self.nf * 8)
            x = _lrelu(bn(conv(x, next_ch, 3, 1, False)))
            x = _lrelu(bn(conv(x, next_ch, 4, 2, False)))
            ch = next_ch
            size //= 2
        x = x.reshape(x.shape[0], -1)
        x = _lrelu(nn.Dense(100, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)
