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


class DiscriminatorVGGStack(nn.Module):
    """Explicit-stage VGG-style discriminator body.

    ``stages`` is a tuple of (out_ch_multiplier, kernel, stride, use_norm)
    applied to ``nf``; with ``head=True`` it flattens into the reference's
    two-linear classifier (flax Dense infers the input dim, so all the
    per-variant ``512*k*k`` head sizes come out automatically). Covers
    Discriminator_VGG_96/192/192_wavelet/48 and the patch variant
    (reference: architecture.py:544-830).
    """

    stages: tuple
    nf: int = 64
    norm_type: Optional[str] = "batch"
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    head: bool = True
    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        from dasr_tpu.nn.layers import conv_block

        for mult, k, s, use_norm in self.stages:
            x = conv_block(
                self.nf * mult, k, stride=s,
                norm_type=self.norm_type if use_norm else None,
                act_type=self.act_type, mode=self.mode,
                use_running_average=self.use_running_average,
                axis_name=self.axis_name, dtype=self.dtype,
            )(x)
        if not self.head:
            return x
        x = x.reshape(x.shape[0], -1)
        x = _lrelu(nn.Dense(100, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)


# stage specs per reference variant: (ch_mult, kernel, stride, use_norm)
_VGG_STAGES_96 = (
    (1, 3, 1, False), (1, 4, 2, True), (2, 3, 1, True), (2, 4, 2, True),
    (4, 3, 1, True), (4, 4, 2, True), (8, 3, 1, True), (8, 4, 2, True),
    (8, 3, 1, True), (8, 4, 2, True),
)
_VGG_STAGES_192 = _VGG_STAGES_96 + ((8, 3, 1, True), (8, 4, 2, True))
_VGG_STAGES_48 = (
    (1, 3, 1, False), (1, 4, 1, True), (2, 3, 1, True), (2, 4, 1, True),
    (4, 3, 1, True), (4, 4, 1, True), (8, 3, 1, True), (8, 4, 2, True),
    (8, 3, 1, True), (8, 4, 2, True), (8, 3, 1, True), (8, 4, 2, True),
)
_VGG_STAGES_96_PATCH = _VGG_STAGES_96 + ((8, 3, 1, True),)


def make_vgg_discriminator(which: str, in_nc: int = 3, nf: int = 64,
                           norm_type: Optional[str] = "batch",
                           act_type: str = "leakyrelu", mode: str = "CNA",
                           dtype=None, use_running_average: bool = False):
    """Variant factory matching the reference's class zoo by name."""
    specs = {
        "discriminator_vgg_96": (_VGG_STAGES_96, True),
        "discriminator_vgg_192": (_VGG_STAGES_192, True),
        "discriminator_vgg_192_wavelet": (_VGG_STAGES_192, True),
        "discriminator_vgg_48": (_VGG_STAGES_48, True),
        "discriminator_vgg_96_patch": (_VGG_STAGES_96_PATCH, False),
        "discriminator_vgg_patch": (_VGG_STAGES_96_PATCH, False),
    }
    if which not in specs:
        raise NotImplementedError(f"Discriminator model [{which}] not recognized")
    stages, head = specs[which]
    return DiscriminatorVGGStack(
        stages=stages, nf=nf, norm_type=norm_type, act_type=act_type,
        mode=mode, head=head, dtype=dtype,
        use_running_average=use_running_average,
    )


class DiscriminatorVGG128SN(nn.Module):
    """Spectral-norm VGG-128 discriminator (architecture.py:499-541 +
    modules/spectral_norm.py): 10 SN convs + 2 SN linears, no norm layers.
    Power iteration state lives in the 'batch_stats' collection (flax
    SpectralNorm); pass update_stats=True during training steps.
    """

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        def sn(layer):
            return nn.SpectralNorm(layer)

        chans = [64, 64, 128, 128, 256, 256, 512, 512, 512, 512]
        for i, ch in enumerate(chans):
            k, s = (3, 1) if i % 2 == 0 else (4, 2)
            pad = 1
            x = sn(
                nn.Conv(
                    ch, (k, k), strides=(s, s), padding=[(pad, pad), (pad, pad)],
                    dtype=self.dtype, name=f"conv{i}",
                )
            )(x, update_stats=update_stats)
            x = _lrelu(x)
        x = x.reshape(x.shape[0], -1)
        x = _lrelu(
            nn.SpectralNorm(nn.Dense(100, dtype=self.dtype, name="linear0"))(
                x, update_stats=update_stats
            )
        )
        return nn.SpectralNorm(nn.Dense(1, dtype=self.dtype, name="linear1"))(
            x, update_stats=update_stats
        )


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
