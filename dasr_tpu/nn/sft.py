"""SFT-GAN architecture (BasicSR legacy registry entries 'sft_arch' /
'dis_acd'; reference: codes/SRN/models/modules/sft_arch.py:8-226).

Spatial Feature Transform: a condition branch produces per-pixel (scale,
shift) pairs that modulate the SR trunk's features. The reference's shipped
``SFT_Net.forward`` is partially commented out (sft_arch.py:76-83, the SFT
branch is bypassed); here the *full* documented architecture runs — conv
head, 16 SFT residual blocks conditioned on the segmentation feature, SFT +
conv fusion, 2x pixel-shuffle HR branch — which is what 'sft_arch' users
expect.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

Dtype = Any


def _lrelu01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class SFTLayer(nn.Module):
    dtype: Dtype = None

    @nn.compact
    def __call__(self, fea, cond):
        # param names mirror the reference's SFT_{scale,shift}_conv{0,1}
        # (sft_arch.py:11-14) so the .pth key map is 1:1
        scale = nn.Conv(64, (1, 1), dtype=self.dtype, name="scale_conv1")(
            _lrelu01(nn.Conv(32, (1, 1), dtype=self.dtype, name="scale_conv0")(cond))
        )
        shift = nn.Conv(64, (1, 1), dtype=self.dtype, name="shift_conv1")(
            _lrelu01(nn.Conv(32, (1, 1), dtype=self.dtype, name="shift_conv0")(cond))
        )
        return fea * (scale + 1) + shift


class ResBlockSFT(nn.Module):
    dtype: Dtype = None

    @nn.compact
    def __call__(self, fea, cond):
        h = SFTLayer(dtype=self.dtype, name="sft0")(fea, cond)
        h = nn.relu(
            nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv0")(h)
        )
        h = SFTLayer(dtype=self.dtype, name="sft1")(h, cond)
        h = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        return fea + h


class SFTNet(nn.Module):
    n_blocks: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, img, seg):
        """img: (B,H,W,3); seg: (B,4H,4W,8) segmentation probability maps
        (the reference's CondNet downsamples 4x with a stride-4 conv)."""
        cond = nn.Conv(
            128, (4, 4), strides=(4, 4), dtype=self.dtype, name="cond0"
        )(seg)
        cond = _lrelu01(cond)
        for i in range(3):
            cond = _lrelu01(
                nn.Conv(128, (1, 1), dtype=self.dtype, name=f"cond{i + 1}")(cond)
            )
        cond = nn.Conv(32, (1, 1), dtype=self.dtype, name="cond4")(cond)

        fea = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv0")(img)
        h = fea
        for i in range(self.n_blocks):
            h = ResBlockSFT(dtype=self.dtype, name=f"block{i}")(h, cond)
        h = SFTLayer(dtype=self.dtype, name="sft_tail")(h, cond)
        h = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv_tail")(h)
        h = fea + h

        # HR branch: two pixel-shuffle x2 stages then conv head
        for i in range(2):
            h = nn.Conv(
                256, (3, 3), padding="SAME", dtype=self.dtype, name=f"up{i}"
            )(h)
            b, hh, ww, cc = h.shape
            h = h.reshape(b, hh, ww, 2, 2, cc // 4)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 2, ww * 2, cc // 4)
            h = nn.relu(h)
        h = nn.relu(
            nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="hr_conv")(h)
        )
        return nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="out_conv")(h)


class ACDVGGBN96(nn.Module):
    """Auxiliary-classifier discriminator (sft_arch.py:87-...): VGG-BN-96
    feature stack + GAN head (+ class head in the full reference; the GAN
    head is what 'dis_acd' training uses)."""

    n_classes: int = 8
    use_running_average: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        def bn(v):
            return nn.BatchNorm(
                use_running_average=self.use_running_average, momentum=0.9
            )(v)

        chans = [(64, 3, 1, False), (64, 4, 2, True), (128, 3, 1, True),
                 (128, 4, 2, True), (256, 3, 1, True), (256, 4, 2, True),
                 (512, 3, 1, True), (512, 4, 2, True)]
        for ch, k, s, use_bn in chans:
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
            )(x)
            if use_bn:
                x = bn(x)
            x = _lrelu01(x)
        flat = x.reshape(x.shape[0], -1)
        gan = nn.Dense(1, dtype=self.dtype)(
            _lrelu01(nn.Dense(100, dtype=self.dtype)(flat))
        )
        cls = nn.Dense(self.n_classes, dtype=self.dtype)(
            _lrelu01(nn.Dense(100, dtype=self.dtype)(flat))
        )
        return gan, cls
