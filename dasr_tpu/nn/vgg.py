"""Feature-extraction backbones (AlexNet / VGG16 / VGG19), NHWC flax.

These back the LPIPS metric (reference: codes/PerceptualSimilarity/models/
pretrained_networks.py:6-181 slices torchvision backbones into tap stages)
and the SRN VGG feature loss (reference: codes/SRN/models/modules/
architecture.py:1060-1088, VGG19 feature_layer 34).

Pretrained weights are not bundled (no egress in this environment); import
them from torchvision-format ``.pth`` state dicts with
``dasr_tpu.train.checkpoints.import_torch_conv_params`` — layer names here
are chosen so the mapping is mechanical (conv0, conv1, ... in torch module
order).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# (out_ch, kernel, stride, pad) per conv; 'M' = 3x3/2 maxpool (alexnet) or
# 2x2/2 maxpool (vgg); taps taken after the ReLU of the listed conv indices.
_ALEX_CFG: Sequence = [(64, 11, 4, 2), "M3", (192, 5, 1, 2), "M3", (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1)]
_ALEX_TAPS = (0, 1, 2, 3, 4)  # tap after each conv's relu (relu1..relu5)

_VGG16_CFG: Sequence = [
    (64, 3, 1, 1), (64, 3, 1, 1), "M2",
    (128, 3, 1, 1), (128, 3, 1, 1), "M2",
    (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "M2",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "M2",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
]
_VGG16_TAPS = (1, 3, 6, 9, 12)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

_VGG19_CFG: Sequence = [
    (64, 3, 1, 1), (64, 3, 1, 1), "M2",
    (128, 3, 1, 1), (128, 3, 1, 1), "M2",
    (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "M2",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "M2",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
]


class _ConvStack(nn.Module):
    cfg: Tuple
    taps: Tuple[int, ...]
    final_conv_no_relu: bool = False  # for VGG19-54 'before ReLU' semantics
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        conv_idx = 0
        n_convs = sum(1 for c in self.cfg if c != "M2" and c != "M3")
        for item in self.cfg:
            if item == "M2":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            if item == "M3":
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
                continue
            ch, k, s, p = item
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                dtype=self.dtype, name=f"conv{conv_idx}",
            )(x)
            is_last = conv_idx == n_convs - 1
            if not (is_last and self.final_conv_no_relu):
                x = nn.relu(x)
            if conv_idx in self.taps:
                outs.append(x)
            conv_idx += 1
        return outs


class AlexNetFeatures(nn.Module):
    """5-tap AlexNet feature pyramid (LPIPS 'alex')."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return _ConvStack(tuple(_ALEX_CFG), _ALEX_TAPS, dtype=self.dtype, name="stack")(x)


class VGG16Features(nn.Module):
    """5-tap VGG16 feature pyramid (LPIPS 'vgg', DSN VGG16 perceptual loss)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return _ConvStack(tuple(_VGG16_CFG), _VGG16_TAPS, dtype=self.dtype, name="stack")(x)


class Fire(nn.Module):
    """SqueezeNet Fire module: 1x1 squeeze -> relu -> [1x1 | 3x3] expand
    concat (torchvision squeezenet1_1 layout; reference slices it at
    codes/PerceptualSimilarity/models/pretrained_networks.py:6-42)."""

    squeeze_ch: int
    expand_ch: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype,
                            name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand_ch, (1, 1), dtype=self.dtype,
                             name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand_ch, (3, 3), padding="SAME",
                             dtype=self.dtype, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


# (squeeze_ch, expand_ch) per Fire in torchvision squeezenet1_1.features;
# taps follow the reference's 7 slices (after features idx 1,4,7,9,10,11,12)
_SQUEEZE_FIRES = ((16, 64), (16, 64), (32, 128), (32, 128),
                  (48, 192), (48, 192), (64, 256), (64, 256))


class SqueezeNetFeatures(nn.Module):
    """7-tap squeezenet1_1 feature pyramid (LPIPS 'squeeze')."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        outs = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv0")(x))
        outs.append(x)  # slice1: features[0:2]
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(*_SQUEEZE_FIRES[0], dtype=self.dtype, name="fire3")(x)
        x = Fire(*_SQUEEZE_FIRES[1], dtype=self.dtype, name="fire4")(x)
        outs.append(x)  # slice2: features[2:5]
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(*_SQUEEZE_FIRES[2], dtype=self.dtype, name="fire6")(x)
        x = Fire(*_SQUEEZE_FIRES[3], dtype=self.dtype, name="fire7")(x)
        outs.append(x)  # slice3: features[5:8]
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(*_SQUEEZE_FIRES[4], dtype=self.dtype, name="fire9")(x)
        outs.append(x)  # slice4: features[8:10]
        x = Fire(*_SQUEEZE_FIRES[5], dtype=self.dtype, name="fire10")(x)
        outs.append(x)  # slice5
        x = Fire(*_SQUEEZE_FIRES[6], dtype=self.dtype, name="fire11")(x)
        outs.append(x)  # slice6
        x = Fire(*_SQUEEZE_FIRES[7], dtype=self.dtype, name="fire12")(x)
        outs.append(x)  # slice7
        return outs


_IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


class VGG19Feature54(nn.Module):
    """VGG19 conv5_4 (pre-ReLU, feature_layer 34) with ImageNet input norm.

    Reference: codes/SRN/models/modules/architecture.py:1060-1088 +
    codes/SRN/models/networks.py:247-261 (define_F).
    """

    use_input_norm: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN.astype(x.dtype)) / _IMAGENET_STD.astype(x.dtype)
        outs = _ConvStack(
            tuple(_VGG19_CFG), (15,), final_conv_no_relu=True,
            dtype=self.dtype, name="stack",
        )(x)
        return outs[0]
