"""LPIPS (Learned Perceptual Image Patch Similarity), TPU-native.

Reimplements the reference's vendored PerceptualSimilarity 'net-lin' metric
(reference: codes/PerceptualSimilarity/models/networks_basic.py:27-111):
scaling layer -> frozen backbone taps -> unit-normalize -> squared diff ->
learned 1x1 conv per tap -> spatial mean -> sum. One jitted forward; both
images' features come from a single batched backbone pass.

Weights: the per-tap linear heads ship with the reference as tiny ``.pth``
files (codes/PerceptualSimilarity/models/weights/v0.1/{alex,vgg}.pth — data,
loadable with torch CPU); backbone weights are imported from a
torchvision-format state dict when available. Without real weights the
module still runs (deterministic init) for shape/smoke tests, but quality
parity requires importing the published weights — see
``load_lpips_params``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dasr_tpu.nn.vgg import AlexNetFeatures, SqueezeNetFeatures, VGG16Features

Dtype = Any

# ScalingLayer constants (networks_basic.py:94-101)
_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])

_CHNS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps).astype(feat.dtype)


class LPIPS(nn.Module):
    """net-lin LPIPS; inputs NHWC in [-1, 1] (like the reference's DistModel).

    ``__call__(in0, in1, normalize=True)`` accepts [0,1] inputs and maps them
    to [-1,1] first (PerceptualLoss.forward semantics, models/util.py:28-40).
    """

    net: str = "alex"  # 'alex' | 'vgg' | 'squeeze'
    use_lins: bool = True  # 'net-lin' vs plain 'net' mode
    spatial: bool = False
    version: str = "0.1"  # '0.0' reproduces the original release's bug:
    # the scaling layer is skipped (networks_basic.py:66-67)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, in0, in1, normalize: bool = False):
        if normalize:
            in0 = 2 * in0 - 1
            in1 = 2 * in1 - 1
        if self.version == "0.1":
            shift = _SHIFT.astype(in0.dtype)
            scale = _SCALE.astype(in0.dtype)
            in0 = (in0 - shift) / scale
            in1 = (in1 - shift) / scale

        backbone = {
            "alex": AlexNetFeatures,
            "vgg": VGG16Features,
            "squeeze": SqueezeNetFeatures,
        }[self.net](dtype=self.dtype, name="backbone")
        # one backbone pass over both images
        both = jnp.concatenate([in0, in1], axis=0)
        taps = backbone(both)
        # Too-small inputs collapse a backbone stage to zero spatial size,
        # and the spatial mean of an empty tap is a silent NaN. The
        # reference's torch backbone raises here ("Output size is too
        # small"); fail as loudly, at trace time (alex needs >= 32 px).
        for feat in taps:
            if feat.shape[-3] == 0 or feat.shape[-2] == 0:
                raise ValueError(
                    f"LPIPS(net={self.net!r}): input "
                    f"{in0.shape[-3]}x{in0.shape[-2]} is too small — a "
                    "backbone stage has zero spatial size (alex needs "
                    ">= 32 px per side)"
                )
        b = in0.shape[0]

        total = None
        for k, feat in enumerate(taps):
            f0, f1 = _normalize(feat[:b]), _normalize(feat[b:])
            diff = (f0 - f1) ** 2
            if self.use_lins:
                w = self.param(
                    f"lin{k}",
                    nn.initializers.constant(1.0 / _CHNS[self.net][k]),
                    (diff.shape[-1], 1),
                    jnp.float32,
                )
                d = diff.astype(jnp.float32) @ w  # 1x1 conv, no bias
            else:
                d = jnp.sum(diff.astype(jnp.float32), axis=-1, keepdims=True)
            if self.spatial:
                from dasr_tpu.ops.resize import bilinear_resize

                d = bilinear_resize(d, in0.shape[-3], in0.shape[-2])
            else:
                d = jnp.mean(d, axis=(-3, -2), keepdims=True)
            total = d if total is None else total + d
        return total  # (B, 1, 1, 1) or (B, H, W, 1) if spatial


def _torch_conv_to_nhwc(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def load_lpips_params(
    net: str = "alex",
    lin_path: Optional[str] = None,
    backbone_path: Optional[str] = None,
    base_params=None,
):
    """Build LPIPS params, importing torch weights where provided.

    * ``lin_path`` — the bundled linear heads (keys ``lin{k}.model.1.weight``,
      shape (1, C, 1, 1)); the reference ships them at
      codes/PerceptualSimilarity/models/weights/v0.1/{alex,vgg}.pth.
    * ``backbone_path`` — a torchvision alexnet/vgg16 state dict
      (``features.{i}.weight/bias``).
    * ``base_params`` — params pytree from ``LPIPS(...).init`` used as the
      structural template; required.
    """
    import torch

    params = jax.tree.map(np.asarray, base_params)

    if lin_path and os.path.exists(lin_path):
        sd = torch.load(lin_path, map_location="cpu", weights_only=True)
        for k in range(len(_CHNS[net])):
            key = f"lin{k}.model.1.weight"
            if key not in sd:  # some dumps drop the dropout index
                key = f"lin{k}.model.0.weight"
            w = sd[key].numpy()  # (1, C, 1, 1)
            params["params"][f"lin{k}"] = w[0, :, 0, 0][:, None].astype(np.float32)

    if backbone_path and os.path.exists(backbone_path):
        sd = torch.load(backbone_path, map_location="cpu", weights_only=True)
        if net == "squeeze":
            bb = params["params"]["backbone"]

            def put(dst, prefix):
                dst["kernel"] = _torch_conv_to_nhwc(sd[prefix + ".weight"].numpy())
                dst["bias"] = sd[prefix + ".bias"].numpy()

            put(bb["conv0"], "features.0")
            for i in (3, 4, 6, 7, 9, 10, 11, 12):
                for part in ("squeeze", "expand1x1", "expand3x3"):
                    put(bb[f"fire{i}"][part], f"features.{i}.{part}")
        else:
            conv_ids = sorted(
                {
                    int(k.split(".")[1])
                    for k in sd
                    if k.startswith("features.") and k.endswith(".weight")
                    and sd[k].dim() == 4
                }
            )
            stack = params["params"]["backbone"]["stack"]
            for j, i in enumerate(conv_ids):
                stack[f"conv{j}"]["kernel"] = _torch_conv_to_nhwc(
                    sd[f"features.{i}.weight"].numpy()
                )
                stack[f"conv{j}"]["bias"] = sd[f"features.{i}.bias"].numpy()

    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# DistModel breadth: L2 / DSSIM fallback metrics + model factory
# (reference: codes/PerceptualSimilarity/models/dist_model.py:40-73,
#  networks_basic.py:150-185, models/util.py:46-53)
# ---------------------------------------------------------------------------


def l2_distance(in0, in1) -> jnp.ndarray:
    """Reference DistModel 'L2' (RGB colorspace): per-image mean of the
    squared difference of the [-1,1] tensors (networks_basic.py:150-158).
    The 'Lab' colorspace path needs skimage (absent in this image) and is
    documented as gated in PARITY.md."""
    d = (jnp.asarray(in0, jnp.float32) - jnp.asarray(in1, jnp.float32)) ** 2
    return jnp.mean(d, axis=(-3, -2, -1))


def dssim_distance(in0, in1) -> np.ndarray:
    """Reference DistModel 'DSSIM' (RGB): (1 - SSIM(uint8 images)) / 2
    (models/util.py:52-53). The reference uses skimage's compare_ssim
    (7x7 uniform window, multichannel mean); this uses the repo's
    MATLAB-style gaussian-window SSIM averaged over channels — same
    definition family, window choice documented in PARITY.md."""
    from dasr_tpu.ops.metrics import calculate_ssim

    def to_im(t):
        a = (np.asarray(t, np.float32) + 1.0) / 2.0
        return np.clip(a, 0, 1) * 255.0

    a, b = to_im(in0), to_im(in1)
    out = []
    for i in range(a.shape[0]):
        ss = np.mean(
            [calculate_ssim(a[i, ..., c], b[i, ..., c]) for c in range(a.shape[-1])]
        )
        out.append((1.0 - ss) / 2.0)
    return np.asarray(out)


def create_dist_model(
    model: str = "net-lin",
    net: str = "alex",
    version: str = "0.1",
    lin_path: Optional[str] = None,
    backbone_path: Optional[str] = None,
    spatial: bool = False,
):
    """DistModel factory (dist_model.py:40-73): returns ``fn(in0, in1)`` on
    NHWC [-1,1] arrays for 'net-lin', 'net', 'L2'/'l2', 'DSSIM'/'ssim'."""
    low = model.lower()
    if low in ("l2",):
        return l2_distance
    if low in ("dssim", "ssim"):
        return dssim_distance
    if low not in ("net-lin", "net"):
        raise NotImplementedError(f"DistModel [{model}] not recognized")
    lpips = LPIPS(net=net, use_lins=(low == "net-lin"), spatial=spatial,
                  version=version)
    z = jnp.zeros((1, 64, 64, 3))
    base = lpips.init(jax.random.key(0), z, z)
    lin = lin_path or reference_lin_weights_path(net, version=version)
    variables = load_lpips_params(
        net, lin_path=lin, backbone_path=backbone_path, base_params=base
    )
    apply = jax.jit(lpips.apply)
    return lambda a, b: apply(variables, jnp.asarray(a), jnp.asarray(b))


def reference_lin_weights_path(net: str = "alex", version: str = "0.1") -> Optional[str]:
    """Path to the reference's bundled v0.0/v0.1 lin heads, if mounted."""
    p = (
        "/root/reference/codes/PerceptualSimilarity/models/weights/"
        f"v{version}/{net}.pth"
    )
    return p if os.path.exists(p) else None


def default_lpips_variables(net: str = "alex", backbone_path: Optional[str] = None,
                            init_hw: int = 64):
    """LPIPS variables for the training/eval loops: random-init structure,
    the reference's bundled lin heads when mounted, and — when available —
    a user-supplied torchvision backbone ``.pth`` (``backbone_path``
    argument, or the ``DASR_TPU_LPIPS_BACKBONE`` environment variable; no
    egress in this environment means backbones can only come from the
    user). Random-init backbone otherwise — documented delta, PARITY.md."""
    import jax

    lpips = LPIPS(net=net)
    z = jnp.zeros((1, init_hw, init_hw, 3))
    base = lpips.init(jax.random.key(0), z, z)
    backbone = backbone_path or os.environ.get("DASR_TPU_LPIPS_BACKBONE")
    if backbone and not os.path.exists(backbone):
        import sys

        print(
            f"!!! LPIPS backbone path does not exist, IGNORING it: "
            f"{backbone} (the perceptual loss runs random-init)",
            file=sys.stderr,
        )
        backbone = None
    lin = reference_lin_weights_path(net)
    if lin or backbone:
        return load_lpips_params(
            net, lin_path=lin, backbone_path=backbone, base_params=base
        )
    return base
