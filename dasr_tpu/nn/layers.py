"""Shared layer primitives (flax.linen, NHWC, bf16-friendly).

Design notes (TPU-first, not a torch translation):
  * all convs are NHWC so XLA lays channels on the lane dimension;
  * params live in f32, compute dtype is configurable (bf16 in training);
  * normalization layers take an optional ``axis_name`` so BatchNorm can
    compute cross-replica statistics under shard_map data parallelism —
    the reference trained single-GPU (per-device stats), we expose both.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch nn.PReLU default)."""

    init_slope: float = 0.25
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        slope = self.param(
            "slope", lambda _k: jnp.asarray(self.init_slope, self.param_dtype)
        )
        return jnp.where(x >= 0, x, x * slope.astype(x.dtype))


def act_fn(name: Optional[str], neg_slope: float = 0.2) -> Optional[Callable]:
    if name is None:
        return None
    low = name.lower()
    if low == "relu":
        return nn.relu
    if low in ("leakyrelu", "lrelu"):
        return lambda x: nn.leaky_relu(x, negative_slope=neg_slope)
    if low == "sigmoid":
        return nn.sigmoid
    raise NotImplementedError(f"activation [{name}] not found")


class InstanceNorm(nn.Module):
    """InstanceNorm2d, torch defaults: no affine, no running stats."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


def get_norm(
    norm_type: Optional[str],
    use_running_average: bool = False,
    axis_name: Optional[str] = None,
):
    """Norm factory: 'batch' / 'instance' / None."""
    if norm_type is None:
        return None
    low = norm_type.lower()
    if low == "batch":
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,  # torch momentum 0.1 == flax momentum 0.9
            epsilon=1e-5,
            axis_name=axis_name,
        )
    if low == "instance":
        return InstanceNorm()
    raise NotImplementedError(f"normalization layer [{norm_type}] not found")


class conv_block(nn.Module):
    """Conv + norm + activation in CNA or NAC order.

    Capability parity with the reference's ``conv_block``
    (reference: codes/SRN/models/modules/block.py:130-157); only zero
    padding is used by shipped configs.
    """

    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    norm_type: Optional[str] = None
    act_type: Optional[str] = "leakyrelu"
    mode: str = "CNA"
    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        conv = nn.Conv(
            self.out_ch,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )
        if self.act_type and self.act_type.lower() == "prelu":
            # reference block.py:20-21: nn.PReLU(num_parameters=1, init=0.2)
            prelu = PReLU(init_slope=0.2)
            act = lambda v: prelu(v)  # noqa: E731
        else:
            act = act_fn(self.act_type)
        norm = get_norm(
            self.norm_type, self.use_running_average, self.axis_name
        )
        if self.mode == "CNA":
            x = conv(x)
            if norm is not None:
                x = norm(x)
            if act is not None:
                x = act(x)
            return x
        if self.mode == "NAC":
            if norm is not None:
                x = norm(x)
            if act is not None:
                x = act(x)
            return conv(x)
        raise NotImplementedError(f"conv mode [{self.mode}] not found")
