"""Core residual blocks.

Capability map to the reference:
  * ``ResidualBlock``      — DSN conv-PReLU-conv residual
                             (reference: codes/DSN/model.py:213-224)
  * ``RDB5C`` / ``RRDB``   — ESRGAN residual-dense core
                             (reference: codes/SRN/models/modules/block.py:254-309)
  * ``upconv``             — nearest-x2 + conv + act upsampler
                             (reference: block.py:854-861)
  * ``pixelshuffle_block`` — conv + depth-to-space upsampler (block.py:838-851)

The five dense convs of an RDB are expressed with explicit concats; XLA
fuses the concat chains and keeps every conv MXU-shaped (channels multiples
of 32/64).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from dasr_tpu.nn.layers import PReLU, conv_block

Dtype = Any


class ResidualBlock(nn.Module):
    """conv3x3 -> PReLU -> conv3x3, additive skip (DSN/model.py:213-224)."""

    channels: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
        r = PReLU()(r)
        r = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(r)
        return x + r


class RDB5C(nn.Module):
    """Residual Dense Block, 5 convs (block.py:254-286); out = x + 0.2*conv5."""

    nc: int = 64
    gc: int = 32
    norm_type: Optional[str] = None
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kw = dict(
            norm_type=self.norm_type,
            act_type=self.act_type,
            mode=self.mode,
            dtype=self.dtype,
        )
        x1 = conv_block(self.gc, 3, **kw)(x)
        x2 = conv_block(self.gc, 3, **kw)(jnp.concatenate([x, x1], -1))
        x3 = conv_block(self.gc, 3, **kw)(jnp.concatenate([x, x1, x2], -1))
        x4 = conv_block(self.gc, 3, **kw)(jnp.concatenate([x, x1, x2, x3], -1))
        last_act = None if self.mode == "CNA" else self.act_type
        x5 = conv_block(
            self.nc,
            3,
            norm_type=self.norm_type,
            act_type=last_act,
            mode=self.mode,
            dtype=self.dtype,
        )(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + x5 * 0.2


class RRDB(nn.Module):
    """Residual-in-Residual Dense Block (block.py:289-309)."""

    nc: int = 64
    gc: int = 32
    norm_type: Optional[str] = None
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kw = dict(
            nc=self.nc,
            gc=self.gc,
            norm_type=self.norm_type,
            act_type=self.act_type,
            mode=self.mode,
            dtype=self.dtype,
        )
        out = RDB5C(**kw)(x)
        out = RDB5C(**kw)(out)
        out = RDB5C(**kw)(out)
        return x + out * 0.2


class upconv(nn.Module):
    """Nearest-neighbour x`factor` upsample + conv + act (block.py:854-861)."""

    out_ch: int
    factor: int = 2
    act_type: Optional[str] = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, self.factor, axis=-3), self.factor, axis=-2)
        return conv_block(
            self.out_ch, 3, norm_type=None, act_type=self.act_type, dtype=self.dtype
        )(x)


class pixelshuffle_block(nn.Module):
    """conv to r^2*C then depth-to-space (block.py:838-851)."""

    out_ch: int
    factor: int = 2
    act_type: Optional[str] = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        r = self.factor
        x = conv_block(
            self.out_ch * r * r, 3, norm_type=None, act_type=None, dtype=self.dtype
        )(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, r, r, c // (r * r))
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))
        from dasr_tpu.nn.layers import act_fn

        act = act_fn(self.act_type)
        return act(x) if act else x
