"""DDM-conditioning and channel-attention block variants.

The reference's experimental conditioned-RRDB zoo
(reference: codes/SRN/models/modules/block.py:335-828):

  * ``AffineModule`` / ``RRDBAffine``  — DDM -> conv features, affine
    gamma*f1*x + beta*f2 after each RDB (block.py:532-558 / 335-365)
  * ``SEANModule`` / ``RRDBSEAN``      — SEAN-style modulation: gamma/beta
    predicted from both the channel-repeated DDM and conv'd DDM paths with
    learned blend alphas (block.py:561-595 / 367-435). The reference quirks
    (``f_rep_beta`` computed with the *gamma* conv stack, and ``df2`` with
    ``ddm_conv1``) are reproduced for checkpoint parity.
  * ``RRDBAda``                        — RDB chain scaled by ddm * learned
    lambda (block.py:438-460)
  * ``AdaptiveModule``                 — real/fake dual RRDB paths selected
    per-sample by the domain mask; the reference gathers with b_split
    (block.py:598-615), here both branches run and a static-halves select
    keeps it SPMD-friendly (SURVEY.md §2.4 EP row)
  * ``CALayer`` / ``RCAB`` / ``CARRDB`` — channel attention (block.py:644-828)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dasr_tpu.nn.blocks import RDB5C, RRDB
from dasr_tpu.nn.layers import conv_block

Dtype = Any


class AffineModule(nn.Module):
    nf: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, ddm):
        conv1a = conv_block(self.nf, 3, act_type="leakyrelu", dtype=self.dtype)
        conv1b = conv_block(self.nf, 3, act_type="leakyrelu", dtype=self.dtype)
        gamma = self.param("gamma1", nn.initializers.constant(0.1), (1,))
        bias = self.param("bias1", nn.initializers.zeros, (1,))
        # reference quirk: both feature maps come from ddm_conv1
        df1 = conv1b(conv1a(ddm))
        df2 = df1
        return gamma * df1 * x + bias * df2


class RRDBAffine(nn.Module):
    nc: int = 64
    gc: int = 32
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, ddm):
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(x)
        out = AffineModule(self.nc, dtype=self.dtype)(out, ddm)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        out = AffineModule(self.nc, dtype=self.dtype)(out, ddm)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        out = AffineModule(self.nc, dtype=self.dtype)(out, ddm)
        return out * 0.2 + x


class SEANModule(nn.Module):
    nf: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, ddm):
        kw = dict(act_type="leakyrelu", dtype=self.dtype)
        rep = jnp.tile(ddm, (1, 1, 1, self.nf))
        rep_gamma_stack = [conv_block(self.nf, 3, **kw) for _ in range(2)]

        def run(stack, v):
            for c in stack:
                v = c(v)
            return v

        f_rep_gamma = run(rep_gamma_stack, rep)
        f_rep_beta = f_rep_gamma  # reference quirk (block.py:588)
        # The reference allocates a separate f_conv_rep_beta stack that the
        # quirk above leaves unused (block.py:574-575,588). Declare the same
        # parameters (no compute) so param counts and checkpoint layouts
        # match the published state dicts exactly.
        from dasr_tpu.nn.blocks import _ConvBlockParams

        for i in range(2):
            _ConvBlockParams(self.nf, self.nf, name=f"rep_beta_dormant_{i}")()
        d = conv_block(self.nf, 3, **kw)(ddm)
        f_ddm_gamma = run([conv_block(self.nf, 3, **kw) for _ in range(2)], d)
        f_ddm_beta = run([conv_block(self.nf, 3, **kw) for _ in range(2)], d)
        a_g = self.param("alpha_gamma", nn.initializers.constant(0.5), (1,))
        a_b = self.param("alpha_beta", nn.initializers.constant(0.5), (1,))
        gamma = f_rep_gamma + (1 - a_g) * f_ddm_gamma
        beta = f_rep_beta + (1 - a_b) * f_ddm_beta
        return x * gamma + beta


class RRDBSEAN(nn.Module):
    nc: int = 64
    gc: int = 32
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, ddm):
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(x)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        # SEAN residual block: 3 x (SEAN -> lrelu -> conv)
        for _ in range(3):
            out = SEANModule(self.nc, dtype=self.dtype)(out, ddm)
            out = nn.leaky_relu(out, 0.01)
            out = conv_block(self.nc, 3, act_type="leakyrelu", dtype=self.dtype)(out)
        return out * 0.2 + x


class RRDBAda(nn.Module):
    nc: int = 64
    gc: int = 32
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, ddm):
        lda = self.param("lda", nn.initializers.constant(0.4), (1,))
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(x)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        return out * (ddm * lda) + x


class AdaptiveModule(nn.Module):
    """Domain-routed dual path: per-sample mask selects real/fake RRDB
    chains. Runs both branches and selects — no dynamic gather, so the op
    stays a static SPMD program (the batch-masked analog of expert routing,
    SURVEY.md §2.4)."""

    nf: int = 64
    ada_nb: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mask):
        real = x
        fake = x
        for _ in range(self.ada_nb):
            real = RRDB(nc=self.nf, dtype=self.dtype)(real)
        for _ in range(self.ada_nb):
            fake = RRDB(nc=self.nf, dtype=self.dtype)(fake)
        m = mask.reshape(-1, 1, 1, 1).astype(x.dtype)
        return m * real + (1 - m) * fake


class RRDBCatInput(nn.Module):
    """RRDB whose input is concatenated with a conditioning tensor before
    each RDB (block.py:311-333 'RRDB_catInput')."""

    nc: int = 64
    gc: int = 32
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, cond):
        out = x
        for _ in range(3):
            merged = conv_block(self.nc, 3, act_type="leakyrelu", dtype=self.dtype)(
                jnp.concatenate([out, cond], axis=-1)
            )
            out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(merged)
        return out * 0.2 + x


class RRDBWithFeatureOut(nn.Module):
    """RRDB that also emits a compressed 1x1-conv feature tap, accumulated
    along the conditioning stream (block.py:648-... 'RRDB_w_out')."""

    nc: int = 64
    gc: int = 32
    tap_ch: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, feature_stream):
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(x)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        tap = conv_block(self.tap_ch, 1, act_type="leakyrelu", dtype=self.dtype)(out)
        return out * 0.2 + x, jnp.concatenate([feature_stream, tap], axis=-1)


class CALayer(nn.Module):
    """Channel attention (RCAN; block.py:644-668)."""

    channel: int = 64
    reduction: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(-3, -2), keepdims=True)
        y = nn.relu(nn.Conv(self.channel // self.reduction, (1, 1), dtype=self.dtype)(y))
        y = nn.sigmoid(nn.Conv(self.channel, (1, 1), dtype=self.dtype)(y))
        return x * y


class RCAB(nn.Module):
    """Residual channel-attention block (block.py:671-...)."""

    nf: int = 64
    reduction: int = 16
    res_scale: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = CALayer(self.nf, self.reduction, dtype=self.dtype)(h)
        return x + h * self.res_scale


class CARRDB(nn.Module):
    """RDB chain + two RCABs (block.py:768-828)."""

    nc: int = 64
    gc: int = 32
    reduction: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(x)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        out = RDB5C(nc=self.nc, gc=self.gc, dtype=self.dtype)(out)
        out = RCAB(self.nc, self.reduction, dtype=self.dtype)(out)
        out = RCAB(self.nc, self.reduction, dtype=self.dtype)(out)
        return out * 0.2 + x
