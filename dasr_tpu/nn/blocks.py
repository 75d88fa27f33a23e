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
import jax
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


class ResNetBlock(nn.Module):
    """EDSR-style 3-3 residual block (reference: codes/SRN/models/modules/
    block.py:221-251): conv_block(act) -> conv_block(act=None in CNA mode,
    act kept in NAC mode) with additive skip scaled by ``res_scale``."""

    nf: int = 64
    norm_type: Optional[str] = None
    act_type: Optional[str] = "relu"
    mode: str = "NAC"
    res_scale: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        r = conv_block(
            self.nf, 3, norm_type=self.norm_type, act_type=self.act_type,
            mode=self.mode, dtype=self.dtype,
        )(x)
        act1 = None if self.mode in ("CNA", "CNAC") else self.act_type
        norm1 = None if self.mode == "CNAC" else self.norm_type
        r = conv_block(
            self.nf, 3, norm_type=norm1, act_type=act1,
            mode=self.mode, dtype=self.dtype,
        )(r)
        return x + r * self.res_scale


def kaiming_conv_init(scale: float = 1.0):
    """torch kaiming_normal_(fan_in, leaky_relu a=0) x scale — the ESRGAN G
    init (reference: codes/SRN/models/networks.py:15-40, scale 0.1 for G)."""
    return nn.initializers.variance_scaling(
        2.0 * scale * scale, "fan_in", "normal"
    )


class RDB5C(nn.Module):
    """Residual Dense Block, 5 convs (block.py:254-286); out = x + 0.2*conv5.

    TPU-first formulation: the dense concats are algebraically re-expressed
    as *scatter convs* — each feature source (x, x1..x4) is convolved once
    with the concatenation of its per-conv weight blocks, and the per-conv
    inputs are recovered by slicing + summing:

        conv_j(cat(x, x1..x_{j-1})) == sum_s conv(x_s, W_j[rows of s])

    Identical parameters, FLOPs and math (f32-exact; bf16 differs only by
    summation order), but every conv has >=64 output channels — on v5e the
    XLA lowering for 32-out convs is ~15x slower than 64+, so this is a
    ~1.8x wall-clock win for the ESRGAN trunk. Set ``fused=False`` for the
    literal 5-conv chain (required when ``norm_type`` is set).
    """

    nc: int = 64
    gc: int = 32
    norm_type: Optional[str] = None
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    fused: bool = True
    init_scale: float = 0.1
    dtype: Dtype = None

    def _act(self, v):
        from dasr_tpu.nn.layers import act_fn

        f = act_fn(self.act_type)
        return f(v) if f else v

    @nn.compact
    def __call__(self, x):
        nc, gc = self.nc, self.gc
        kinit = kaiming_conv_init(self.init_scale)
        kernels, biases = [], []
        for k in range(5):
            cin = nc + k * gc
            cout = gc if k < 4 else nc
            kernels.append(
                self.param(f"conv{k}_kernel", kinit, (3, 3, cin, cout), jnp.float32)
            )
            biases.append(
                self.param(f"conv{k}_bias", nn.initializers.zeros, (cout,), jnp.float32)
            )

        dtype = self.dtype or x.dtype
        xin = x.astype(dtype)
        kernels = [k.astype(dtype) for k in kernels]

        def conv(v, w):
            return jax.lax.conv_general_dilated(
                v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        if not self.fused or self.norm_type is not None or self.mode != "CNA":
            # literal chain (block.py:280-286), with optional norm
            from dasr_tpu.nn.layers import get_norm

            feats = [xin]
            out = None
            for k in range(5):
                v = conv(jnp.concatenate(feats, -1), kernels[k]) + biases[k].astype(dtype)
                norm = get_norm(self.norm_type)
                if norm is not None:
                    v = norm(v)
                if k < 4:
                    v = self._act(v)
                    feats.append(v)
                else:
                    out = v
            return x + out.astype(x.dtype) * 0.2

        return grouped_rdb5c_apply(
            x, kernels, [bi.astype(dtype) for bi in biases], self._act, nc, gc
        )


class _RDB5CParams(nn.Module):
    """RDB5C-shaped parameter shell (conv{k}_kernel/bias, same inits) for
    apply paths that read the weights directly (scanned trunk)."""

    nc: int
    gc: int

    @nn.compact
    def __call__(self):
        ks, bs = [], []
        kinit = kaiming_conv_init(0.1)
        for k in range(5):
            cin = self.nc + k * self.gc
            cout = self.gc if k < 4 else self.nc
            ks.append(
                self.param(f"conv{k}_kernel", kinit, (3, 3, cin, cout), jnp.float32)
            )
            bs.append(
                self.param(f"conv{k}_bias", nn.initializers.zeros, (cout,), jnp.float32)
            )
        return ks, bs


class _RRDBParams(nn.Module):
    """RRDB-shaped parameter shell: 3 x RDB5C_{j} param sets."""

    nc: int
    gc: int

    @nn.compact
    def __call__(self):
        return [
            _RDB5CParams(self.nc, self.gc, name=f"RDB5C_{j}")()
            for j in range(3)
        ]


def grouped_rdb5c_apply(x, kernels, biases, act, nc: int = 64, gc: int = 32):
    """Grouped-scatter RDB5C forward as a pure function (shared by the
    RDB5C module and the scanned-trunk path in RRDBNet).

    The plain per-source scatter leaves four cin=gc(=32) convs which the
    v5e XLA conv emitter runs at 45-58 TFLOP/s (vs 186+ for cin>=64 —
    measured, tools/probe_conv.py). Regrouping the SAME contributions by
    source *pairs* keeps every remaining conv at cin>=2*gc with zero extra
    FLOPs:
      P0  = conv(x,       rows[x]     of W1..W5) -> 4gc+nc
      c12 = conv(x1,      rows[x1]    of W2)     -> gc
      P12 = conv([x1,x2], rows[x1,x2] of W3..W5) -> 2gc+nc
      c34 = conv(x3,      rows[x3]    of W4)     -> gc
      P34 = conv([x3,x4], rows[x3,x4] of W5)     -> nc
    (identical math to the dense-concat chain; bf16 differs only by
    summation order)."""

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def rows(j, lo_src, n_src):
        lo = nc + (lo_src - 1) * gc
        return kernels[j][:, :, lo : lo + n_src * gc, :]

    w_p0 = jnp.concatenate([kernels[j][:, :, :nc, :] for j in range(5)], -1)
    w_c12 = rows(1, 1, 1)
    w_p12 = jnp.concatenate([rows(j, 1, 2) for j in (2, 3, 4)], -1)
    w_c34 = rows(3, 3, 1)
    w_p34 = rows(4, 3, 2)

    b = biases
    xin = x.astype(kernels[0].dtype)
    p0 = conv(xin, w_p0)  # -> [x1|x2|x3|x4|x5] chunks
    x1 = act(p0[..., :gc] + b[0])
    c12 = conv(x1, w_c12)
    x2 = act(p0[..., gc : 2 * gc] + c12 + b[1])
    p12 = conv(jnp.concatenate([x1, x2], -1), w_p12)  # -> [x3|x4|x5]
    x3 = act(p0[..., 2 * gc : 3 * gc] + p12[..., :gc] + b[2])
    c34 = conv(x3, w_c34)
    x4 = act(p0[..., 3 * gc : 4 * gc] + p12[..., gc : 2 * gc] + c34 + b[3])
    p34 = conv(jnp.concatenate([x3, x4], -1), w_p34)
    x5 = p0[..., 4 * gc :] + p12[..., 2 * gc :] + p34 + b[4]
    return x + x5.astype(x.dtype) * 0.2


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


class RRDBResidualConv(nn.Module):
    """DDM-conditioned RRDB, 'resconv' flavor (block.py:462-488).

    out = RDB3(RDB2(RDB1(x))) * (w * s1) + res_conv(x) * s0, where ``w`` is
    the per-pixel adaptive/domain-distance map broadcast over channels.
    """

    nc: int = 64
    gc: int = 32
    n_resconv: int = 2
    resconv_scale: tuple = (0.1, 1.0)
    act_type: str = "leakyrelu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, weights):
        kw = dict(nc=self.nc, gc=self.gc, act_type=self.act_type, dtype=self.dtype)
        out = RDB5C(**kw)(x)
        out = RDB5C(**kw)(out)
        out = RDB5C(**kw)(out)
        res = x
        for _ in range(self.n_resconv):
            res = conv_block(
                self.nc, 3, norm_type=None, act_type=self.act_type, dtype=self.dtype
            )(res)
        return out * (weights * self.resconv_scale[1]) + res * self.resconv_scale[0]


class RRDBResidualConvConcat(nn.Module):
    """DDM-conditioned RRDB, 'concat' flavor (block.py:490-528).

    The weight map (scaled) is concatenated as an extra channel before each
    RDB via a shared adaptive conv stack, and before the residual conv
    stack; out = 0.2*RDB-chain + residual. Note the reference *shares* one
    ``adaptive_conv`` across the three RDB inputs — reproduced here by
    reusing the same submodule.
    """

    nc: int = 64
    gc: int = 32
    n_resconv: int = 2
    n_ada_conv: int = 2
    adaptive_scale: tuple = (0.2, 1.0)
    act_type: str = "leakyrelu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, weights):
        kw = dict(nc=self.nc, gc=self.gc, act_type=self.act_type, dtype=self.dtype)
        ada_convs = [
            conv_block(
                self.nc, 3, norm_type=None, act_type=self.act_type,
                dtype=self.dtype, name=f"ada_conv_{i}",
            )
            for i in range(self.n_ada_conv)
        ]

        def ada(v):
            v = jnp.concatenate([v, weights * self.adaptive_scale[0]], axis=-1)
            for c in ada_convs:
                v = c(v)
            return v

        out = RDB5C(**kw)(ada(x))
        out = RDB5C(**kw)(ada(out))
        out = RDB5C(**kw)(ada(out))
        res = jnp.concatenate([x, weights * self.adaptive_scale[1]], axis=-1)
        for i in range(self.n_resconv):
            res = conv_block(
                self.nc, 3, norm_type=None, act_type=self.act_type,
                dtype=self.dtype, name=f"res_conv_{i}",
            )(res)
        return out * 0.2 + res


class _ConvParamsMirror(nn.Module):
    """Declares nn.Conv-compatible {kernel, bias} params (same names, shapes
    and default inits) without applying the conv — lets fused/packed apply
    paths share one parameter tree with the plain modules."""

    features: int
    in_features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _ConvBlockParams(nn.Module):
    """conv_block-shaped parameter shell (conv_block_N/Conv_0/{kernel,bias})."""

    features: int
    in_features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        return _ConvParamsMirror(
            self.features, self.in_features, self.kernel_size, name="Conv_0"
        )()


class upconv(nn.Module):
    """Nearest-neighbour x`factor` upsample + conv + act (block.py:854-861).

    ``fused=True`` (factor 2 only) computes the identical math as four 2x2
    phase convs at the input resolution (ops/packed.py:fused_upconv2) — no
    repeated-tensor HBM round-trip, 2.25x fewer MACs, 4x-wide channels."""

    out_ch: int
    factor: int = 2
    act_type: Optional[str] = "relu"
    fused: bool = False
    keep_packed: bool = False  # fused only: emit pack22 of the 2x output
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        if self.fused:
            assert self.factor == 2, "fused upconv supports factor 2"
            from dasr_tpu.nn.layers import act_fn
            from dasr_tpu.ops.packed import fused_upconv2

            k, b = _ConvBlockParams(
                self.out_ch, x.shape[-1], name="conv_block_0"
            )()
            dtype = self.dtype or x.dtype
            return fused_upconv2(
                x.astype(dtype), k.astype(dtype), bias=b,
                act=act_fn(self.act_type), unpack=not self.keep_packed,
            )
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
