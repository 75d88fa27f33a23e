"""Micro-probes for conv/matmul efficiency on the real chip.

Usage:  python tools/probe_conv.py <probe> [<probe> ...]
        python tools/probe_conv.py --list

Each probe times one op configuration with the repo's standard methodology
(loop inside one jit with a data-dependent chain, scalar readback fences,
RTT-corrected). Prints one JSON line per probe with ms/iter and TFLOP/s.

Rationale: BENCH_r01 put the RRDB forward at ~14% MFU; these probes isolate
whether the loss is in the conv shapes (small cout), the upsample tail, or
dispatch overheads, before kernel work is committed.
"""

from __future__ import annotations

import json
import sys
import time

RTT = 0.035


def timeit(f, *args, n_outer=4):
    float(f(*args))  # compile + warmup
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0 - RTT)
    return best


def make_loop(fn, n_loop):
    import jax
    import jax.numpy as jnp

    def looped(*args):
        x = args[0]

        def body(_, acc):
            y = fn(x + (acc * 1e-9).astype(x.dtype), *args[1:])
            return acc + y.mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, n_loop, body, jnp.float32(0))

    return jax.jit(looped)


def main():
    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    bf = jnp.bfloat16

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    PROBES = {}

    def probe(name, flops, make):
        PROBES[name] = (flops, make)

    B, S = 8, 128
    M = B * S * S

    def conv_probe(name, cin, cout, b=B, s=S, k=3):
        x = jax.random.normal(key, (b, s, s, cin), bf)
        w = jax.random.normal(key, (k, k, cin, cout), bf)
        fl = 2 * k * k * cin * cout * b * s * s
        probe(name, fl, lambda: (lambda v, ww: conv(v, ww), (x, w)))

    conv_probe("conv64_64", 64, 64)
    conv_probe("conv64_192", 64, 192)
    conv_probe("conv64_224", 64, 224)
    conv_probe("conv64_256", 64, 256)
    conv_probe("conv128_128", 128, 128)
    conv_probe("conv128_256", 128, 256)
    conv_probe("conv32_160", 32, 160)
    conv_probe("conv32_64", 32, 64)
    conv_probe("conv192_192", 192, 192)
    conv_probe("conv256_256", 256, 256)
    conv_probe("conv64_64_b32", 64, 64, b=32)
    conv_probe("conv64_64_s256", 64, 64, b=2, s=256)
    conv_probe("conv64_256_k2", 64, 256, k=2)  # fused-upsample shape

    # packed-trunk candidate shapes: 2x2 space-to-depth (channels x4, conv
    # k2 per phase at 64^2) and 1x2 (channels x2, conv 3x2 per phase)
    conv_probe("pk22_l0", 256, 192, b=B, s=64, k=2)
    conv_probe("pk22_l1", 128, 160, b=B, s=64, k=2)
    conv_probe("pk22_l4", 128, 64, b=B, s=64, k=2)

    def conv_probe_rect(name, cin, cout, b, h, w_, kh, kw):
        x = jax.random.normal(key, (b, h, w_, cin), bf)
        w = jax.random.normal(key, (kh, kw, cin, cout), bf)
        fl = 2 * kh * kw * cin * cout * b * h * w_
        probe(name, fl, lambda: (lambda v, ww: conv(v, ww), (x, w)))

    # grouped convs: fold batch pairs into channel groups — does the
    # emitter treat them as wide (fast) convs?
    def conv_group_probe(name, cin, cout, groups):
        x = jax.random.normal(key, (B // groups, S, S, cin * groups), bf)
        w = jax.random.normal(key, (3, 3, cin, cout * groups), bf)

        def f(v, ww):
            return jax.lax.conv_general_dilated(
                v, ww, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )

        fl = 2 * 9 * cin * cout * M
        probe(name, fl, lambda: (f, (x, w)))

    conv_group_probe("convg2_64_192", 64, 192, 2)
    conv_group_probe("convg4_64_192", 64, 192, 4)
    conv_group_probe("convg2_32_160", 32, 160, 2)

    # bf16-output dots at Pallas-RDB matmul shapes
    def dot_bf16_probe(name, mm, kk, nn_):
        a = jax.random.normal(key, (mm, kk), bf)
        b = jax.random.normal(key, (kk, nn_), bf)
        probe(name, 2 * mm * kk * nn_,
              lambda: (lambda aa, bb_: jnp.dot(aa, bb_), (a, b)))

    dot_bf16_probe("dotbf_4624x576x192", 4624, 576, 192)
    dot_bf16_probe("dotbf_16900x576x192", 16900, 576, 192)
    dot_bf16_probe("dotbf_131072x576x192", 131072, 576, 192)
    dot_bf16_probe("dotbf_8192cube", 8192, 8192, 8192)

    conv_probe_rect("pw2_l0", 128, 192, B, 128, 64, 3, 2)
    conv_probe_rect("pw2_l1", 64, 160, B, 128, 64, 3, 2)
    conv_probe_rect("pw2_l4", 64, 64, B, 128, 64, 3, 2)

    # decompose packed_conv22 cost: full vs convs-only vs stack-only
    def make_pc22(mode):
        from dasr_tpu.ops.packed import pack_kernel22, packed_conv22

        x = jax.random.normal(key, (B, 64, 64, 256), bf)
        wf = jax.random.normal(key, (3, 3, 64, 192), bf)
        ks = [pack_kernel22(wf, dy, dx) for dy in range(2) for dx in range(2)]

        def conv2(v, k, dy, dx):
            return jax.lax.conv_general_dilated(
                v, k, (1, 1), ((1 - dy, dy), (1 - dx, dx)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if mode == "full":
            return lambda: (lambda v, w: packed_conv22(v, w), (x, wf))
        if mode == "convsum":
            def f(v, k0, k1, k2, k3):
                return (conv2(v, k0, 0, 0) + conv2(v, k1, 0, 1)
                        + conv2(v, k2, 1, 0) + conv2(v, k3, 1, 1))
            return lambda: (f, (x, *ks))
        if mode == "convcat":
            def f(v, k0, k1, k2, k3):
                outs = [conv2(v, k0, 0, 0), conv2(v, k1, 0, 1),
                        conv2(v, k2, 1, 0), conv2(v, k3, 1, 1)]
                return jnp.concatenate(outs, -1)
            return lambda: (f, (x, *ks))
        if mode == "convstack":
            def f(v, k0, k1, k2, k3):
                outs = [conv2(v, k0, 0, 0), conv2(v, k1, 0, 1),
                        conv2(v, k2, 1, 0), conv2(v, k3, 1, 1)]
                return jnp.stack(outs, -1).reshape(B, 64, 64, -1)
            return lambda: (f, (x, *ks))

    fl22 = 2 * 4 * 256 * 192 * B * 64 * 64 * 4
    for md in ("full", "convsum", "convcat", "convstack"):
        probe(f"pc22_{md}", fl22, make_pc22(md))

    rdb_fl = 2 * 9 * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32 + 192 * 64) * M

    # one RDB5C, production formulation (grouped scatter, nn/blocks.py)
    def make_rdb():
        from dasr_tpu.nn.blocks import RDB5C

        m = RDB5C(nc=64, gc=32, dtype=bf)
        x = jax.random.normal(key, (B, S, S, 64), bf)
        v = m.init(jax.random.key(1), x)
        return (lambda xx, vv: m.apply(vv, xx), (x, v))

    probe("rdb_scatter", rdb_fl, make_rdb)

    # phase-major / fat-conv packed RDB variants (layout experiments)
    def make_rdbp_v2(fat=False):
        nc, gc = 64, 32
        g = jax.random.normal
        x = g(key, (B, 64, 64, 256), bf)
        ks = [g(jax.random.key(10 + k),
                (3, 3, nc + k * gc, gc if k < 4 else nc), bf) * 0.05
              for k in range(5)]
        bs = [g(jax.random.key(20 + k), ((gc if k < 4 else nc),), jnp.float32)
              for k in range(5)]

        def w_src(s):
            lo = nc + (s - 1) * gc if s >= 1 else 0
            hi = lo + (gc if s >= 1 else nc)
            return jnp.concatenate([ks[j][:, :, lo:hi, :] for j in range(s, 5)], -1)

        def pack_k_pm(w, dy, dx):
            kh, kw, cin, cout = w.shape
            z = jnp.zeros((cin, cout), w.dtype)
            rows = []
            for oy in range(2):
                cols = []
                for ox in range(2):
                    taps = []
                    for py in range(2):
                        for px in range(2):
                            u = 2 * oy + py + dy - 1
                            v = 2 * ox + px + dx - 1
                            taps.append(w[u, v] if 0 <= u < 3 and 0 <= v < 3 else z)
                    cols.append(jnp.stack(taps, 0).reshape(4 * cin, cout))
                rows.append(jnp.stack(cols, 0))
            return jnp.stack(rows, 0)

        def cv(v, k, pad):
            return jax.lax.conv_general_dilated(
                v, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def lrelu(v):
            return jnp.where(v >= 0, v, v * 0.2)

        PH = [(0, 0), (0, 1), (1, 0), (1, 1)]

        if not fat:
            def pconv(v, wf):
                return jnp.concatenate(
                    [cv(v, pack_k_pm(wf, dy, dx), ((1 - dy, dy), (1 - dx, dx)))
                     for dy, dx in PH], -1)

            def chunk(t, j, w):
                ct = t.shape[-1] // 4
                return jnp.concatenate(
                    [t[..., p * ct + j * gc: p * ct + j * gc + w] for p in range(4)], -1)
        else:
            def pconv(v, wf):
                k = jnp.concatenate([pack_k_pm(wf, dy, dx) for dy, dx in PH], -1)
                return cv(jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0))), k,
                          ((0, 0), (0, 0)))

            def chunk(t, j, w):
                ct = t.shape[-1] // 4
                hc, wc = t.shape[1] - 1, t.shape[2] - 1
                return jnp.concatenate(
                    [t[:, dy:dy + hc, dx:dx + wc,
                       p * ct + j * gc: p * ct + j * gc + w]
                     for p, (dy, dx) in enumerate(PH)], -1)

        def bput(b):
            return jnp.tile(b, 4).astype(bf)

        def f(xx, *_):
            p0 = pconv(xx, w_src(0))
            x1 = lrelu(chunk(p0, 0, gc) + bput(bs[0]))
            p1 = pconv(x1, w_src(1))
            x2 = lrelu(chunk(p0, 1, gc) + chunk(p1, 0, gc) + bput(bs[1]))
            p2 = pconv(x2, w_src(2))
            x3 = lrelu(chunk(p0, 2, gc) + chunk(p1, 1, gc) + chunk(p2, 0, gc)
                       + bput(bs[2]))
            p3 = pconv(x3, w_src(3))
            x4 = lrelu(chunk(p0, 3, gc) + chunk(p1, 2, gc) + chunk(p2, 1, gc)
                       + chunk(p3, 0, gc) + bput(bs[3]))
            p4 = pconv(x4, w_src(4))
            x5 = (chunk(p0, 4, nc) + chunk(p1, 3, nc) + chunk(p2, 2, nc)
                  + chunk(p3, 1, nc) + chunk(p4, 0, nc) + bput(bs[4]))
            return xx + 0.2 * x5

        return lambda: (f, (x,))

    probe("rdbp_pm", rdb_fl, make_rdbp_v2(False))
    probe("rdbp_fat", rdb_fl, make_rdbp_v2(True))

    # fat conv + per-phase glue (no cross-phase gathers; one concat per level)
    def make_rdbp_fat2():
        nc, gc = 64, 32
        g = jax.random.normal
        x = g(key, (B, 64, 64, 256), bf)
        ks = [g(jax.random.key(10 + k),
                (3, 3, nc + k * gc, gc if k < 4 else nc), bf) * 0.05
              for k in range(5)]
        bs = [g(jax.random.key(20 + k), ((gc if k < 4 else nc),), jnp.float32)
              for k in range(5)]

        def w_src(s):
            lo = nc + (s - 1) * gc if s >= 1 else 0
            hi = lo + (gc if s >= 1 else nc)
            return jnp.concatenate([ks[j][:, :, lo:hi, :] for j in range(s, 5)], -1)

        PH = [(0, 0), (0, 1), (1, 0), (1, 1)]

        def pack_k_pm(w, dy, dx):
            kh, kw, cin, cout = w.shape
            z = jnp.zeros((cin, cout), w.dtype)
            rows = []
            for oy in range(2):
                cols = []
                for ox in range(2):
                    taps = []
                    for py in range(2):
                        for px in range(2):
                            u = 2 * oy + py + dy - 1
                            v = 2 * ox + px + dx - 1
                            taps.append(w[u, v] if 0 <= u < 3 and 0 <= v < 3 else z)
                    cols.append(jnp.stack(taps, 0).reshape(4 * cin, cout))
                rows.append(jnp.stack(cols, 0))
            return jnp.stack(rows, 0)

        def fatconv(v, wf):
            k = jnp.concatenate([pack_k_pm(wf, dy, dx) for dy, dx in PH], -1)
            return jax.lax.conv_general_dilated(
                jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0))), k, (1, 1),
                ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def lrelu(v):
            return jnp.where(v >= 0, v, v * 0.2)

        def piece(t, p, j, w):
            dy, dx = PH[p]
            ct = t.shape[-1] // 4
            hc, wc = t.shape[1] - 1, t.shape[2] - 1
            return t[:, dy:dy + hc, dx:dx + wc,
                     p * ct + j * gc: p * ct + j * gc + w]

        def level(sources, b, w):
            # sources: [(tensor, chunk_idx), ...]; returns concat over phases
            outs = []
            for p in range(4):
                acc = b
                for t, j in sources:
                    acc = acc + piece(t, p, j, w)
                outs.append(lrelu(acc) if w == gc else acc)
            return jnp.concatenate(outs, -1)

        def f(xx, *_):
            p0 = fatconv(xx, w_src(0))
            x1 = level([(p0, 0)], bs[0].astype(bf), gc)
            p1 = fatconv(x1, w_src(1))
            x2 = level([(p0, 1), (p1, 0)], bs[1].astype(bf), gc)
            p2 = fatconv(x2, w_src(2))
            x3 = level([(p0, 2), (p1, 1), (p2, 0)], bs[2].astype(bf), gc)
            p3 = fatconv(x3, w_src(3))
            x4 = level([(p0, 3), (p1, 2), (p2, 1), (p3, 0)], bs[3].astype(bf), gc)
            p4 = fatconv(x4, w_src(4))
            x5 = level([(p0, 4), (p1, 3), (p2, 2), (p3, 1), (p4, 0)],
                       bs[4].astype(bf), nc)
            return xx + 0.2 * x5

        return lambda: (f, (x,))

    probe("rdbp_fat2", rdb_fl, make_rdbp_fat2())

    # existing Pallas fused RDB at bigger tiles
    def make_rdb_pallas(tile):
        def mk():
            from dasr_tpu.ops.pallas_rdb import _fused_rdb_impl

            nc, gc = 64, 32
            g = jax.random.normal
            x = g(key, (B, S, S, nc), bf)
            ks = tuple(
                g(jax.random.key(10 + k),
                  (3, 3, nc + k * gc, gc if k < 4 else nc), bf) * 0.05
                for k in range(5))
            bs = tuple(
                g(jax.random.key(20 + k), ((gc if k < 4 else nc),), jnp.float32)
                for k in range(5))

            def f(xx, *_):
                return _fused_rdb_impl(xx, ks, bs, tile=tile)

            return (f, (x,))
        return mk

    probe("rdb_pallas_t32", rdb_fl, make_rdb_pallas(32))
    probe("rdb_pallas_t64", rdb_fl, make_rdb_pallas(64))
    probe("rdb_pallas_t128", rdb_fl, make_rdb_pallas(128))

    # upsample via lhs_dilation: conv3x3(nearest_repeat2(x)) == one dilated conv
    def make_upconv_dil():
        x = jax.random.normal(key, (B, S, S, 64), bf)
        w = jax.random.normal(key, (3, 3, 64, 64), bf)

        def f(v, wf):
            # K[a,b] = sum_{u,v: repeat-taps} W — build 4x4 composed kernel
            # y[q] = sum_u W[u] x[floor((q+u-1)/2)]; as lhs-dilated conv:
            # dilate x by 2 (zeros), kernel K4 with K[a] = W[u] where the
            # dilated tap a hits a real sample: a = u + (q+u-1)%2 ... probe
            # uses the correlation form: K = conv(W, ones(2,2)) flipped
            ones = jnp.ones((2, 2, 1, 1), wf.dtype)
            wk = jax.lax.conv_general_dilated(
                wf.transpose(2, 3, 0, 1).reshape(-1, 1, 3, 3).astype(jnp.float32),
                jnp.ones((1, 1, 2, 2), jnp.float32), (1, 1),
                ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )  # (cin*cout, 1, 4, 4)
            k4 = wk.reshape(64, 64, 4, 4).transpose(2, 3, 0, 1).astype(v.dtype)
            return jax.lax.conv_general_dilated(
                v, k4, (1, 1), ((2, 1), (2, 1)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return lambda: (f, (x, w))

    probe("upconv_dil", 2 * 9 * 64 * 64 * M * 4, make_upconv_dil())

    def make_rdb_chain():
        from dasr_tpu.nn.blocks import RDB5C

        m = RDB5C(nc=64, gc=32, dtype=bf, fused=False)
        x = jax.random.normal(key, (B, S, S, 64), bf)
        v = m.init(jax.random.key(1), x)
        return (lambda xx, vv: m.apply(vv, xx), (x, v))

    probe("rdb_chain", rdb_fl, make_rdb_chain)

    # dot_general with the scatter conv-0 GEMM shape (im2col already done)
    def make_dot(mm, kk, nn_):
        a = jax.random.normal(key, (mm, kk), bf)
        b = jax.random.normal(key, (kk, nn_), bf)
        probe(
            f"dot_{mm}x{kk}x{nn_}",
            2 * mm * kk * nn_,
            lambda: (
                lambda aa, bb_: jnp.dot(aa, bb_, preferred_element_type=jnp.float32),
                (a, b),
            ),
        )

    make_dot(M, 576, 192)
    make_dot(M, 288, 64)
    make_dot(8192, 8192, 8192)

    # upsample tail of RRDBNet x4 (2 upconv + hr conv + last conv)
    def make_tail():
        from dasr_tpu.nn.blocks import upconv
        from dasr_tpu.nn.layers import conv_block
        import flax.linen as nn

        class Tail(nn.Module):
            @nn.compact
            def __call__(self, h):
                h = upconv(64, 2, act_type="leakyrelu", dtype=bf)(h)
                h = upconv(64, 2, act_type="leakyrelu", dtype=bf)(h)
                h = conv_block(64, 3, norm_type=None, act_type="leakyrelu", dtype=bf)(h)
                return conv_block(3, 3, norm_type=None, act_type=None, dtype=bf)(h)

        m = Tail()
        x = jax.random.normal(key, (B, S, S, 64), bf)
        v = m.init(jax.random.key(1), x)
        return (lambda xx, vv: m.apply(vv, xx), (x, v))

    tail_fl = 2 * 9 * 64 * M * (64 * 4 + 64 * 16 + 64 * 16 + 3 * 16)
    probe("tail_x4", tail_fl, make_tail)

    # full model for reference
    def make_full(fused=False, batch=B, scan=False, tile=S):
        def mk():
            from dasr_tpu.nn.generators import RRDBNet

            m = RRDBNet(nf=64, nb=23, gc=32, upscale=4, dtype=bf,
                        fused_tail=fused, scan_blocks=scan)
            x = jax.random.uniform(
                jax.random.key(1), (batch, tile, tile, 3), jnp.float32
            )
            v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
            return (lambda xx, vv: m.apply(vv, xx), (x, v))
        return mk

    probe("rrdbnet_full", int(2.24e6 * M * 16), make_full())
    probe("rrdbnet_fused", int(2.24e6 * M * 16), make_full(fused=True))
    probe("rrdbnet_fused_b16", int(2.24e6 * 2 * M * 16), make_full(True, 16))
    # scanned-trunk batch/tile sweep (the production bench path)
    for b_ in (4, 8, 12, 16, 24):
        probe(f"rrdbnet_scan_b{b_}", int(2.24e6 * (b_ / B) * M * 16),
              make_full(fused=True, batch=b_, scan=True))
    probe("rrdbnet_scan_b2_t256", int(2.24e6 * M * 16),
          make_full(fused=True, batch=2, scan=True, tile=256))
    probe("rrdbnet_scan_b32_t64", int(2.24e6 * 0.5 * M * 16),
          make_full(fused=True, batch=32, scan=True, tile=64))

    def make_tail_fused():
        from dasr_tpu.nn.blocks import _ConvBlockParams, upconv
        from dasr_tpu.nn.layers import act_fn
        from dasr_tpu.ops.packed import packed_conv22, unpack22
        import flax.linen as nn

        class Tail(nn.Module):
            @nn.compact
            def __call__(self, h):
                h = upconv(64, 2, act_type="leakyrelu", dtype=bf, fused=True)(h)
                h = upconv(64, 2, act_type="leakyrelu", dtype=bf, fused=True,
                           keep_packed=True)(h)
                k2, b2 = _ConvBlockParams(64, 64, name="conv_block_2")()
                h = packed_conv22(h, k2.astype(bf), bias=b2,
                                  act=act_fn("leakyrelu"))
                k3, b3 = _ConvBlockParams(3, 64, name="conv_block_3")()
                return unpack22(packed_conv22(h, k3.astype(bf), bias=b3))

        m = Tail()
        x = jax.random.normal(key, (B, S, S, 64), bf)
        v = m.init(jax.random.key(1), x)
        return (lambda xx, vv: m.apply(vv, xx), (x, v))

    probe("tail_x4_fused", tail_fl, make_tail_fused)

    names = sys.argv[1:]
    if not names or names[0] == "--list":
        print("\n".join(PROBES))
        return
    if names == ["all"]:
        names = list(PROBES)
    for name in names:
        fl, make = PROBES[name]
        fn, args = make()
        n_loop = max(5, min(200, int(2e12 / max(fl, 1))))
        f = make_loop(fn, n_loop)
        t = timeit(f, *args) / n_loop
        print(
            json.dumps(
                {
                    "probe": name,
                    "ms": round(t * 1e3, 4),
                    "tflops": round(fl / t / 1e12, 1),
                    "n_loop": n_loop,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
