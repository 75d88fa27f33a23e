"""A/B probe: 2x2 space-to-depth packed DSN DeResnet trunk vs the unpacked one.

Motivation (BENCH_NOTES r3): the bf16 DSN train step is ~22 ms of DeResnet
trunk — 17 convs of 64->64 at the FULL 256x256 HR resolution, running at the
documented >=256-spatial conv-emitter rate (~45 TF/s). The 2x2 packed layout
moves those convs to 128x128 spatial with 256->256 channels — the measured
PEAK regime (~412 TF/s) — at 4x the FLOPs (3x3 packed kernel, half zeros).
Unlike the RDB packed-trunk attempt (rejected in r2: dense-block chunk
arithmetic forced cross-phase gathers), DSN resblocks are plain
conv-PReLU-conv-add: every elementwise op is phase-uniform, so the trunk
stays packed end-to-end with ONE pack and ONE unpack (the unpack is free:
the first stride-2 downsample conv consumes the packed layout directly and
emits the unpacked 128x128x64 tensor).

Exactness: the packed conv is the same linear map (kernel scattered by phase
arithmetic; SAME zero-padding in packed space taps exactly the original
halo) — verified here vs the unpacked chain, and in
tests/test_packed_trunk.py on CPU.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_packed_trunk.py
  PYTHONPATH=/root/repo JAX_PLATFORMS='' python tools/probe_packed_trunk.py --cpu --check_only
"""

from __future__ import annotations

import argparse
import json
import time

RTT = 0.035


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check_only", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--n_loop", type=int, default=30)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from dasr_tpu.utils.runtime import setup_runtime

        setup_runtime()
    import jax
    import jax.numpy as jnp

    from dasr_tpu.ops.packed_trunk import (
        pack_space_to_depth,
        packed_resblock_chain,
        resblock_chain,
    )

    key = jax.random.key(0)
    bf = jnp.float32 if args.check_only else jnp.bfloat16
    B, S, NB = args.batch, args.size, args.blocks
    ks = jax.random.split(key, 4 * NB + 1)
    params = []
    for i in range(NB):
        w1 = jax.random.normal(ks[4 * i], (3, 3, 64, 64), jnp.float32) * 0.05
        w2 = jax.random.normal(ks[4 * i + 1], (3, 3, 64, 64), jnp.float32) * 0.05
        b1 = jax.random.normal(ks[4 * i + 2], (64,), jnp.float32) * 0.1
        b2 = jax.random.normal(ks[4 * i + 3], (64,), jnp.float32) * 0.1
        params.append((w1, b1, w2, b2, jnp.float32(0.25)))
    x = jax.random.uniform(ks[-1], (B, S, S, 64), jnp.float32)

    def chain_a(x, params):
        return resblock_chain(x.astype(bf), params)

    def chain_b(x, params):
        return packed_resblock_chain(x.astype(bf), params)

    ya = jax.jit(chain_a)(x, params)
    yb = jax.jit(chain_b)(x, params)
    diff = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
    print(json.dumps({"probe": "exactness", "max_abs_diff": diff, "max_abs": ref}))
    if args.check_only:
        return

    def timeit(f, *a, n_outer=4):
        float(f(*a))
        best = float("inf")
        for _ in range(n_outer):
            t0 = time.perf_counter()
            float(f(*a))
            best = min(best, time.perf_counter() - t0 - RTT)
        return best

    def make_loop(fn):
        def looped(x, params):
            def body(_, acc):
                y = fn(x + (acc * 1e-9).astype(x.dtype), params)
                return acc + y.mean().astype(jnp.float32)

            return jax.lax.fori_loop(0, args.n_loop, body, jnp.float32(0))

        return jax.jit(looped)

    # conv FLOPs: unpacked 2*B*S^2*9*64^2 per conv, 2 convs/block
    flops_a = 2 * B * S * S * 9 * 64 * 64 * 2 * NB
    flops_b = flops_a * 4  # packed: half-zero 3x3 kernel at 1/4 spatial, 16x channels
    for name, fn, fl in (("unpacked", chain_a, flops_a), ("packed", chain_b, flops_b)):
        t = timeit(make_loop(fn), x, params) / args.n_loop
        print(
            json.dumps(
                {
                    "probe": f"trunk_{name}",
                    "ms": round(t * 1e3, 3),
                    "tflops": round(fl / t / 1e12, 1),
                    "shape": [B, S, S, 64],
                    "blocks": NB,
                }
            )
        )


if __name__ == "__main__":
    main()
