"""Profile the production DSN train step on the real chip.

Runs the aim2019 Auto_Reproduce stage-1 configuration (DeResnet + FSD +
avg_pool, bs 8, crop 256, in-step device bicubic — reference:
codes/DSN/train.py:24-73 defaults + launchers/auto_reproduce gains) for
a few steps under ``jax.profiler.trace`` and prints the device-op time
aggregated by fusion name, so the 51 ms/step device cost can be
attributed before attacking it.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dsn_step.py \
      [n_steps] [--k K] [--trace /tmp/dsnprof]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict


def parse_trace(trace_dir: str, top: int = 30):
    """Aggregate device-lane op durations from the newest xplane trace."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not paths:
        print(f"no trace found under {trace_dir}")
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device XLA ops
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n or "Device" in n
    }
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((ev["pid"], ev["tid"]), "")
        # XLA op lanes carry individual fusions; skip step/module summary lanes
        if "XLA Modules" in lane or "Steps" in lane:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        agg[name] += dur
        count[name] += 1
        total += dur
    print(f"\ndevice lanes total: {total / 1e3:.2f} ms over {len(agg)} distinct ops")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur / 1e3:8.3f} ms  x{count[name]:<5d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_steps", nargs="?", type=int, default=12)
    ap.add_argument("--k", type=int, default=1, help="steps_per_call")
    ap.add_argument("--trace", default="/tmp/dsnprof")
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--packed_trunk", action="store_true",
                    help="DeResnet trunk in 2x2 space-to-depth packed form")
    ap.add_argument("--no_bf16", dest="bf16", action="store_false")
    ap.add_argument("--device_bank", action="store_true",
                    help="profile the BANKED step (synthetic AR-scale banks "
                         "resident on device; in-step crop sampling)")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.trace)
        return

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer

    cfg = DSNConfig(
        filter="avg_pool", w_tex=0.006, packed_trunk=args.packed_trunk,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    trainer = DSNTrainer(cfg)
    lr = args.crop // cfg.upscale_factor
    state = trainer.init_state(jax.random.key(0), lr_size=lr, hr_size=args.crop)

    rng = np.random.default_rng(0)
    pre = (args.k,) if args.k > 1 else ()
    batch = {
        # no "bicubic" key -> in-step device MATLAB bicubic (the AR fast path)
        "input": jnp.asarray(
            rng.random((*pre, args.batch, args.crop, args.crop, 3)), jnp.float32
        ),
        "disc": jnp.asarray(rng.random((*pre, args.batch, lr, lr, 3)), jnp.float32),
    }
    if args.device_bank:
        # synthetic banks at AIM2019 corpus scale (200 clean 1356x2040,
        # 400 noisy 339x510) — the gather cost depends on the bank shape
        from dasr_tpu.data.device_bank import ImageBank, make_banked_step

        clean_h = ImageBank(
            rng.integers(0, 255, (200, 1356, 2040, 3), np.uint8),
            np.tile([[1356, 2040]], (200, 1)).astype(np.int32),
        )
        noisy_h = ImageBank(
            rng.integers(0, 255, (400, 339, 510, 3), np.uint8),
            np.tile([[339, 510]], (400, 1)).astype(np.int32),
        )
        # layout-pinned step (the whole-bank relayout fix)
        banked_step, clean, noisy = make_banked_step(trainer, clean_h, noisy_h)
        idx = jnp.asarray(
            rng.integers(0, 400, (max(1, args.k), args.batch), np.int32)
        )
        seed_box = [0]

        def step(st):
            seed_box[0] += 1
            return banked_step(st, idx, seed_box[0], args.crop)

        # banked metrics are last-step scalars (K-axis stripped in-jit)
        fence = lambda m: float(m["loss/g_overall_loss"])  # noqa: E731
    elif args.k > 1:
        step = lambda st: trainer.train_multi_step(st, batch)  # noqa: E731
        fence = lambda m: float(m["loss/g_overall_loss"][-1])  # noqa: E731
    else:
        step = lambda st: trainer.train_step(st, batch)  # noqa: E731
        fence = lambda m: float(m["loss/g_overall_loss"])  # noqa: E731

    state, metrics = step(state)
    fence(metrics)  # compile fence
    state, metrics = step(state)
    fence(metrics)  # steady state

    t0 = time.perf_counter()
    for _ in range(args.n_steps):
        state, metrics = step(state)
    fence(metrics)
    dt = (time.perf_counter() - t0 - 0.035) / (args.n_steps * args.k)
    print(f"back-to-back: {dt * 1e3:.2f} ms/step "
          f"({args.batch / dt:.1f} imgs/s), k={args.k}")

    with jax.profiler.trace(args.trace):
        for _ in range(4):
            state, metrics = step(state)
        fence(metrics)
    parse_trace(args.trace)


if __name__ == "__main__":
    main()
