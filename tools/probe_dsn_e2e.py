"""Segment-timed replica of the SHIPPED dsn_train hot loop.

Mirrors the CLI's lagged gated readback protocol exactly (cli/dsn_train.py
``drain_window``): metrics of window N are read back only after window N+1
is queued, only when N crossed a 50-iter boundary, plus a fence every 32
unread windows to bound the device input queue. (The r3 version of this
probe drained the CURRENT window at boundaries — a superseded protocol the
CLI no longer uses; VERDICT r3 weak #6.)

Measures, per dispatch window, where the main thread's wall time goes:
``wait`` (loader queue empty), ``stack`` (window collation), ``put``
(packed upload incl. the tunnel RTT), ``dispatch`` (jitted call queue) and
``drain`` (lagged metric readbacks incl. the runahead fences).

Arms (combine freely):
  --device_bank   banked windows from device-resident corpora — per-window
                  wire traffic is the (K, B) int32 index block only
  --packed_trunk  DeResnet trunk in 2x2 space-to-depth packed form
  --k N           scan window length (steps_per_call)
  --no_bf16       f32 compute

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dsn_e2e.py \
      --k 1 --steps 240 --source /tmp/dsnsub/source --target /tmp/dsnsub/target
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--source", default="/tmp/dsnsub/source")
    ap.add_argument("--target", default="/tmp/dsnsub/target")
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--device_bank", action="store_true")
    ap.add_argument("--packed_trunk", action="store_true")
    ap.add_argument("--no_bf16", dest="bf16", action="store_false")
    args = ap.parse_args()

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasr_tpu.data.io import enable_decode_cache
    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer
    from dasr_tpu.utils.transfer import device_put_packed, metrics_to_host

    enable_decode_cache(24)

    cfg = DSNConfig(
        filter="avg_pool", w_tex=0.006, packed_trunk=args.packed_trunk,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    trainer = DSNTrainer(cfg)
    crop_eff = args.crop - args.crop % 4
    lr = crop_eff // 4
    state = trainer.init_state(jax.random.key(0), lr_size=lr, hr_size=args.crop)

    k = args.k
    seg = {"wait": 0.0, "stack": 0.0, "put": 0.0, "dispatch": 0.0, "drain": 0.0}
    iteration = 0
    windows = 0
    warm_windows = 3 * max(1, 8 // k)
    t_start = None
    iter_at_start = 0

    # --- shipped lagged gated readback (cli/dsn_train.py drain_window) ---
    lagged = None
    runahead = 0

    def drain_prev(prev, force=False):
        nonlocal runahead
        t0 = time.perf_counter()
        it_at, dev_m = prev
        boundary = it_at // 50 > (it_at - k) // 50
        if force or boundary:
            metrics_to_host(dev_m)
            runahead = 0
        else:
            runahead += 1
            if runahead >= 32:
                metrics_to_host(dev_m)
                runahead = 0
        return time.perf_counter() - t0

    if args.device_bank:
        from dasr_tpu.data.device_bank import build_bank, make_banked_step

        t0 = time.perf_counter()
        noisy_h = build_bank(args.source, min_size=lr)
        clean_h = build_bank(args.target, min_size=crop_eff)
        t1 = time.perf_counter()
        # layout-pinned step (the per-dispatch whole-bank relayout fix,
        # BENCH_NOTES r4)
        banked_step, clean, noisy = make_banked_step(trainer, clean_h, noisy_h)
        jax.block_until_ready(noisy.data)
        gib = (noisy_h.data.nbytes + clean_h.data.nbytes) / 2**30
        print(f"bank: decode {t1 - t0:.1f} s, upload {gib:.2f} GiB "
              f"in {time.perf_counter() - t1:.1f} s")
        n_noisy = int(noisy_h.data.shape[0])
        del noisy_h, clean_h
        steps_per_epoch = max(1, n_noisy // args.batch)
        epoch = 0
        done = False
        while not done:
            perm = (
                np.random.default_rng((0, epoch))
                .permutation(n_noisy)
                .astype(np.int32)
            )
            epoch += 1
            for s in range(steps_per_epoch // k):
                t1 = time.perf_counter()
                idx = perm[s * k * args.batch:(s + 1) * k * args.batch]
                idx = idx.reshape(k, args.batch)
                t2 = time.perf_counter()
                dev_idx = jax.device_put(idx)
                t3 = time.perf_counter()
                seed_w = iteration
                state, metrics = banked_step(state, dev_idx, seed_w, crop_eff)
                t4 = time.perf_counter()
                iteration += k
                prev, lagged = lagged, (iteration, metrics)
                drain_t = drain_prev(prev) if prev is not None else 0.0
                windows += 1
                if windows == warm_windows:
                    seg = {kk: 0.0 for kk in seg}
                    t_start = time.perf_counter()
                    iter_at_start = iteration
                elif windows > warm_windows:
                    seg["stack"] += t2 - t1
                    seg["put"] += t3 - t2
                    seg["dispatch"] += t4 - t3
                    seg["drain"] += drain_t
                if iteration >= args.steps + warm_windows * k:
                    done = True
                    break
    else:
        from dasr_tpu.data.datasets import DSNTrainDataset
        from dasr_tpu.data.pipeline import Loader

        ds = DSNTrainDataset(
            args.source, args.target, crop_size=args.crop, upscale_factor=4,
            transfer_uint8=True, device_bicubic=True,
        )
        # warm the decode cache so the probe measures steady state
        t0 = time.perf_counter()
        for i in range(len(ds)):
            ds[i]
        print(f"cache warm: {len(ds)} items in {time.perf_counter() - t0:.1f} s")
        loader = Loader(
            ds, batch_size=args.batch, shuffle=True, num_workers=args.workers,
            drop_last=True, prefetch=max(4, 2 * k),
        )
        pending = []
        epoch = 0
        done = False
        while not done:
            loader.set_epoch(epoch)
            epoch += 1
            it = iter(loader)
            wait_acc = 0.0
            while True:
                t0 = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    break
                wait_acc += time.perf_counter() - t0
                t1 = time.perf_counter()
                if k > 1:
                    pending.append(batch)
                    if len(pending) < k:
                        continue
                    stacked = {
                        key: np.stack([b[key] for b in pending])
                        for key in pending[0]
                    }
                    pending = []
                    t2 = time.perf_counter()
                    dev = device_put_packed(stacked)
                    t3 = time.perf_counter()
                    state, metrics = trainer.train_multi_step(state, dev)
                    t4 = time.perf_counter()
                    iteration += k
                    metrics = {kk: v[-1] for kk, v in metrics.items()}
                else:
                    t2 = time.perf_counter()
                    dev = device_put_packed(batch)
                    t3 = time.perf_counter()
                    state, metrics = trainer.train_step(state, dev)
                    t4 = time.perf_counter()
                    iteration += 1
                prev, lagged = lagged, (iteration, metrics)
                drain_t = drain_prev(prev) if prev is not None else 0.0
                windows += 1
                if windows == warm_windows:
                    seg = {kk: 0.0 for kk in seg}
                    t_start = time.perf_counter()
                    iter_at_start = iteration
                elif windows > warm_windows:
                    seg["wait"] += wait_acc
                    seg["stack"] += t2 - t1
                    seg["put"] += t3 - t2
                    seg["dispatch"] += t4 - t3
                    seg["drain"] += drain_t
                wait_acc = 0.0
                if iteration >= args.steps + warm_windows * k:
                    done = True
                    break

    if lagged is not None:
        drain_prev(lagged, force=True)  # final fence, matches the CLI
    total = time.perf_counter() - t_start
    n = iteration - iter_at_start
    arm = []
    if args.device_bank:
        arm.append("bank")
    if args.packed_trunk:
        arm.append("packed")
    arm.append("bf16" if args.bf16 else "f32")
    print(f"\n[{'+'.join(arm)}] k={k}: {n} steps in {total:.2f} s -> "
          f"{total / n * 1e3:.1f} ms/step ({n / total:.1f} steps/s)")
    for kk, v in seg.items():
        print(f"  {kk:9s} {v / n * 1e3:7.2f} ms/step ({v / total * 100:5.1f}% wall)")
    other = total - sum(seg.values())
    print(f"  {'other':9s} {other / n * 1e3:7.2f} ms/step ({other / total * 100:5.1f}% wall)")


if __name__ == "__main__":
    main()
