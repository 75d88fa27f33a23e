"""Segment-timed replica of the dsn_train hot loop (1-core host analysis).

Measures, per dispatch window, where the main thread's wall time goes:
``wait`` (loader queue empty), ``stack`` (window collation), ``put``
(packed upload incl. the tunnel RTT), ``dispatch`` (jitted call queue) and
``fence`` (metric readbacks) — the quantities that decide whether
``--steps_per_call`` helps or hurts end-to-end on a given host.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dsn_e2e.py \
      --k 8 --steps 240 --source /tmp/dsnsub/source --target /tmp/dsnsub/target
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
    args = ap.parse_args()

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasr_tpu.data.datasets import DSNTrainDataset
    from dasr_tpu.data.io import enable_decode_cache
    from dasr_tpu.data.pipeline import Loader
    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer
    from dasr_tpu.utils.transfer import device_put_packed, metrics_to_host

    enable_decode_cache(24)

    ds = DSNTrainDataset(
        args.source, args.target, crop_size=args.crop, upscale_factor=4,
        transfer_uint8=True, device_bicubic=True,
    )
    # warm the decode cache so the probe measures steady state, not decode
    t0 = time.perf_counter()
    for i in range(len(ds)):
        ds[i]
    print(f"cache warm: {len(ds)} items in {time.perf_counter() - t0:.1f} s")

    loader = Loader(
        ds, batch_size=args.batch, shuffle=True, num_workers=args.workers,
        drop_last=True, prefetch=max(4, 2 * args.k),
    )

    cfg = DSNConfig(filter="avg_pool", w_tex=0.006, dtype=jnp.bfloat16)
    trainer = DSNTrainer(cfg)
    lr = args.crop // 4
    state = trainer.init_state(jax.random.key(0), lr_size=lr, hr_size=args.crop)

    k = args.k
    seg = {"wait": 0.0, "stack": 0.0, "put": 0.0, "dispatch": 0.0, "fence": 0.0}
    iteration = 0
    pending = []
    t_start = None
    warm_windows = 3 * max(1, 8 // k)
    windows = 0
    done = False
    epoch = 0
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
            # accumulate loader-wait across ALL k fetches of a window (the
            # early `continue` below would otherwise drop k-1 of them and
            # mis-attribute that wall time to 'other')
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
            t5 = t4
            if iteration // 50 > (iteration - k) // 50:
                metrics_to_host(metrics)
                t5 = time.perf_counter()
            windows += 1
            if windows == warm_windows:
                # steady state begins: reset all counters
                seg = {kk: 0.0 for kk in seg}
                t_start = time.perf_counter()
                iter_at_start = iteration
            elif windows > warm_windows:
                seg["wait"] += wait_acc
                seg["stack"] += t2 - t1
                seg["put"] += t3 - t2
                seg["dispatch"] += t4 - t3
                seg["fence"] += t5 - t4
            wait_acc = 0.0
            if iteration >= args.steps + (warm_windows * k):
                done = True
                break

    metrics_to_host(metrics)  # final drain
    total = time.perf_counter() - t_start
    n = iteration - iter_at_start
    print(f"\nk={k}: {n} steps in {total:.2f} s -> "
          f"{total / n * 1e3:.1f} ms/step ({n / total:.1f} steps/s)")
    for kk, v in seg.items():
        print(f"  {kk:9s} {v / n * 1e3:7.2f} ms/step ({v / total * 100:5.1f}% wall)")
    other = total - sum(seg.values())
    print(f"  {'other':9s} {other / n * 1e3:7.2f} ms/step ({other / total * 100:5.1f}% wall)")


if __name__ == "__main__":
    main()
