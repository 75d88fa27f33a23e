"""Segment-timed replica of the SHIPPED srn_train (DASR stage-3) hot loop.

The SRN analog of tools/probe_dsn_e2e.py: mirrors the CLI's lagged gated
readback protocol exactly (cli/srn_train.py) — metrics of window N are
read back only after window N+1 is queued, only when N crossed a
print_freq (200) boundary, plus a fence every 32 unread windows to bound
the device input queue.

Measures, per dispatch window, where the main thread's wall time goes:
``wait`` (loader queue empty), ``stack`` (window collation), ``put``
(packed upload incl. the tunnel RTT), ``dispatch`` (jitted call queue)
and ``drain`` (lagged metric readbacks incl. the runahead fences).

Arms:
  --device_bank   banked windows from the four device-resident stage-3
                  corpora (srn_train --device_bank) — per-window wire
                  traffic is the (K, B) int32 fake-index block only
  --k N           scan window length (steps_per_call; CLI fast path: 8)
  --hlo_check     (bank arm) scan the compiled banked program's text for
                  bank-sized copy ops — the r4 layout-mismatch failure
                  mode (BENCH_NOTES "device-resident banks")

Usage (stage-3 inputs from an auto_reproduce work tree):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_srn_e2e.py \
      --k 8 --steps 240 --hr /tmp/ar/target \
      --fake /tmp/ar_work_r5/DSN_results/0603_DSN_LRs_aim2019/imgs_from_target \
      --real /tmp/ar/source \
      --ddm /tmp/ar_work_r5/DSN_results/0603_DSN_LRs_aim2019/ddm_target
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--hr", required=True)
    ap.add_argument("--fake", required=True)
    ap.add_argument("--real", required=True)
    ap.add_argument("--ddm", required=True)
    ap.add_argument("--hr_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--device_bank", action="store_true")
    ap.add_argument("--hlo_check", action="store_true")
    # net-size overrides for smoke runs (defaults = production DASR)
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--nb", type=int, default=23)
    ap.add_argument("--gc", type=int, default=32)
    ap.add_argument("--feature_weight", type=float, default=1.0)
    args = ap.parse_args()

    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import numpy as np

    from dasr_tpu.data.io import enable_decode_cache
    from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer
    from dasr_tpu.utils.transfer import device_put_packed, metrics_to_host

    enable_decode_cache(24)

    # the production DASR configuration (train_DASR_auto_reproduce.json)
    cfg = SRNConfig(nf=args.nf, nb=args.nb, gc=args.gc, d_nf=64,
                    gan_H_source=0.0, feature_weight=args.feature_weight)
    trainer = SRNTrainer(cfg)
    lr_size = args.hr_size // cfg.scale
    state = trainer.init_state(jax.random.key(0), lr_size=lr_size)

    k = args.k
    seg = {"wait": 0.0, "stack": 0.0, "put": 0.0, "dispatch": 0.0, "drain": 0.0}
    iteration = 0
    windows = 0
    warm_windows = 3 * max(1, 8 // k)
    t_start = None
    iter_at_start = 0

    # --- shipped lagged gated readback (cli/srn_train.py) ---
    lagged = None
    runahead = 0
    print_freq = 200

    def drain_prev(prev, force=False):
        nonlocal runahead
        t0 = time.perf_counter()
        it_at, dev_m = prev
        boundary = it_at // print_freq > (it_at - k) // print_freq
        if force or boundary:
            metrics_to_host(dev_m, reduce_mean=True)
            runahead = 0
        else:
            runahead += 1
            if runahead >= 32:
                metrics_to_host(dev_m, reduce_mean=True)
                runahead = 0
        return time.perf_counter() - t0

    if args.device_bank:
        from dasr_tpu.data.device_bank import (
            build_bank,
            build_ddm_bank,
            make_banked_srn_step,
        )
        from dasr_tpu.data.io import list_images

        t0 = time.perf_counter()
        fake_h = build_bank(args.fake, min_size=lr_size)
        hr_h = build_bank(args.hr, min_size=args.hr_size)
        real_h = build_bank(args.real, min_size=lr_size)
        ddm_h = build_ddm_bank(list_images(args.ddm), fake_h.sizes)
        t1 = time.perf_counter()
        step, banks = make_banked_srn_step(
            trainer, fake_h, hr_h, real_h, ddm_h, args.hr_size
        )
        jax.block_until_ready(banks[1].data)
        gib = sum(b.data.nbytes for b in (fake_h, hr_h, real_h, ddm_h)) / 2**30
        print(f"bank: decode {t1 - t0:.1f} s, upload {gib:.2f} GiB "
              f"in {time.perf_counter() - t1:.1f} s")
        n_fake = int(fake_h.data.shape[0])
        del fake_h, hr_h, real_h, ddm_h
        if args.hlo_check:
            idx0 = np.zeros((k, args.batch), np.int32)
            txt = step._jfn.lower(
                state, *step._banks, idx0, np.uint32(0), step._frozen,
                step._hr_size, True, True, True, True,
            ).compile().as_text()
            big = _big_copies(txt)
            print(f"hlo_check: {len(big)} bank-sized copies"
                  + (" — " + "; ".join(big[:4]) if big else " (clean)"))
        steps_per_epoch = max(1, n_fake // args.batch)
        epoch = 0
        done = False
        while not done:
            perm = (
                np.random.default_rng((0, epoch))
                .permutation(n_fake)
                .astype(np.int32)
            )
            epoch += 1
            for s in range(max(1, steps_per_epoch // k)):
                t1 = time.perf_counter()
                idx = np.resize(
                    perm[s * k * args.batch:(s + 1) * k * args.batch],
                    k * args.batch,
                ).reshape(k, args.batch)
                t2 = time.perf_counter()
                dev_idx = jax.device_put(idx)
                t3 = time.perf_counter()
                state, metrics = step(state, dev_idx, iteration)
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
        from dasr_tpu.data.datasets import DASRUnpairedDataset
        from dasr_tpu.data.pipeline import Loader

        ds = DASRUnpairedDataset({
            "mode": "LRHR_wavelet_unpair_fake_weights_EQ",
            "dataroot_HR": args.hr, "dataroot_fake_LR": args.fake,
            "dataroot_real_LR": args.real, "dataroot_fake_weights": args.ddm,
            "HR_size": args.hr_size, "scale": cfg.scale,
            "transfer_uint8": True,
        })
        t0 = time.perf_counter()
        for i in range(len(ds)):
            ds[i]
        print(f"cache warm: {len(ds)} items in {time.perf_counter() - t0:.1f} s")
        loader = Loader(
            ds, batch_size=args.batch, shuffle=True, num_workers=args.workers,
            drop_last=True, prefetch=max(4, 2 * k),
        )
        keys = ("LR_fake", "LR_real", "HR", "HR_unpair", "fake_w")
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
                pending.append(batch)
                if len(pending) < k:
                    continue
                stacked = {
                    key: np.stack([b[key] for b in pending]) for key in keys
                }
                pending = []
                t2 = time.perf_counter()
                dev = device_put_packed(stacked)
                t3 = time.perf_counter()
                if k > 1:
                    state, metrics = trainer.train_multi_step(state, dev)
                else:
                    state, metrics = trainer.train_step(
                        state, {key: v[0] for key, v in dev.items()}
                    )
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
    arm = "bank" if args.device_bank else "host"
    print(f"\n[{arm}] k={k}: {n} steps in {total:.2f} s -> "
          f"{total / n * 1e3:.1f} ms/step ({n / total:.1f} steps/s)")
    for kk, v in seg.items():
        print(f"  {kk:9s} {v / n * 1e3:7.2f} ms/step ({v / total * 100:5.1f}% wall)")
    other = total - sum(seg.values())
    print(f"  {'other':9s} {other / n * 1e3:7.2f} ms/step ({other / total * 100:5.1f}% wall)")


def _big_copies(txt: str, min_bytes: int = 256 << 20):
    """Lines of compiled HLO text that are copy ops over >= min_bytes
    arrays (the r4 whole-bank-relayout failure signature)."""
    import re

    bad = []
    for line in txt.splitlines():
        if "copy(" not in line and not re.search(r"fusion.*kind=kLoop.*copy",
                                                 line):
            continue
        m = re.search(r"=\s*(u8|f32|bf16|s32)\[([0-9,]+)\]", line)
        if not m:
            continue
        dt = {"u8": 1, "f32": 4, "bf16": 2, "s32": 4}[m.group(1)]
        n = 1
        for d in m.group(2).split(","):
            n *= int(d)
        if n * dt >= min_bytes:
            bad.append(line.strip()[:120])
    return bad


if __name__ == "__main__":
    main()
