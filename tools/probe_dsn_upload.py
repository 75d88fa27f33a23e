"""Isolate upload/compute overlap on the remote-TPU tunnel (DSN step).

Four timed modes on the production DSN step (DeResnet+FSD+avg_pool bs8
crop256 bf16, in-step device bicubic):
  resident   — inputs already on device, steps queued back-to-back
  k1-upload  — one packed u8 upload per step (the dsn_train k=1 shape)
  k8-upload  — one packed u8 upload per 8-step scan window
  k8-thread  — same, but uploads run in a background thread 2 windows
               ahead of dispatch (tests whether the put's RTT/transport
               serializes with device execution or can be hidden)

All modes end with ONE metric fence; rates are steady-state.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dsn_upload.py
"""

from __future__ import annotations

import queue
import threading
import time


def main():
    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasr_tpu.train.dsn_trainer import DSNConfig, DSNTrainer
    from dasr_tpu.utils.transfer import device_put_packed

    cfg = DSNConfig(filter="avg_pool", w_tex=0.006, dtype=jnp.bfloat16)
    trainer = DSNTrainer(cfg)
    crop, bs = 256, 8
    lr = crop // 4
    state0 = trainer.init_state(jax.random.key(0), lr_size=lr, hr_size=crop)

    rng = np.random.default_rng(0)

    def host_batch(pre=()):
        return {
            "input": rng.integers(0, 256, (*pre, bs, crop, crop, 3), np.uint8),
            "disc": rng.integers(0, 256, (*pre, bs, lr, lr, 3), np.uint8),
        }

    fence = lambda m: float(m["loss/g_overall_loss"])  # noqa: E731
    fence8 = lambda m: float(m["loss/g_overall_loss"][-1])  # noqa: E731

    # compile both paths
    state, m = trainer.train_step(state0, device_put_packed(host_batch()))
    fence(m)
    state, m = trainer.train_multi_step(state0, device_put_packed(host_batch((8,))))
    fence8(m)

    n = 48

    # -- resident ------------------------------------------------------------
    dev = device_put_packed(host_batch())
    state, m = trainer.train_step(state0, dev)
    fence(m)
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = trainer.train_step(state, dev)
    fence(m)
    dt = (time.perf_counter() - t0) / n
    print(f"resident   : {dt * 1e3:6.2f} ms/step")

    # -- k1 fresh upload per step -------------------------------------------
    batches = [host_batch() for _ in range(n)]
    state, m = trainer.train_step(state0, device_put_packed(host_batch()))
    fence(m)
    t0 = time.perf_counter()
    for b in batches:
        state, m = trainer.train_step(state, device_put_packed(b))
    fence(m)
    dt = (time.perf_counter() - t0) / n
    print(f"k1-upload  : {dt * 1e3:6.2f} ms/step")

    # -- k8 fresh upload per window -----------------------------------------
    wins = [host_batch((8,)) for _ in range(n // 8)]
    state, m = trainer.train_multi_step(state0, device_put_packed(host_batch((8,))))
    fence8(m)
    t0 = time.perf_counter()
    for w in wins:
        state, m = trainer.train_multi_step(state, device_put_packed(w))
    fence8(m)
    dt = (time.perf_counter() - t0) / n
    print(f"k8-upload  : {dt * 1e3:6.2f} ms/step")

    # -- k8 with threaded upload 2 windows ahead -----------------------------
    state, m = trainer.train_multi_step(state0, device_put_packed(host_batch((8,))))
    fence8(m)
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def uploader():
        for w in wins:
            q.put(device_put_packed(w))
        q.put(None)

    t = threading.Thread(target=uploader, daemon=True)
    t0 = time.perf_counter()
    t.start()
    while True:
        dev = q.get()
        if dev is None:
            break
        state, m = trainer.train_multi_step(state, dev)
    fence8(m)
    dt = (time.perf_counter() - t0) / n
    print(f"k8-thread  : {dt * 1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
