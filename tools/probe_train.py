"""Measure the full-size DASR train step on the real chip.

Reproduces the BENCH_NOTES secondary metric: nf64 nb23 gc32, batch 6
(effective 12 = fake+real halves), HR 128, wavelet FS, dual-D, LPIPS
feature loss — the reference's production training configuration
(codes/SRN/options/train/train_DASR_auto_reproduce_aim2019.json).

Usage: python tools/probe_train.py [n_steps] [steps_per_call] [scan_fused]
Prints ms/step and imgs/s plus the projected 350k-iter wall-clock.
steps_per_call > 1 measures the scanned multi-step dispatch path
(srn_train --steps_per_call), which amortizes the ~9 ms remote-dispatch
cost per step. scan_fused=1 builds the training G with
scan_blocks+fused_tail (the exact rewrites, registry network_G flags) for
an A/B against the default unrolled generator.
"""

from __future__ import annotations

import sys
import time


def main():
    from dasr_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasr_tpu.train.srn_trainer import SRNConfig, SRNTrainer

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    scan_fused = len(sys.argv) > 3 and sys.argv[3] not in ("0", "")
    cfg = SRNConfig(nf=64, nb=23, gc=32, d_nf=64, gan_H_source=0.0)
    g_model = None
    if scan_fused:
        from dasr_tpu.nn.generators import RRDBNet

        g_model = RRDBNet(
            nf=64, nb=23, gc=32, upscale=4, dtype=cfg.dtype,
            scan_blocks=True, fused_tail=True,
        )
    trainer = SRNTrainer(cfg, g_model=g_model)
    state = trainer.init_state(jax.random.key(0), lr_size=32)

    rng = np.random.default_rng(0)
    b, lr, hr = 6, 32, 128

    def mk(shape_prefix=()):
        return {
            "LR_fake": jnp.asarray(rng.random((*shape_prefix, b, lr, lr, 3)), jnp.float32),
            "LR_real": jnp.asarray(rng.random((*shape_prefix, b, lr, lr, 3)), jnp.float32),
            "HR": jnp.asarray(rng.random((*shape_prefix, b, hr, hr, 3)), jnp.float32),
            "HR_unpair": jnp.asarray(rng.random((*shape_prefix, b, hr, hr, 3)), jnp.float32),
            "fake_w": jnp.asarray(rng.random((*shape_prefix, b, lr // 2, lr // 2, 1)), jnp.float32),
        }

    if k > 1:
        batch = mk((k,))
        step_fn = lambda st: trainer.train_multi_step(st, batch)  # noqa: E731
        fence = lambda m: float(m["loss/l_g_pix"][-1])  # noqa: E731
    else:
        batch = mk()
        step_fn = lambda st: trainer.train_step(st, batch)  # noqa: E731
        fence = lambda m: float(m["loss/l_g_pix"])  # noqa: E731

    state, metrics = step_fn(state)  # compile
    fence(metrics)
    state, metrics = step_fn(state)  # post-retrace steady state
    fence(metrics)
    n_calls = max(1, n_steps // k)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, metrics = step_fn(state)
    fence(metrics)  # fence
    dt = (time.perf_counter() - t0 - 0.035) / (n_calls * k)
    imgs = 2 * b / dt
    print(
        f"train_step (steps_per_call={k}, scan_fused={int(scan_fused)}): "
        f"{dt * 1e3:.1f} ms -> {imgs:.0f} imgs/s "
        f"(350k iters ~= {350000 * dt / 3600:.1f} h on one chip)"
    )


if __name__ == "__main__":
    main()
