"""Numerical guards and profiling hooks (SURVEY.md §5).

The reference's only guard is ``assert not torch.isnan(g_loss)``
(reference: codes/DSN/train.py:262) plus cudnn determinism pinning. Here:

  * ``check_finite(metrics, step)`` — host-side NaN/Inf check over a metric
    dict; raises with the offending keys (used by the train CLIs every log
    interval, so a diverging GAN fails loudly like the reference's assert);
  * ``tree_check_finite`` — jitted all-finite reduction over a pytree
    (cheap: one scalar readback) for checkpoint-time state audits;
  * ``profile(dir)`` — context manager around ``jax.profiler.trace`` for
    step-level TPU traces (--profile flag in the train CLIs).
"""

from __future__ import annotations

import contextlib
import math
from typing import Dict

import jax
import jax.numpy as jnp


class NonFiniteError(RuntimeError):
    pass


def check_finite(metrics: Dict[str, float], step: int) -> None:
    bad = [k for k, v in metrics.items() if not math.isfinite(float(v))]
    if bad:
        raise NonFiniteError(
            f"non-finite training metrics at step {step}: {', '.join(bad)}"
        )


@jax.jit
def tree_all_finite(tree) -> jax.Array:
    leaves = [
        jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    return jnp.all(jnp.stack(leaves)) if leaves else jnp.asarray(True)


def tree_check_finite(tree, what: str = "state") -> None:
    if not bool(tree_all_finite(tree)):
        raise NonFiniteError(f"non-finite values in {what}")


@contextlib.contextmanager
def profile(trace_dir: str = None):
    """jax.profiler trace if a directory is given, else a no-op."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield
