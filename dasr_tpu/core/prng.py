"""PRNG-key discipline.

The reference pins global seeds and cudnn determinism
(reference: codes/DSN/train.py:76-79, codes/SRN/train.py:55-59). JAX PRNG is
deterministic by construction; this module just gives trainers a tiny
stateless helper to derive per-step / per-purpose keys so that runs are
reproducible and restartable from the step counter alone.
"""

from __future__ import annotations

import zlib

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def step_key(root: jax.Array, step: int) -> jax.Array:
    """Key for one training step: fold the step index into the run key."""
    return jax.random.fold_in(root, step)


def named_key(key: jax.Array, name: str) -> jax.Array:
    """Stable sub-key per purpose (e.g. 'augment', 'dropout')."""
    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)
