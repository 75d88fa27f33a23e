"""Learning-rate schedules.

Matches the reference's two regimes:
  * DSN — constant LR, then linear decay to 0 over the last
    ``num_decay_epochs`` (reference: codes/DSN/train.py:152-157, LambdaLR
    with factor 1 - max(0, e - (E - D)) / D).
  * SRN — MultiStepLR: multiply by gamma at each milestone iteration
    (reference: codes/SRN/models/DASR_model.py:146-149; milestones
    [35k, 80k, 100k, 150k], gamma 0.5 in the shipped configs).

Expressed as optax schedules over the *step* counter; for DSN the caller
maps epochs to steps (steps_per_epoch) so the jitted step stays pure.
"""

from __future__ import annotations

from typing import Sequence

import optax


def dsn_linear_decay(
    base_lr: float, num_epochs: int, num_decay_epochs: int, steps_per_epoch: int
) -> optax.Schedule:
    decay_start = (num_epochs - num_decay_epochs) * steps_per_epoch
    total_decay = num_decay_epochs * steps_per_epoch

    def schedule(step):
        import jax.numpy as jnp

        # the reference decays per-epoch; reproduce the staircase exactly
        epoch_like = (step // steps_per_epoch) * steps_per_epoch
        frac = jnp.maximum(0, epoch_like - decay_start) / total_decay
        return base_lr * jnp.maximum(0.0, 1.0 - frac)

    return schedule


def multistep(base_lr: float, milestones: Sequence[int], gamma: float = 0.5):
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones}
    )
