"""Train state containers (pure pytrees, donate-friendly)."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import optax


@flax.struct.dataclass
class NetState:
    """One network: params (+ mutable collections) + its optimizer state."""

    params: Any
    opt_state: Any
    extra: Any = None  # e.g. batch_stats for BatchNorm discriminators


@flax.struct.dataclass
class GANTrainState:
    """Generator + up to two discriminators + step counter.

    The reference keeps these as separate torch optimizers
    (codes/SRN/models/DASR_model.py:120-143, codes/DSN/train.py:152-157);
    here it is one immutable pytree that a jitted step maps to the next
    pytree — donate the argument and the update is in-place on device.
    """

    step: int
    g: NetState
    d_target: Optional[NetState] = None
    d_source: Optional[NetState] = None


def make_net_state(params, tx: optax.GradientTransformation, extra=None) -> NetState:
    return NetState(params=params, opt_state=tx.init(params), extra=extra)
