"""Device-mesh construction and collective helpers.

The reference has no distributed backend at all — its only parallelism is
single-process ``nn.DataParallel`` (reference: codes/SRN/models/networks.py:144-146)
and CPU dataloader workers. Here the XLA collective runtime over ICI *is* the
backend: we build a named ``jax.sharding.Mesh`` once and express

  * data parallelism   — batch sharded over axis ``"data"``; gradients are
    averaged by XLA-inserted all-reduces when the loss is a mean over the
    sharded batch axis under ``jit``/``shard_map``;
  * spatial parallelism — image tiles sharded over axis ``"spatial"`` for
    large-image inference (the TPU-native replacement for the reference's
    recursive ``forward_chop``, codes/SRN/utils/util.py:87-147).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh.

    With ``n_data=None`` all (remaining) devices go to the data axis.
    On a single chip this degenerates to a 1x1 mesh and every collective
    becomes a no-op, so the same jitted step runs anywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_spatial != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_spatial={n_spatial}"
            )
        n_data = len(devices) // n_spatial
    n = n_data * n_spatial
    grid = np.asarray(devices[:n]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Largest data-parallel mesh whose size divides the global batch."""
    import math

    devices = list(devices if devices is not None else jax.devices())
    n = math.gcd(batch_size, len(devices))
    return make_mesh(n_data=n, devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (tile) axis of a stack of image tiles."""
    return NamedSharding(mesh, P(SPATIAL_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with its leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_stacked_batch(mesh: Mesh, tree):
    """Device-put K stacked batches (leading K axis = scan steps,
    second axis = batch sharded over 'data') — the multi-step train path."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """Mesh + canonical shardings, passed through trainers."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_spatial(self) -> int:
        return self.mesh.shape[SPATIAL_AXIS]

    @property
    def batch(self) -> NamedSharding:
        return batch_sharding(self.mesh)

    @property
    def repl(self) -> NamedSharding:
        return replicated(self.mesh)
