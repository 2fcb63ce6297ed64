"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL process-group runtime
(``cvpack/torch_modeling/engine/engine.py:52-62`` and ``lib/utils/comm.py``
in zju3dv/SMAP). Instead of one process per GPU with DDP allreduce hooks,
training runs SPMD under ``jax.jit`` over a named mesh: batch arrays are
sharded along the ``data`` axis, parameters are replicated, and XLA inserts
the gradient all-reduce over ICI automatically.

The model is ~40M params with no sequence axis, so data parallelism is the
only profitable axis (SURVEY.md §2.7); the mesh is still N-D-ready — pass a
devices grid and axis names to extend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all local devices by default."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
