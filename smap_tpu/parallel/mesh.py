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


def is_axon_runtime() -> bool:
    """True on the tunneled axon TPU relay (a dev harness, not a real TPU
    VM). Several PJRT features execute pathologically there and are gated
    off: donating the ~800 MB train state or annotating the train step
    with NamedShardings makes the program run ~150x degraded
    (docs/perf_notes.md round-3 item 10)."""
    try:
        return "axon" in jax.devices()[0].client.platform_version
    except Exception:
        return False


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all local devices by default."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def stacked_batch_sharding(mesh: Mesh,
                           axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 1 (batch) of [K, B, ...] scan-stacked batches; the
    leading K axis (steps-per-execution window) stays unsharded."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS,
                stacked: bool = False):
    """Place a pytree of host arrays with the batch axis sharded.

    Single-process: a plain sharded device_put. Multi-process (one process
    per host on a pod): each host holds only its *local* slice of the global
    batch (the data iterator shards with num_shards=process_count — the
    SPMD analogue of the reference's per-rank DistributedSampler,
    cvpack/dataset/torch_samplers/), and the global array is assembled
    from the process-local shards without any cross-host copy.

    ``stacked=True`` places [K, B, ...] scan-stacked windows (see
    ``make_jitted_multi_step``): the batch axis is axis 1, K unsharded.
    """
    if jax.process_count() > 1:
        sharding = (stacked_batch_sharding(mesh, axis_name) if stacked
                    else batch_sharding(mesh, axis_name))
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, np.asarray(a)), batch)
    if mesh.devices.size == 1:
        # One device: there is nothing to shard — skip the
        # device_put(NamedSharding) placement (pointless metadata; plain
        # placement keeps single-chip serving/training on the simplest
        # PJRT path, which matters on quirky runtimes like the axon
        # relay — docs/perf_notes.md round-3 item 10). A mesh pinned to a
        # non-default device still gets honored via a plain device_put.
        import jax.numpy as jnp

        dev = mesh.devices.flat[0]
        if dev == jax.devices()[0]:
            return jax.tree.map(jnp.asarray, batch)
        return jax.tree.map(lambda a: jax.device_put(a, dev), batch)
    sharding = (stacked_batch_sharding(mesh, axis_name) if stacked
                else batch_sharding(mesh, axis_name))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
