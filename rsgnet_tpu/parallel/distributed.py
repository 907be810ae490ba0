"""Multi-host (DCN) growth path (SURVEY.md §5.8).

The reference is single-node DataParallel; this framework is single-slice
data-parallel over ICI. When a run ever spans hosts, the recipe is:

1. ``initialize_distributed()`` on every process (jax.distributed handshake
   over DCN; coordinator/process env comes from the launcher),
2. ``make_global_mesh()`` — a 1-D data mesh over ALL processes' devices,
3. the existing sharded train step works unchanged: batches arrive sharded
   per host (each host feeds its local shard via
   ``jax.make_array_from_process_local_data``), gradient all-reduce rides
   ICI within a slice and DCN across slices, inserted by XLA from the same
   ``NamedSharding`` annotations.

Single-process calls are no-ops / equivalent to the local mesh, so this
module is safe to use unconditionally.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """jax.distributed.initialize when running multi-process; no-op when the
    launcher env is absent (single-process)."""
    import os
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return True
    return False


def make_global_mesh(axis_name: str = "data") -> Mesh:
    """1-D data mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_batch_to_global(batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble a global sharded batch from this process's local shard.

    Single-process: equivalent to a plain sharded device_put. Multi-process:
    each host contributes its slice of the global batch
    (jax.make_array_from_process_local_data).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
