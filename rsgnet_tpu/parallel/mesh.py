"""Device-mesh and sharding helpers (SURVEY.md §2.11-bis, §5.8).

The reference's only parallelism is single-process data parallel
(``torch.nn.DataParallel`` scatter/gather over NCCL). The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over the chips, batch sharded on the
``data`` axis, parameters replicated, and the gradient all-reduce emitted by
XLA over ICI from the sharding annotations — no explicit collectives in user
code.

These helpers are also what a future multi-host (DCN) extension would grow
from; for now everything assumes a single slice.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
