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
    launcher env is absent (single-process). Returns True if initialized.

    Launcher contract (any arg not passed explicitly):
      JAX_NUM_PROCESSES        — total process count (>1 activates)
      JAX_COORDINATOR_ADDRESS  — host:port of process 0
      JAX_PROCESS_ID           — this process's rank
    On managed TPU pods jax.distributed auto-detects all three, so only
    JAX_NUM_PROCESSES (or the num_processes arg) is strictly required here.
    """
    import os
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if not num_processes or num_processes <= 1:
        # partial launcher env = misconfiguration, not single-process: if we
        # silently no-op'd, N processes would each run as rank 0 and clobber
        # one another's checkpoints/logs in the shared output dir
        stray = [k for k in ("JAX_COORDINATOR_ADDRESS", "JAX_PROCESS_ID")
                 if k in os.environ]
        if stray and coordinator_address is None and process_id is None:
            raise RuntimeError(
                f"{'/'.join(stray)} set but JAX_NUM_PROCESSES is "
                f"{os.environ.get('JAX_NUM_PROCESSES', 'unset')} — set "
                "JAX_NUM_PROCESSES=<total processes> on every host (or "
                "unset the others for a single-process run)")
        return False
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


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


def shard_bounds(total: int, process_id: int, num_processes: int):
    """Contiguous [lo, hi) slice of ``total`` items owned by a process —
    the single formula shared by ``TopDownDataset.shard`` and the result
    gather, so ownership is always consistent."""
    return (total * process_id // num_processes,
            total * (process_id + 1) // num_processes)


def gather_host_results(arrays, total: int):
    """All-gather per-process result arrays (leading axis = this process's
    ``shard_bounds`` slice of ``total``) into full host arrays, concatenated
    in process order.

    Local sizes differ by at most one, and every process derives every
    other's count from the same formula — so arrays are zero-padded to the
    common max, exchanged with ``multihost_utils.process_allgather`` (one
    collective over DCN/Gloo), and trimmed. Single-process: identity.

    64-bit leaves (e.g. int64 COCO image ids, which are arbitrary ints from
    the annotation file) would be silently truncated to 32 bits by the jax
    round trip under the default ``jax_enable_x64=False`` — they travel as
    a trailing pair of uint32 words instead and are viewed back after.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return tuple(arrays)
    from jax.experimental import multihost_utils
    counts = [shard_bounds(total, p, nproc)[1]
              - shard_bounds(total, p, nproc)[0] for p in range(nproc)]
    m = max(counts)

    def pad(a):
        if len(a) == m:
            return a
        return np.concatenate(
            [a, np.zeros((m - len(a),) + a.shape[1:], a.dtype)])

    dtypes = [a.dtype for a in arrays]
    trailing = [a.shape[1:] for a in arrays]
    wide = [d.itemsize == 8 for d in dtypes]
    padded = tuple(
        np.ascontiguousarray(pad(a)).view(np.uint32).reshape(m, -1, 2)
        if w else pad(a)
        for a, w in zip(arrays, wide))
    gathered = multihost_utils.process_allgather(padded)  # (nproc, m, ...)
    out = []
    for g, d, t, w in zip(gathered, dtypes, trailing, wide):
        full = np.concatenate([g[p, :counts[p]] for p in range(nproc)])
        if w:
            full = np.ascontiguousarray(full).view(d).reshape((total,) + t)
        out.append(full)
    return tuple(out)
