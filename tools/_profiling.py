"""Shared scalar-digest timing protocol for the tools/profile_*.py scripts.

On the tunneled axon backend, `jax.block_until_ready` can return before
remote execution finishes and full-output materialization measures D2H
bandwidth / per-leaf RTT instead of compute (BENCH_NOTES.md). The honest
protocol, used by every profiler here:

- reduce each measured computation to ONE on-device fp32 scalar (`digest`)
  — the device cannot produce it without completing the compute, and D2H
  is 4 bytes;
- dispatch iterations pipelined; materialize only the scalars (`timeit`);
- for stateful train steps, thread the state device-side and fetch a single
  loss scalar at the END (`timeit_pipelined_step`) — matching how
  core/function.py's lazy metric fetch drives real training.

Deliberate non-DRY: each profile_*.py builds its own synthetic batch (and a
few re-declare a bare step) with slightly different ranges/shapes. Those
blocks are the RECORDED WORKLOADS behind specific BENCH_NOTES numbers, so
they are kept frozen per script rather than consolidated here — sharing
them would either silently change a historical workload or need per-script
parameters that reintroduce the duplication.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def digest(*outs):
    """Single fp32 scalar forcing completion of every output."""
    total = jnp.float32(0.0)
    for o in jax.tree_util.tree_leaves(outs):
        total = total + jnp.sum(jnp.asarray(o, jnp.float32))
    return total


def timeit(name, fn, arg_sets, iters=10, batch=None):
    """fn must return a SCALAR. Pipelined dispatch, scalars materialized."""
    s = [fn(*arg_sets[i % len(arg_sets)]) for i in range(2)]
    [np.asarray(x) for x in s]
    t0 = time.perf_counter()
    outs = [fn(*arg_sets[i % len(arg_sets)]) for i in range(iters)]
    sink = [np.asarray(x) for x in outs]
    dt = (time.perf_counter() - t0) / iters
    assert all(np.isfinite(x) for x in sink)
    rate = f"{batch / dt:10.1f} img/s" if batch else ""
    print(f"{name:52s} {dt * 1e3:8.1f} ms/iter {rate}", flush=True)
    return dt


def timeit_pipelined_step(name, step, state0, arg_sets, iters=10,
                          batch=None):
    """Sequential stateful step: state threads device-side; ONE loss scalar
    is materialized at the end."""
    state, m = step(state0, *arg_sets[0])
    np.asarray(m["loss"])                    # compile + settle
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, *arg_sets[i % len(arg_sets)])
    loss = np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    rate = f"{batch / dt:10.1f} img/s" if batch else ""
    print(f"{name:52s} {dt * 1e3:8.1f} ms/iter {rate}", flush=True)
    return dt
