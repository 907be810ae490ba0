"""Default-tier coverage of the consensual-preemption stop protocol.

VERDICT round-4 weak 1 / item 2: the 2-OS-process preemption tests live in
the slow tier, which left ``train_one_epoch(stop_sync=True)`` and the
boundary reduce with no default-suite regression coverage. These tests run
the SAME code path in-process on the 8-virtual-device mesh (SURVEY.md §4
point 3 — multi-chip logic tested on virtual devices) in seconds:

- the injected batch carries the local stop flag on ABSOLUTE step indices;
- the train step max-reduces the sharded flag, so a flag visible to only
  ONE device's shard still flips the global decision;
- the loop breaks only on the all-reduced ``metrics["stop"]`` read back
  from a completed step (one-step delay from the lazy metric fetch);
- ``consensual_stop_flag`` (the epoch-boundary half) reduces correctly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rsgnet_tpu.core.function import (PreemptionGuard, _inject_stop_flags,
                                      consensual_stop_flag, train_one_epoch)
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import COCO
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.parallel.mesh import make_mesh

from test_train_step import _fake_batch, _tiny_cfg


class StopAt(PreemptionGuard):
    """Deterministic: the local flag raises at absolute step >= n."""

    def __init__(self, n):
        super().__init__()
        self.n = n

    def should_stop(self, step):
        return step >= self.n


@pytest.fixture(scope="module")
def harness():
    cfg = _tiny_cfg()
    model = get_pose_net(cfg)
    mesh = make_mesh()
    assert mesh.size == 8
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(0)), repl)
    step = make_train_step(cfg, model, COCO, jit=False)
    keys = ("image", "joints", "joints_vis", "center", "scale", "stop")
    step = jax.jit(step,
                   in_shardings=(repl, {k: shard for k in keys}, repl))
    return cfg, mesh, shard, state, step


def _batches(n_batches, bs=8):
    rng = np.random.RandomState(0)
    return [_fake_batch(rng, n=bs) for _ in range(n_batches)]


def test_step_max_reduces_single_device_flag(harness):
    """The consensual core: a stop flag raised on ONE device's shard alone
    must surface as metrics['stop'] > 0 on every rank (the in-step
    max-reduce over the sharded global array)."""
    _, _, shard, state, step = harness
    batch = _batches(1)[0]
    # only the LAST device's shard element carries the flag
    batch["stop"] = np.zeros((8,), np.float32)
    batch["stop"][7] = 1.0
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["stop"]) == 1.0

    batch["stop"] = np.zeros((8,), np.float32)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["stop"]) == 0.0


def test_stop_sync_breaks_on_reduced_flag_with_one_step_delay(harness):
    """train_one_epoch(stop_sync=True): the guard fires at step 2, the
    flag rides the step-2 batch, and the lazy metric fetch means the loop
    reads it back after dispatching step 3 — all ranks (devices here)
    break at the same settled step boundary, steps 4..7 never run."""
    _, _, shard, state, step = harness
    loader = _batches(8)
    state2, loss, steps_done, stopped = train_one_epoch(
        step, state, loader, jax.random.PRNGKey(3), epoch=0, shard=shard,
        guard=StopAt(2), stop_sync=True)
    assert stopped
    assert steps_done == 4          # flag at 2, read after 3 completes
    assert np.isfinite(loss)


def test_stop_sync_idle_guard_runs_full_epoch(harness):
    _, _, shard, state, step = harness
    loader = _batches(3)
    _, _, steps_done, stopped = train_one_epoch(
        step, state, loader, jax.random.PRNGKey(3), epoch=0, shard=shard,
        guard=StopAt(10**9), stop_sync=True)
    assert not stopped
    assert steps_done == 3


def test_inject_stop_flags_uses_absolute_steps():
    """Mid-epoch resume: flags are keyed on start_step + i so a step-keyed
    guard (the documented subclass API) sees ABSOLUTE indices."""
    batches = [{"image": np.zeros((4, 2, 2, 3), np.float32)}
               for _ in range(4)]
    out = list(_inject_stop_flags(iter(batches), StopAt(3), start_step=2))
    flags = [float(b["stop"][0]) for b in out]
    assert flags == [0.0, 1.0, 1.0, 1.0]
    assert all(b["stop"].shape == (4,) for b in out)


def test_boundary_flag_reduces_over_mesh(harness):
    cfg, mesh, _, _, _ = harness
    assert consensual_stop_flag(False, mesh, cfg.MESH_DATA_AXIS) is False
    assert consensual_stop_flag(True, mesh, cfg.MESH_DATA_AXIS) is True
