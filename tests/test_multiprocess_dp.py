"""REAL multi-process data parallelism over the DCN stand-in (SURVEY §5.8).

Spawns 2 OS processes x 4 virtual CPU devices each; jax.distributed forms
the 8-device global mesh and Gloo carries the cross-process collectives
(the CPU analogue of DCN between TPU slices). Each process feeds only its
local half of a deterministic global batch through
``local_batch_to_global``; the REAL sharded train step (on-device aug +
fwd + bwd + all-reduced grads + update) runs two steps.

Asserts:
  - both processes observe identical losses (the mesh is one program);
  - the losses match the SINGLE-process 8-device run of the same batch
    to fp32 reduction tolerance — process topology does not change the
    math, which is the strongest multi-host correctness statement
    available without hardware.
"""
import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.parallel.mesh import make_mesh
from tests.worker_dp_common import make_cfg, make_global_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "worker_dp.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_losses():
    cfg = make_cfg()
    model = get_pose_net(cfg)
    mesh = make_mesh()                       # 8 virtual devices (conftest)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(0)), repl)
    step = make_train_step(cfg, model, get_spec("coco"), jit=False)
    step = jax.jit(step, in_shardings=(repl, None, repl), donate_argnums=(0,))
    batch = make_global_batch()
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    return losses


def _run_workers(worker, extra_args, tag):
    """Launch 2 worker processes, collect their printed ``TAG[pid]: a b``
    pairs, and assert success. Kills stragglers on timeout so a hung Gloo
    handshake can't leak processes holding the coordinator port."""
    port = _free_port()
    from tests._subproc import strip_axon_site
    env = {k: v for k, v in strip_axon_site().items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)] + extra_args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    seen = {}
    for out in outs:
        for m in re.finditer(
                rf"{tag}\[(\d)\]: ([\d.eE+-]+) ([\d.eE+-]+)", out):
            seen[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(seen) == {0, 1}, (seen, [o[-2000:] for o in outs])
    return seen


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="the fit() variant below runs the same 2-process topology "
           "through the WHOLE user path (raw step included) — this "
           "raw-step-only check adds ~6.5 min for a subset of that "
           "coverage; set RSGNET_SLOW_TESTS=1 to run both")
def test_two_process_dp_matches_single_process():
    seen = _run_workers(WORKER, [], "LOSSES")
    # identical across processes — one SPMD program
    np.testing.assert_allclose(seen[0], seen[1], rtol=0, atol=0)

    ref = _single_process_losses()
    np.testing.assert_allclose(seen[0], ref, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="~9 min on this 1-core box (three 2-process fits). Ran and "
           "passed round 4 (BENCH_NOTES/ROADMAP); slow tier keeps it "
           "(RSGNET_SLOW_TESTS=1) per the default-suite budget")
def test_two_process_consensual_preemption(tmp_path):
    """VERDICT round-3 item 5: a SIGTERM-equivalent on ONE rank must stop
    BOTH ranks at the same step (the stop flag is all-reduced inside the
    train step) instead of hanging the peer in the next collective, and the
    mid-epoch checkpoint must resume bitwise. The worker runs the whole
    protocol (uninterrupted reference fit -> rank-0-only-guard fit ->
    auto-resume fit) and asserts the checkpointed batch index and bitwise
    equality in-process; the parent asserts both ranks got there and agree."""
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture

    root = tmp_path / "coco_pre"
    write_fixture(str(root), make_dataset())
    worker = os.path.join(REPO, "tests", "worker_fit_preempt.py")
    seen = _run_workers(worker, [str(root), str(tmp_path / "runs")],
                        "PREEMPT")
    # (uninterrupted, resumed) checksums: equal per rank (asserted bitwise
    # in-worker) and identical across ranks (one SPMD program)
    np.testing.assert_allclose(seen[0], seen[1], rtol=0, atol=0)
    np.testing.assert_allclose(seen[0][0], seen[0][1], rtol=0, atol=0)


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="~3 min of real 2-process Gloo on this 1-core box; default-tier "
           "DP coverage stays via test_dp_hlo + the in-process 8-device "
           "numeric tests (RSGNET_SLOW_TESTS=1 runs this)")
def test_two_process_fit_matches_single_process(tmp_path):
    """The WHOLE user path (fit: process-sharded loader -> global-mesh train
    step -> per-host validate_distributed -> rank-0 checkpointing) under 2
    real processes equals the single-process 8-device fit numerically."""
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture
    from tests.worker_fit_common import make_fit_cfg

    root = tmp_path / "coco_mp"
    write_fixture(str(root), make_dataset())
    out_mp = tmp_path / "out_mp"

    worker = os.path.join(REPO, "tests", "worker_fit.py")
    seen = _run_workers(worker, [str(root), str(out_mp)], "FIT")
    # one SPMD program: both processes end with identical params + perf
    np.testing.assert_allclose(seen[0], seen[1], rtol=0, atol=0)
    # process 0 alone wrote the checkpoint
    assert (out_mp / "checkpoint.msgpack").exists()

    # single-process reference: same config, same fixture, 8-device mesh
    from rsgnet_tpu.core.function import fit
    from rsgnet_tpu.data import get_dataset
    from rsgnet_tpu.models import get_pose_net
    import jax as _jax
    cfg = make_fit_cfg()
    model = get_pose_net(cfg)
    train_ds = get_dataset(cfg, root=str(root), image_set="val",
                           is_train=True)
    train_ds.db = (train_ds.db * 3)[:8]
    val_ds = get_dataset(cfg, root=str(root), image_set="val",
                         is_train=False)
    state, best = fit(cfg, model, train_ds, val_ds,
                      output_dir=str(tmp_path / "out_sp"), max_epochs=1,
                      num_workers=2)
    leaves = _jax.tree_util.tree_leaves(_jax.device_get(state.params))
    checksum = float(sum(np.abs(np.asarray(x, np.float64)).sum()
                         for x in leaves))
    np.testing.assert_allclose(seen[0][0], checksum, rtol=1e-5)
    np.testing.assert_allclose(seen[0][1], best, rtol=0, atol=1e-9)


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="~3 min of real 2-process Gloo; the grain process-shard "
           "CONTRACT (global-batch bit-identity) is default-tier in "
           "test_grain_pipeline.py — this run proves the fit() plumbing "
           "(RSGNET_SLOW_TESTS=1)")
def test_two_process_fit_with_grain_loader(tmp_path):
    """TRAIN.LOADER=grain under 2 real processes: fit builds the
    process-sharded grain loader (VERDICT round-4 item 6) and both ranks
    finish with identical params + perf — one SPMD program fed by grain's
    per-process slices of the common shuffled order."""
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture

    root = tmp_path / "coco_grain"
    write_fixture(str(root), make_dataset())
    worker = os.path.join(REPO, "tests", "worker_fit.py")
    seen = _run_workers(worker,
                        [str(root), str(tmp_path / "out_mp"), "grain"],
                        "FIT")
    np.testing.assert_allclose(seen[0], seen[1], rtol=0, atol=0)
    assert (tmp_path / "out_mp" / "checkpoint.msgpack").exists()
