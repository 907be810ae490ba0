"""Multi-process DP worker (launched by test_multiprocess_dp.py).

Each process owns 4 virtual CPU devices; jax.distributed assembles the
8-device global mesh over 2 processes (Gloo collectives — the CPU stand-in
for DCN). Runs the REAL sharded train step on a deterministic global batch,
feeding only this process's local half via ``local_batch_to_global``, and
prints the per-step losses for the parent to compare against the
single-process result.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: deliberately NOT using the suite's persistent compile cache here —
# asymmetric cache hits make the two workers' step timing diverge on a
# single-core host and the distributed Shutdown barrier times out (measured:
# flaky DEADLINE_EXCEEDED with the cache on, stable without)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgnet_tpu.config.defaults import tiny_rsgnet  # noqa: E402
from rsgnet_tpu.core.train import create_train_state, make_train_step  # noqa: E402
from rsgnet_tpu.data.skeletons import get_spec  # noqa: E402
from rsgnet_tpu.models import get_pose_net  # noqa: E402
from rsgnet_tpu.parallel.distributed import (local_batch_to_global,  # noqa: E402
                                             make_global_mesh)
from tests.worker_dp_common import make_cfg, make_global_batch  # noqa: E402


def main():
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc
    cfg = make_cfg()
    model = get_pose_net(cfg)
    spec = get_spec("coco")
    mesh = make_global_mesh()
    repl = NamedSharding(mesh, P())
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    state = jax.device_put(state, repl)
    # mesh= keeps the "pallas" warp partitioner-safe if TRAIN.WARP ever
    # resolves to it here (shard_map'd per shard; ops/pallas/shear_warp.py)
    step = make_train_step(cfg, model, spec, jit=False, mesh=mesh)
    step = jax.jit(step, in_shardings=(repl, None, repl),
                   donate_argnums=(0,))

    full = make_global_batch()
    n = full["image"].shape[0]
    lo, hi = pid * n // nproc, (pid + 1) * n // nproc
    local = {k: v[lo:hi] for k, v in full.items()}
    gbatch = local_batch_to_global(local, mesh)

    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(2):
        key, sub = jax.random.split(key)
        state, m = step(state, gbatch, sub)
        losses.append(float(jax.device_get(m["loss"])))
    print(f"LOSSES[{pid}]: {losses[0]:.6f} {losses[1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
