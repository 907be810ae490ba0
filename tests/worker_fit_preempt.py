"""Multi-process CONSENSUAL-preemption worker (test_multiprocess_dp.py).

Exercises the stop_sync protocol end-to-end under 2 real processes x 4
virtual CPU devices: a deterministic guard fires on RANK 0 ONLY (the
worst case — a single-rank operator SIGTERM used to hang the peer in the
next collective), the all-reduced batch flag makes BOTH ranks stop at the
same step, rank 0 writes the mid-epoch checkpoint, and a fresh fit()
auto-resumes to a final state BITWISE-identical to an uninterrupted run
of the same topology.

Prints ``PREEMPT[pid]: <checksum_uninterrupted> <checksum_resumed>`` for
the parent plus in-worker asserts on the checkpointed batch index.

argv: pid nproc port fixture_root out_root
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
fixture_root = sys.argv[4]
out_root = sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# no persistent compile cache: asymmetric cache hits desync the two workers'
# step timing and the distributed barrier flakes (see worker_dp.py)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgnet_tpu.core.function import PreemptionGuard, fit  # noqa: E402
from rsgnet_tpu.data import get_dataset  # noqa: E402
from rsgnet_tpu.models import get_pose_net  # noqa: E402
from tests.worker_fit_common import make_fit_cfg  # noqa: E402

STOP_AT_BATCH = 2     # rank 0 flags this loader batch; flag is read back
                      # from its metrics one dispatch later -> both ranks
                      # stop having dispatched STOP_AT_BATCH + 2 steps


class Rank0Guard(PreemptionGuard):
    """Deterministic injection: only rank 0 ever wants to stop."""

    def should_stop(self, step: int) -> bool:
        return pid == 0 and step >= STOP_AT_BATCH


def checksum(state):
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    return float(sum(np.abs(np.asarray(x, np.float64)).sum()
                     for x in leaves))


def main():
    assert jax.process_count() == nproc
    cfg = make_fit_cfg()
    model = get_pose_net(cfg)

    def datasets():
        train_ds = get_dataset(cfg, root=fixture_root, image_set="val",
                               is_train=True)
        train_ds.db = (train_ds.db * 20)[:48]   # 6 global-batch-8 steps
        return train_ds

    # 1) uninterrupted reference run (same topology, no guard)
    state_ref, _ = fit(cfg, model, datasets(), None,
                       output_dir=os.path.join(out_root, "ref"),
                       max_epochs=1, num_workers=2)
    ref = checksum(state_ref)

    # 2) interrupted run: rank-0-only guard, consensual stop mid-epoch
    out_int = os.path.join(out_root, "interrupted")
    fit(cfg, model, datasets(), None, output_dir=out_int, max_epochs=1,
        num_workers=2, preempt_guard=Rank0Guard())
    # both ranks must reach this line — a diverged stop would deadlock the
    # peer in the next collective and the parent's timeout would kill us.
    # Writes are atomic (tmp + os.replace), so existence == complete; rank 1
    # just waits out rank 0's write skew before resuming from it.
    import time
    ckpt = os.path.join(out_int, "checkpoint.msgpack")
    for _ in range(600):
        if os.path.exists(ckpt):
            break
        time.sleep(0.1)
    assert os.path.exists(ckpt), "rank 0 did not write the mid-epoch ckpt"
    if pid == 0:
        from rsgnet_tpu.utils.checkpoint import peek_checkpoint
        meta = peek_checkpoint(ckpt)
        got = meta["batch_in_epoch"]
        want = STOP_AT_BATCH + 2
        assert got == want, f"stopped at batch {got}, expected {want}"

    # 3) resume: same output dir, auto-resume re-enters epoch 0 mid-epoch
    state_res, _ = fit(cfg, model, datasets(), None, output_dir=out_int,
                       max_epochs=1, num_workers=2)
    res = checksum(state_res)

    # bitwise: the resumed run replays the identical RNG/shuffle streams
    assert res == ref, f"resumed {res!r} != uninterrupted {ref!r}"

    # the epoch-BOUNDARY consensus primitive (fit._boundary_stop's core):
    # a flag raised on rank 0 only must read back 1.0 on EVERY rank — a
    # signal landing during validate/checkpointing stops all ranks too
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rsgnet_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(axis_name="data")
    local = np.full((len(jax.local_devices()),),
                    1.0 if pid == 0 else 0.0, np.float32)
    flag = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    got = float(jax.jit(jnp.max)(flag))
    assert got == 1.0, f"rank {pid} read boundary flag {got}"

    print(f"PREEMPT[{pid}]: {ref:.6f} {res:.6f}", flush=True)


if __name__ == "__main__":
    main()
