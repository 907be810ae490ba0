"""Multi-process fit() worker (launched by test_multiprocess_dp.py).

Unlike worker_dp.py (which drives the raw train step), this exercises the
WHOLE user path under 2 processes x 4 virtual CPU devices: fit() builds the
process-sharded BatchLoader, the global-mesh train step, the per-host eval
via validate_distributed, and writes checkpoints from process 0 only.
Prints the final params checksum + best perf for the parent to compare
against the single-process 8-device run of the identical config.

argv: pid nproc port fixture_root out_dir [loader]
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
fixture_root = sys.argv[4]
out_dir = sys.argv[5]
loader = sys.argv[6] if len(sys.argv) > 6 else "threads"

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

from rsgnet_tpu.core.function import fit  # noqa: E402
from rsgnet_tpu.data import get_dataset  # noqa: E402
from rsgnet_tpu.models import get_pose_net  # noqa: E402
from tests.worker_fit_common import make_fit_cfg  # noqa: E402


def params_checksum(state):
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    return float(sum(np.abs(np.asarray(x, np.float64)).sum()
                     for x in leaves))


def main():
    assert jax.process_count() == nproc
    cfg = make_fit_cfg()
    cfg.TRAIN.LOADER = loader
    model = get_pose_net(cfg)
    train_ds = get_dataset(cfg, root=fixture_root, image_set="val",
                           is_train=True)
    train_ds.db = (train_ds.db * 3)[:8]
    val_ds = get_dataset(cfg, root=fixture_root, image_set="val",
                         is_train=False)
    # grain: worker_count=0 keeps it in-process — this 1-core box cannot
    # absorb 2 fit processes x N grain spawns, and the sharding contract
    # under test is index arithmetic, not decode parallelism
    state, best = fit(cfg, model, train_ds, val_ds, output_dir=out_dir,
                      max_epochs=1,
                      num_workers=0 if loader == "grain" else 2)
    print(f"FIT[{pid}]: {params_checksum(state):.6f} {best:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
