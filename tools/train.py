#!/usr/bin/env python
"""Training CLI (reference ``tools/train.py``, SURVEY.md §2.1).

    python tools/train.py --cfg experiments/coco/rsgnet/w32_256x192.yaml \
        DATASET.ROOT /data/coco TRAIN.END_EPOCH 210

Builds the model + datasets from the config, trains data-parallel over all
local devices with on-device augmentation, validates each epoch, checkpoints
best-by-AP, and auto-resumes from ``checkpoint.msgpack`` when present.

Multi-host: launch one copy per host with JAX_NUM_PROCESSES /
JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID set (see
``rsgnet_tpu.parallel.distributed``); the mesh then spans every host's
devices, each host feeds its slice of the global batch, and process 0 owns
all file outputs. Single-host runs need no extra flags.
"""
import argparse

import _init_paths  # noqa: F401
from rsgnet_tpu.config.defaults import load_config, opts_to_dict
from rsgnet_tpu.core.function import fit
from rsgnet_tpu.data import get_dataset
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.parallel.distributed import initialize_distributed
from rsgnet_tpu.utils.logger import create_logger


def parse_args():
    p = argparse.ArgumentParser(description="Train keypoint network")
    p.add_argument("--cfg", required=True, help="experiment yaml")
    p.add_argument("--dataDir", default="", help="override DATASET.ROOT")
    p.add_argument("--workers", type=int, default=None,
                   help="host loader workers (default: cfg WORKERS)")
    p.add_argument("--max-epochs", type=int, default=None,
                   help="cap END_EPOCH (smoke runs)")
    p.add_argument("--eval-every", type=int, default=1,
                   help="validate every N epochs")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (dev mode)")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture an xprof trace of N steady-state train "
                        "steps (first epoch, compile/warmup excluded) into "
                        "<output_dir>/xprof; view with TensorBoard")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="KEY VALUE config override pairs")
    return p.parse_args()


def main():
    args = parse_args()
    # must run before any jax device query — the distributed handshake
    # (no-op single-process) determines what jax.devices() returns
    initialize_distributed()
    import jax
    cfg = load_config(args.cfg, overrides=opts_to_dict(args.opts))
    if args.dataDir:
        cfg.DATASET.ROOT = args.dataDir
    logger, output_dir, tb_dir = create_logger(cfg, args.cfg, "train",
                                               rank=jax.process_index())
    logger.info("config: %s", cfg)
    logger.info("devices: %d global / %d local, %d process(es)",
                jax.device_count(), jax.local_device_count(),
                jax.process_count())
    if args.debug_nans:
        from rsgnet_tpu.utils.profiler import enable_nan_checks
        enable_nan_checks(True)

    model = get_pose_net(cfg)
    if jax.process_index() == 0:
        # the reference logs get_model_summary on a dump input at startup
        from rsgnet_tpu.utils.summary import get_model_summary
        logger.info("=> model summary\n%s", get_model_summary(cfg, model))
    train_ds = get_dataset(cfg, is_train=True)
    val_ds = get_dataset(cfg, is_train=False)
    state, best = fit(cfg, model, train_ds, val_ds, output_dir=output_dir,
                      logger=logger,
                      num_workers=cfg.WORKERS if args.workers is None
                      else args.workers,
                      max_epochs=args.max_epochs, tb_dir=tb_dir,
                      eval_every=args.eval_every,
                      profile_steps=args.profile)
    logger.info("done; best perf %.4f", best)


if __name__ == "__main__":
    main()
