#!/usr/bin/env python
"""Evaluation CLI (reference ``tools/test.py``, SURVEY.md §2.2).

    python tools/test.py --cfg experiments/coco/rsgnet/w32_256x192.yaml \
        TEST.MODEL_FILE output/.../model_best.msgpack DATASET.ROOT /data/coco

Loads weights (native .msgpack checkpoints, or a reference .pth via the
torch->flax converter), runs the jitted validate loop with flip-test, and
prints the AP table.
"""
import argparse

import _init_paths  # noqa: F401
from rsgnet_tpu.config.defaults import load_config, opts_to_dict
from rsgnet_tpu.core.validate import validate, validate_distributed
from rsgnet_tpu.data import get_dataset
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.parallel.distributed import initialize_distributed
from rsgnet_tpu.utils.checkpoint import load_weights
from rsgnet_tpu.utils.logger import create_logger


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate keypoint network")
    p.add_argument("--cfg", required=True)
    p.add_argument("--workers", type=int, default=None,
                   help="host loader workers (default: cfg WORKERS)")
    p.add_argument("--pipeline", choices=("device", "host"), default="device",
                   help="eval preprocessing: fused device warp, or "
                        "reference-style host crop (low-bandwidth links)")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture an xprof trace of N steady-state eval "
                        "batches (compile excluded) into <output_dir>/xprof;"
                        " single-process eval only")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    initialize_distributed()     # no-op single-process; see tools/train.py
    import jax
    cfg = load_config(args.cfg, overrides=opts_to_dict(args.opts))
    logger, output_dir, _ = create_logger(cfg, args.cfg, "valid",
                                          rank=jax.process_index())
    model = get_pose_net(cfg)
    variables = load_weights(cfg, model, cfg.TEST.MODEL_FILE)
    if jax.process_index() == 0:
        # the reference logs get_model_summary on a dump input at startup
        from rsgnet_tpu.utils.summary import get_model_summary
        logger.info("=> model summary\n%s",
                    get_model_summary(cfg, model, variables))
    dataset = get_dataset(cfg, is_train=False)
    workers = cfg.WORKERS if args.workers is None else args.workers
    if jax.process_count() > 1:
        if args.profile:
            logger.warning("--profile is single-process only; ignored")
        # each host evaluates its dataset slice on local devices; results
        # gathered before the AP table (core/validate.py)
        name_value, ap = validate_distributed(
            cfg, dataset, model, variables, output_dir=output_dir,
            logger=logger, num_workers=workers, pipeline=args.pipeline)
    else:
        from rsgnet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(axis_name=cfg.MESH_DATA_AXIS) \
            if len(jax.devices()) > 1 else None
        name_value, ap = validate(cfg, dataset, model, variables,
                                  output_dir=output_dir, logger=logger,
                                  num_workers=workers,
                                  mesh=mesh,
                                  pipeline=args.pipeline,
                                  profile_steps=args.profile)
    logger.info("AP: %.4f", ap)
    for k, v in name_value.items():
        logger.info("%-8s: %.4f", k, v)


if __name__ == "__main__":
    main()
