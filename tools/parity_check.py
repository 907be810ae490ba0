#!/usr/bin/env python
"""AP-parity harness against the reference (ROADMAP.md gap 1).

Runs the moment real data + a released reference checkpoint are available:

    python tools/parity_check.py \
        --cfg experiments/coco/hrnet/w32_256x192_adam_lr1e-3.yaml \
        --ckpt pose_hrnet_w32_256x192.pth \
        --data /data/coco --expected-ap 74.4

Protocol (identical to the reference eval): detector or gt boxes per the
config, flip-test averaging, quarter-offset or DARK decode, OKS-NMS,
COCO keypoint AP. Exits nonzero if |AP - expected| > 0.1 (the BASELINE
parity gate) when --expected-ap is given.
"""
import argparse
import sys

import _init_paths  # noqa: F401
from rsgnet_tpu.config.defaults import load_config, opts_to_dict
from rsgnet_tpu.core.validate import validate
from rsgnet_tpu.data import get_dataset
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.utils.checkpoint import load_weights


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", required=True, help="reference .pth or .msgpack")
    p.add_argument("--data", default=None, help="DATASET.ROOT override")
    p.add_argument("--expected-ap", type=float, default=None,
                   help="reference AP (percent or fraction) to gate against")
    p.add_argument("--pipeline", choices=("device", "host"), default="device")
    p.add_argument("--workers", type=int, default=None,
                   help="host loader workers (default: cfg WORKERS)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = load_config(args.cfg, overrides=opts_to_dict(args.opts))
    if args.data:
        cfg.DATASET.ROOT = args.data
    model = get_pose_net(cfg)
    variables = load_weights(cfg, model, args.ckpt)
    dataset = get_dataset(cfg, is_train=False)
    name_value, ap = validate(cfg, dataset, model, variables,
                              pipeline=args.pipeline,
                              num_workers=cfg.WORKERS if args.workers is None
                              else args.workers)
    for k, v in name_value.items():
        print(f"{k:<8s}: {v:.4f}")
    if args.expected_ap is not None:
        want = args.expected_ap
        if want > 1.0:                     # given in percent
            want /= 100.0
        diff = abs(ap - want)
        print(f"AP {ap * 100:.2f} vs reference {want * 100:.2f} "
              f"(|dAP| = {diff * 100:.2f}, gate 0.10)")
        sys.exit(0 if diff <= 0.001 else 1)


if __name__ == "__main__":
    main()
