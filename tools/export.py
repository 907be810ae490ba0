"""Export the inference pipeline as a deployable StableHLO artifact.

    python tools/export.py --cfg experiments/coco/rsgnet/w32_256x192.yaml \
        --model-file output/model_best.msgpack --out rsgnet_w32.shlo \
        [--platforms tpu cpu] [--raw-uint8]

The artifact embeds the weights and the full preprocess->forward->flip-test
->decode program; load it anywhere with
``rsgnet_tpu.utils.export.read_exported`` (no model code needed).
"""
from __future__ import annotations

import argparse

import jax

import _init_paths  # noqa: F401

from rsgnet_tpu.config.defaults import load_config
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.utils.export import export_inference, save_exported


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--model-file", required=True,
                    help=".msgpack (flax) or .pth (torch) weights")
    ap.add_argument("--out", required=True)
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms (default: current backend)")
    ap.add_argument("--raw-uint8", action="store_true",
                    help="artifact accepts raw uint8 crops and normalizes "
                         "on device")
    ap.add_argument("--e2e", action="store_true",
                    help="export the END-TO-END pipeline: raw padded uint8 "
                         "sources + boxes -> keypoints (device warp fused)")
    ap.add_argument("--src-size", type=int, nargs=2, default=(640, 640),
                    metavar=("H", "W"), help="padded source size for --e2e")
    args = ap.parse_args()

    cfg = load_config(args.cfg)
    model = get_pose_net(cfg)
    from rsgnet_tpu.utils.checkpoint import load_weights
    variables = load_weights(cfg, model, args.model_file)
    if args.e2e:
        from rsgnet_tpu.utils.export import export_e2e
        blob = export_e2e(cfg, model, variables, tuple(args.src_size),
                          platforms=args.platforms)
    else:
        blob = export_inference(cfg, model, variables,
                                platforms=args.platforms,
                                normalize_input=args.raw_uint8)
    save_exported(args.out, blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={args.platforms or [jax.default_backend()]})")


if __name__ == "__main__":
    main()
