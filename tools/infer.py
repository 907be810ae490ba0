#!/usr/bin/env python
"""Top-down inference CLI — the minimum end-to-end slice (BASELINE.json:7,
SURVEY.md §3.5) plus the reference family's demo path: person boxes ->
center/scale -> device affine crops -> ONE batched forward -> decode ->
keypoints in original-image coordinates, optionally rendered back onto the
source frame as a skeleton overlay.

    python tools/infer.py --demo                      # synthetic image
    python tools/infer.py --image img.jpg --box x,y,w,h [--box ...] \
        [--ckpt weights] [--out overlay.png]
"""
import argparse
import json
import sys

import _init_paths  # noqa: F401
import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None, help="experiment yaml (default W32)")
    p.add_argument("--image", default=None)
    p.add_argument("--box", action="append", default=None,
                   help="x,y,w,h person box (repeat for multiple people)")
    p.add_argument("--ckpt", default="", help="weights (.msgpack or .pth)")
    p.add_argument("--out", default=None,
                   help="write a skeleton-overlay PNG of the predictions")
    p.add_argument("--thresh", type=float, default=0.3,
                   help="min joint score drawn in --out overlay")
    p.add_argument("--demo", action="store_true",
                   help="run on a synthetic image")
    p.add_argument("--tiny", action="store_true",
                   help="tiny topology (fast smoke)")
    args = p.parse_args()
    if not args.demo and not args.image:
        p.error("one of --demo or --image is required")
    if args.image and not args.box:
        p.error("--image requires at least one --box x,y,w,h")
    return args


def main():
    from rsgnet_tpu.config.defaults import (load_config, rsgnet_w32_256x192,
                                            tiny_rsgnet)
    from rsgnet_tpu.core.inference import make_inference_fn
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.models import get_pose_net
    from rsgnet_tpu.ops.affine import (box_to_center_scale,
                                       get_affine_transform_jax)
    from rsgnet_tpu.ops.warp import crop_and_normalize
    from rsgnet_tpu.utils.checkpoint import load_weights

    args = parse_args()
    if args.cfg:
        cfg = load_config(args.cfg)
    elif args.tiny:
        cfg = tiny_rsgnet()
    else:
        cfg = rsgnet_w32_256x192()

    if args.demo:
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (480, 640, 3), np.uint8)
        boxes = np.array([[200.0, 80.0, 180.0, 360.0],
                          [40.0, 120.0, 150.0, 300.0]])
    else:
        from rsgnet_tpu.utils.imageio import read_image
        img = read_image(args.image)
        boxes = np.array([[float(v) for v in b.split(",")]
                          for b in args.box])

    model = get_pose_net(cfg)
    if not args.ckpt and not args.demo:
        # load_weights("") returns the RANDOM init (smoke mode) — on a real
        # image that prints plausible-looking garbage, so say so loudly
        print("WARNING: no --ckpt given; running with RANDOM-INIT weights "
              "(output is not a real prediction)", file=sys.stderr)
    variables = load_weights(cfg, model, args.ckpt)
    cs = [box_to_center_scale(b, cfg.aspect_ratio) for b in boxes]
    cb = np.asarray([c for c, _ in cs], np.float32)
    sb = np.asarray([s for _, s in cs], np.float32)
    trans = get_affine_transform_jax(cb, sb,
                                     np.zeros((len(boxes),), np.float32),
                                     tuple(cfg.MODEL.IMAGE_SIZE))
    crops = crop_and_normalize(
        np.broadcast_to(np.asarray(img, np.float32)[None],
                        (len(boxes),) + img.shape), trans,
        tuple(cfg.MODEL.IMAGE_SIZE))
    infer = make_inference_fn(cfg, model)
    preds, maxvals = infer(variables, crops, cb, sb)
    preds, maxvals = np.asarray(preds), np.asarray(maxvals)
    out = [{"box": [round(float(v), 2) for v in box],
            "keypoints": [{"joint": i, "x": round(float(x), 2),
                           "y": round(float(y), 2),
                           "score": round(float(v), 4)}
                          for i, ((x, y), v) in enumerate(zip(p, m[:, 0]))]}
           for box, p, m in zip(boxes, preds, maxvals)]
    print(json.dumps(out, indent=1))
    if args.out:
        from rsgnet_tpu.utils.vis import save_prediction_image
        save_prediction_image(img, preds, maxvals,
                              get_spec(cfg.DATASET.DATASET), args.out,
                              thresh=args.thresh)
        print(f"overlay written to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
