#!/usr/bin/env python
"""Single-image top-down inference CLI — the minimum end-to-end slice
(BASELINE.json:7, SURVEY.md §3.5): bbox -> center/scale -> device affine crop
-> backbone -> decode -> keypoints in original-image coordinates.

    python tools/infer.py --demo                      # synthetic image
    python tools/infer.py --image img.jpg --box x,y,w,h [--ckpt weights]
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
    p.add_argument("--box", default=None, help="x,y,w,h person box")
    p.add_argument("--ckpt", default="", help="weights (.msgpack or .pth)")
    p.add_argument("--demo", action="store_true",
                   help="run on a synthetic image")
    p.add_argument("--tiny", action="store_true",
                   help="tiny topology (fast smoke)")
    args = p.parse_args()
    if not args.demo and not args.image:
        p.error("one of --demo or --image is required")
    if args.image and not args.box:
        p.error("--image requires --box x,y,w,h")
    return args


def main():
    from rsgnet_tpu.config.defaults import (load_config, rsgnet_w32_256x192,
                                            tiny_rsgnet)
    from rsgnet_tpu.core.inference import make_inference_fn
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
        box = np.array([200.0, 80.0, 180.0, 360.0])
    else:
        from rsgnet_tpu.utils.imageio import read_image
        img = read_image(args.image)
        box = np.array([float(v) for v in args.box.split(",")])

    model = get_pose_net(cfg)
    if not args.ckpt and not args.demo:
        # load_weights("") returns the RANDOM init (smoke mode) — on a real
        # image that prints plausible-looking garbage, so say so loudly
        print("WARNING: no --ckpt given; running with RANDOM-INIT weights "
              "(output is not a real prediction)", file=sys.stderr)
    variables = load_weights(cfg, model, args.ckpt)
    c, s = box_to_center_scale(box, cfg.aspect_ratio)
    cb = np.asarray(c, np.float32)[None]
    sb = np.asarray(s, np.float32)[None]
    trans = get_affine_transform_jax(cb, sb, np.zeros((1,), np.float32),
                                     tuple(cfg.MODEL.IMAGE_SIZE))
    crop = crop_and_normalize(np.asarray(img, np.float32)[None], trans,
                              tuple(cfg.MODEL.IMAGE_SIZE))
    infer = make_inference_fn(cfg, model)
    preds, maxvals = infer(variables, crop, cb, sb)
    preds, maxvals = np.asarray(preds)[0], np.asarray(maxvals)[0]
    out = [{"joint": i, "x": round(float(x), 2), "y": round(float(y), 2),
            "score": round(float(v), 4)}
           for i, ((x, y), v) in enumerate(zip(preds, maxvals[:, 0]))]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
