#!/usr/bin/env python
"""Serving CLI: dynamic-batching keypoint inference over HTTP.

    # from a StableHLO artifact (tools/export.py; weights baked in):
    python tools/serve.py --artifact rsgnet_w32.stablehlo \
        --image-size 192x256 --port 8000

    # or straight from a config + checkpoint (live jitted pipeline):
    python tools/serve.py --cfg experiments/coco/rsgnet/w32_256x192.yaml \
        --model-file output/.../model_best.msgpack --port 8000

Requests are raw uint8 crops at MODEL.IMAGE_SIZE plus each crop's
center/scale (the detector's box mapping, pixel_std 200); responses are
image-space keypoints. End applications can instead POST /v1/predict_image
(one raw frame of any size + detector boxes — the server crops). Protocol +
client helpers: ``rsgnet_tpu.serving.http_server`` (npz over POST — stdlib
only, both ends).

The server coalesces concurrent requests into device batches
(``DynamicBatcher``; knobs: --max-wait-ms, --buckets, --in-flight) and
pre-compiles every bucket before binding the port, so /healthz == warm.
One process serves one chip; run N behind a TCP balancer for N chips.
"""
import argparse

import _init_paths  # noqa: F401
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Serve keypoint inference")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", help="StableHLO artifact (tools/export.py)")
    src.add_argument("--cfg", help="experiment yaml (live pipeline)")
    p.add_argument("--model-file", default="",
                   help="weights for --cfg (.msgpack or reference .pth)")
    p.add_argument("--image-size", default="",
                   help="WxH of request crops for --artifact (e.g. 192x256); "
                        "--cfg reads it from the config")
    p.add_argument("--uint8", action="store_true", default=None,
                   help="requests are raw uint8 crops (default for --cfg; "
                        "for --artifact, match its normalize_input flag)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--buckets", default="1,2,4,8,16,32,64",
                   help="comma-separated batch buckets (compiled at startup)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="max queueing delay a request pays to fill a batch")
    p.add_argument("--in-flight", type=int, default=2,
                   help="device batches kept in flight")
    p.add_argument("--max-queued", type=int, default=-1,
                   help="admission control: max instances waiting in the "
                        "queue before requests shed with 503+Retry-After "
                        "(default -1 = 8x the largest bucket; 0 = "
                        "unbounded)")
    p.add_argument("--compile-cache", default=".jax_serve_cache",
                   metavar="DIR",
                   help="persistent XLA compile-cache dir: server RESTARTS "
                        "load every bucket executable instead of recompiling "
                        "(warm /healthz in seconds, not minutes); '' "
                        "disables")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="KEY VALUE config override pairs (with --cfg)")
    return p.parse_args()


def build_serve_fn(args):
    """Returns (serve_fn, (H, W, 3), dtype)."""
    if args.artifact:
        if not args.image_size:
            raise SystemExit("--artifact needs --image-size WxH")
        w, h = (int(t) for t in args.image_size.lower().split("x"))
        from rsgnet_tpu.utils.export import read_exported
        dtype = np.uint8 if args.uint8 else np.float32
        return read_exported(args.artifact), (h, w, 3), dtype
    from rsgnet_tpu.config.defaults import load_config, opts_to_dict
    from rsgnet_tpu.core.inference import make_inference_fn
    from rsgnet_tpu.models import get_pose_net
    from rsgnet_tpu.utils.checkpoint import load_weights
    cfg = load_config(args.cfg, overrides=opts_to_dict(args.opts))
    model = get_pose_net(cfg)
    variables = load_weights(cfg, model, args.model_file
                             or cfg.TEST.MODEL_FILE)
    uint8 = True if args.uint8 is None else args.uint8
    infer = make_inference_fn(cfg, model, normalize_input=uint8)

    def serve_fn(images, centers, scales):
        return infer(variables, images, centers, scales)

    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    return serve_fn, (h, w, 3), (np.uint8 if uint8 else np.float32)


def main():
    args = parse_args()
    import logging
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    log = logging.getLogger("rsgnet_tpu.serving")
    if args.compile_cache:
        # restart path: every bucket executable loads from the cache
        # instead of recompiling (a cold 9-bucket warmup is minutes on a
        # tunneled chip; BENCH_NOTES round 4)
        from rsgnet_tpu.utils.compile_cache import wire
        wire(args.compile_cache)
    from rsgnet_tpu.serving import DynamicBatcher, ServingEngine
    from rsgnet_tpu.serving.http_server import make_server
    serve_fn, image_shape, dtype = build_serve_fn(args)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    engine = ServingEngine(serve_fn, buckets=buckets,
                           image_shape=image_shape, image_dtype=dtype)
    log.info("compiling %d buckets %s for %s crops...",
             len(buckets), buckets, "x".join(map(str, image_shape)))
    engine.warmup()
    max_queued = (8 * max(buckets) if args.max_queued < 0
                  else args.max_queued or None)
    batcher = DynamicBatcher(engine, max_wait_ms=args.max_wait_ms,
                             in_flight=args.in_flight,
                             max_queued=max_queued)
    server = make_server(batcher, host=args.host, port=args.port)
    log.info("serving on http://%s:%d (POST /v1/predict, "
             "POST /v1/predict_image, GET /v1/stats)",
             *server.server_address)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()       # no-op flag-set once serve_forever returned
        server.server_close()
        batcher.close()
        log.info("final stats: %s", batcher.stats())


if __name__ == "__main__":
    main()
