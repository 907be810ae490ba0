#!/usr/bin/env python
"""Offered-load profile of the dynamic-batching serving runtime.

tools/profile_serving.py measures the DEVICE's latency/throughput knee per
batch size; this tool measures the SERVER: closed-loop clients (each submits
one single-crop request, waits for the response, repeats) drive the full
``ServingEngine`` + ``DynamicBatcher`` stack, sweeping client counts. The
interesting outputs per concurrency level:

  - goodput (responses/s) — should climb toward the device's batch knee as
    the batcher coalesces more singles per dispatch;
  - request latency p50/p95 — queueing + batching + compute + response;
  - mean batch fill — how many instances the coalescer actually packs.

On the tunneled axon backend, per-dispatch RTT (~30 ms) dominates small
fills; direct-attached serving sees the same shapes minus the floor
(BENCH_NOTES tunnel rules — never compare across sessions).

Run on the real TPU:  python tools/profile_batcher.py [--clients 1,8,32,128]
"""
from __future__ import annotations

import argparse
import threading
import time

import numpy as np

import _init_paths  # noqa: F401


def run_level(batcher, image_shape, clients: int, seconds: float,
              timeout_s: float = 120.0):
    """Closed-loop: ``clients`` threads, one in-flight request each.

    Admission-control aware (VERDICT round-4 item 3): a shed submit
    (``QueueFullError``) backs off by the server's retry estimate and is
    counted, a deadline-expired request is counted — both re-enter the
    closed loop, so goodput/latency describe ADMITTED work while the shed
    columns expose how much load the bound turned away."""
    from concurrent.futures import TimeoutError as FutureTimeoutError

    from rsgnet_tpu.serving import DeadlineExceededError, QueueFullError
    rng = np.random.default_rng(0)
    h, w, _ = image_shape
    img = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
    center = np.full((1, 2), 100.0, np.float32)
    scale = np.full((1, 2), 1.0, np.float32)
    stop = time.perf_counter() + seconds
    lats, lock = [], threading.Lock()
    counts = {"shed": 0, "expired": 0}

    def client():
        mine, shed, expired = [], 0, 0
        backoff = 0.0
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                batcher.predict(img, center, scale, timeout=timeout_s)
            except QueueFullError as e:
                # a well-behaved client (or load balancer) honors
                # Retry-After and backs off EXPONENTIALLY on repeated
                # sheds — fixed-interval retries from hundreds of shed
                # clients are a retry storm that starves the dispatcher
                # thread on this 1-core host (measured: goodput -> 0 at
                # 256 clients; BENCH_NOTES round 5)
                shed += 1
                backoff = min(max(e.retry_after_s, 2 * backoff, 0.05), 4.0)
                time.sleep(backoff)
                continue
            except (DeadlineExceededError, FutureTimeoutError):
                # dispatch-time drop OR a host-side result() timeout (the
                # request was taken just before its deadline and finished
                # after) — either way the client counts it and loops on
                expired += 1
                continue
            backoff = 0.0
            mine.append(time.perf_counter() - t0)
        with lock:
            lats.extend(mine)
            counts["shed"] += shed
            counts["expired"] += expired

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    lat = np.asarray(lats) if lats else np.zeros(1)
    return {"clients": clients, "responses": len(lats),
            "goodput_rps": len(lats) / dt,
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p95_ms": float(np.percentile(lat, 95) * 1e3),
            "shed": counts["shed"], "expired": counts["expired"]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", default="1,4,16,64,256")
    p.add_argument("--buckets", default="1,2,4,8,16,32,64,128,256",
                   help="engine buckets (each costs one compile at startup)")
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--max-wait-ms", type=float, default=8.0)
    p.add_argument("--in-flight", type=int, default=3)
    p.add_argument("--max-queued", type=int, default=0,
                   help="admission control: max queued instances (0 = "
                        "unbounded, the pre-round-5 behavior)")
    p.add_argument("--timeout-s", type=float, default=120.0,
                   help="per-request deadline (dispatch-time drops count "
                        "as expired)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model (CPU smoke); default flagship W32")
    p.add_argument("--ab-split", action="store_true",
                   help="per client level, run the sweep twice in-session: "
                        "cost-driven chunk splitting OFF then ON "
                        "(same engine, same compiles)")
    args = p.parse_args()

    import os

    import jax

    from rsgnet_tpu.utils.compile_cache import wire
    wire(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_serve_cache"))
    from rsgnet_tpu.config.defaults import rsgnet_w32_256x192, tiny_rsgnet
    from rsgnet_tpu.core.inference import make_inference_fn
    from rsgnet_tpu.models import get_pose_net, init_variables
    from rsgnet_tpu.serving import DynamicBatcher, ServingEngine

    cfg = tiny_rsgnet() if args.tiny else rsgnet_w32_256x192()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32))
    infer = make_inference_fn(cfg, model, normalize_input=True)

    def serve_fn(images, centers, scales):
        return infer(variables, images, centers, scales)

    image_shape = (h, w, 3)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    engine = ServingEngine(serve_fn, buckets=buckets,
                           image_shape=image_shape, image_dtype=np.uint8)
    print(f"compiling {len(engine.buckets)} buckets "
          f"({cfg.MODEL.NAME} @ {w}x{h}, backend "
          f"{jax.devices()[0].platform})...")
    engine.warmup()
    cost = dict(engine.bucket_cost)
    print("measured bucket costs (ms):",
          {b: round(v * 1e3, 1) for b, v in cost.items()})

    def level(c, label=""):
        batcher = DynamicBatcher(engine, max_wait_ms=args.max_wait_ms,
                                 in_flight=args.in_flight,
                                 max_queued=args.max_queued or None)
        r = run_level(batcher, image_shape, c, args.seconds,
                      timeout_s=args.timeout_s)
        batcher.close()
        st = batcher.stats()
        print(f"{r['clients']:>8} {r['goodput_rps']:>10.1f} "
              f"{r['p50_ms']:>8.1f} {r['p95_ms']:>8.1f} "
              f"{st['mean_batch_fill']:>6.1f} {st['batches']:>8} "
              f"{r['shed']:>6} {r['expired']:>7}  {label}",
              flush=True)

    print(f"{'clients':>8} {'goodput':>10} {'p50 ms':>8} {'p95 ms':>8} "
          f"{'fill':>6} {'batches':>8} {'shed':>6} {'expired':>7}")
    for c in (int(x) for x in args.clients.split(",")):
        if args.ab_split:
            engine.bucket_cost = {}          # split disabled (old policy)
            level(c, "split=off")
            engine.bucket_cost = dict(cost)  # split by measured costs
            level(c, "split=on")
        else:
            level(c)


if __name__ == "__main__":
    main()
