"""Batch-scaling sweep for BASELINE configs 3-4 (VERDICT round-2 item 5).

The W32 flagship got a full sweep in round 2 (optimum B=128); this tool
gives W48@384x288(DARK) and CrowdPose-RSG-W32 the same treatment: e2e eval
(device warp + flip-test + decode) and FULL train step at several batch
sizes, with effective TFLOP/s and the vs-2x-A100 target ratio per config.

Per-config A100 reference estimates (FLOPs-scaled from the 800 img/s W32
eval / 400 img/s train estimates documented in bench.py — HRNet paper
GFLOPs: W32@256x192 = 7.1, W48@384x288 = 32.9):
  - W48@384 DARK eval:   800 * 7.1/32.9 = 172.6 img/s  (2x target 345)
  - W48@384 train:       400 * 7.1/32.9 =  86.3 img/s  (2x target 173)
  - CrowdPose W32 eval:  800 img/s (same backbone+input; graph head ~2%)
  - CrowdPose W32 train: 400 img/s

Run on the real TPU:  python tools/profile_config_sweep.py [--config w48]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import timeit_pipelined_step

W32_GFLOPS, W48_GFLOPS = 7.1, 32.9
RES50_GFLOPS = 8.9      # SimpleBaseline ResNet-50 @256x192 (HRNet paper T.4)
W32_384_GFLOPS = 16.0   # HRNet-W32 @384x288 (HRNet paper Table 5)
W48_256_GFLOPS = 14.6   # HRNet-W48 @256x192 (HRNet paper Table 4)


def e2e_throughput(cfg, model, variables, b, src=640, iters=10):
    from rsgnet_tpu.core.inference import make_e2e_fn
    rng = np.random.RandomState(1)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(3)]
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    e2e = make_e2e_fn(cfg, model, (src, src))
    outs = [e2e(variables, imgs[i % 3], centers, scales) for i in range(2)]
    jax.tree_util.tree_map(np.asarray, outs)
    t0 = time.perf_counter()
    outs = [e2e(variables, imgs[i % 3], centers, scales)
            for i in range(iters)]
    sink = jax.tree_util.tree_map(np.asarray, outs)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(p).all() for p, _ in sink)
    return b * iters / dt


def train_throughput(cfg, model, b, src=640, iters=8):
    from rsgnet_tpu.core.train import create_train_state, make_train_step
    from rsgnet_tpu.data.skeletons import get_spec
    k = cfg.MODEL.NUM_JOINTS
    rng = np.random.RandomState(2)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(3)]
    joints = jnp.asarray(rng.uniform(150, 450, (b, k, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(b, k)) > 0.2).astype(np.float32))
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    batches = [{"image": x, "joints": joints, "joints_vis": vis,
                "center": centers, "scale": scales} for x in imgs]
    key = jax.random.PRNGKey(0)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, get_spec(cfg.DATASET.DATASET))
    dt = timeit_pipelined_step(f"train B={b}", step, state,
                               [(bt, key) for bt in batches], iters=iters,
                               batch=b)
    return b / dt


def sweep(name, cfg, gflops, a100_eval, a100_train, batches):
    from rsgnet_tpu.models import get_pose_net, init_variables
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32))
    print(f"\n=== {name} ({h}x{w} HxW, {gflops} GFLOPs/fwd) ===")
    print(f"targets (2x A100 est.): eval {2 * a100_eval:.0f} img/s, "
          f"train {2 * a100_train:.0f} img/s")
    for b in batches:
        try:
            ips = e2e_throughput(cfg, model, variables, b)
            tf = ips * gflops * 2 / 1e3          # flip-test: 2 forwards
            print(f"  e2e   B={b:3d}: {ips:7.1f} img/s  "
                  f"({tf:5.1f} eff TFLOP/s)  vs-target "
                  f"{ips / (2 * a100_eval):4.2f}x")
        except Exception as e:
            print(f"  e2e   B={b:3d}: failed: {type(e).__name__}: "
                  f"{str(e)[:120]}")
    for b in batches:
        try:
            ips = train_throughput(cfg, model, b)
            tf = ips * gflops * 3 / 1e3          # fwd + ~2x bwd
            print(f"  train B={b:3d}: {ips:7.1f} img/s  "
                  f"({tf:5.1f} eff TFLOP/s)  vs-target "
                  f"{ips / (2 * a100_train):4.2f}x")
        except Exception as e:
            print(f"  train B={b:3d}: failed: {type(e).__name__}: "
                  f"{str(e)[:120]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    choices=["w48", "crowdpose", "res50", "w32_384",
                             "w48_256", "all"],
                    default="all")
    ap.add_argument("--batches", type=int, nargs="+", default=None)
    args = ap.parse_args()

    from rsgnet_tpu.config.defaults import (crowdpose_rsgnet_w32,
                                            res50_256x192, w48_384x288)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    if args.config in ("w48", "all"):
        cfg = w48_384x288()
        cfg.TEST.DECODE = "dark"
        sweep("W48@384x288 DARK (config 3)", cfg, W48_GFLOPS,
              800 * W32_GFLOPS / W48_GFLOPS, 400 * W32_GFLOPS / W48_GFLOPS,
              args.batches or [32, 64, 96])
    if args.config in ("crowdpose", "all"):
        cfg = crowdpose_rsgnet_w32()
        sweep("CrowdPose RSG-W32 (config 4)", cfg, W32_GFLOPS, 800.0, 400.0,
              args.batches or [32, 64, 128, 192])
    if args.config in ("res50", "all"):
        sweep("SimpleBaseline res50@256x192", res50_256x192(), RES50_GFLOPS,
              800 * W32_GFLOPS / RES50_GFLOPS,
              400 * W32_GFLOPS / RES50_GFLOPS,
              args.batches or [64, 128, 192])
    # the round-3 YAML-grid completions (no defaults.py constructor — load
    # the experiment files the reference user would)
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from rsgnet_tpu.config.defaults import load_config
    if args.config in ("w32_384",):
        cfg = load_config(os.path.join(
            root, "experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml"))
        sweep("HRNet-W32@384x288", cfg, W32_384_GFLOPS,
              800 * W32_GFLOPS / W32_384_GFLOPS,
              400 * W32_GFLOPS / W32_384_GFLOPS,
              args.batches or [64, 128])
    if args.config in ("w48_256",):
        cfg = load_config(os.path.join(
            root, "experiments/coco/hrnet/w48_256x192_adam_lr1e-3.yaml"))
        sweep("HRNet-W48@256x192", cfg, W48_256_GFLOPS,
              800 * W32_GFLOPS / W48_256_GFLOPS,
              400 * W32_GFLOPS / W48_256_GFLOPS,
              args.batches or [64, 128])


if __name__ == "__main__":
    main()
