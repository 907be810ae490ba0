"""Benchmark harness — COCO val top-down inference images/sec/chip @ 256x192.

Measures the benchmark-critical path from SURVEY.md §3.2 / BASELINE.json:2 on
the flagship model (RSGNet-W32: HRNet backbone + relation/skeleton-graph
head): batched crops -> model forward -> flip-test average (FLIP_TEST=true,
the reference eval protocol) -> sub-pixel decode -> image-space coordinates,
all one jitted XLA program, bf16 conv compute.

Measurement protocol: distinct pre-staged device-resident batches, N
pipelined dispatches, then EVERY output materialized to host before the
clock stops — on asynchronous/tunneled backends, fencing only the last
result under-counts; materializing all outputs cannot.

Prints JSON lines; the LAST line is the headline metric the driver records
({"metric", "value", "unit", "vs_baseline"}). A preceding line reports the
true END-TO-END eval path (640^2 padded source -> device warp -> model ->
flip-test -> decode), which includes the preprocessing the headline excludes
(VERDICT round-1: report both; optimize the real one).

``vs_baseline`` normalizes by the reference stack's A100 throughput on the
same protocol. No published figure exists (BASELINE.md:23 — the reference
repo publishes no speed numbers and the mount is empty), so the denominator
is an estimate, documented here and held FIXED across rounds so the series
is comparable: PyTorch fp32 DataParallel validate loop (flip-test on,
batch 32/GPU) for HRNet-W32 @ 256x192 on one A100 ~= 800 images/sec.
The driver target is >=2x A100, i.e. vs_baseline >= 2.0.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REF_IMAGES_PER_SEC = 800.0   # estimated reference A100 eval throughput
BATCH = 128
DISTINCT = 8
ITERS = 30


def bench_e2e(cfg, model, variables):
    """True end-to-end eval throughput: 640^2 uint8 sources, fused device
    warp -> forward -> flip-test -> decode. Small (coords) outputs, so
    materializing them is an honest fence.

    B=128: like the train step, this path is per-op-overhead-bound and
    batch amortizes it (B=64: 900-972, B=128: 1857, B=256: 1791 img/s
    measured round 2)."""
    from rsgnet_tpu.core.inference import make_e2e_fn

    b, src, iters = 128, 640, 12
    rng = np.random.RandomState(1)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(4)]
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    e2e = make_e2e_fn(cfg, model, (src, src))
    outs = [e2e(variables, imgs[i % 4], centers, scales) for i in range(2)]
    jax.tree_util.tree_map(np.asarray, outs)
    t0 = time.perf_counter()
    outs = [e2e(variables, imgs[i % 4], centers, scales)
            for i in range(iters)]
    sink = jax.tree_util.tree_map(np.asarray, outs)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(p).all() for p, _ in sink)
    ips = b * iters / dt
    print(json.dumps({
        "metric": "coco_val_e2e_eval_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip (640^2 src device-warp + flip-test + decode)",
        "vs_baseline": round(ips / A100_REF_IMAGES_PER_SEC, 3),
    }))


def bench_train(cfg, model):
    """FULL train step (on-device shear-warp aug from 640^2 uint8 sources +
    fwd + bwd + fused optimizer update), pipelined: the state threads on
    device and ONE loss scalar is materialized at the end — matching how
    core/function.py's lazy metric fetch drives real training.

    B=128: the step is per-op-overhead-bound, so throughput rises with
    batch (B=64: 524-532, B=96: 684, B=128: 812 img/s measured round 2);
    128 fits comfortably since the uint8 roll-warp pipeline replaced the
    fp32 gather intermediates that OOM'd round 1."""
    from rsgnet_tpu.core.train import create_train_state, make_train_step
    from rsgnet_tpu.data.skeletons import get_spec

    b, src, iters = 128, 640, 10
    rng = np.random.RandomState(2)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(3)]
    joints = jnp.asarray(rng.uniform(150, 450, (b, 17, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(b, 17)) > 0.2).astype(np.float32))
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    batches = [{"image": x, "joints": joints, "joints_vis": vis,
                "center": centers, "scale": scales} for x in imgs]
    key = jax.random.PRNGKey(0)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, get_spec("coco"))
    # the ONE shared implementation of the pipelined scalar-fetch protocol
    # (tools/_profiling.py) — duplicating it here risks silent divergence
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from _profiling import timeit_pipelined_step
    dt = timeit_pipelined_step("train step (pipelined)", step, state,
                               [(bt, key) for bt in batches], iters=iters,
                               batch=b)
    ips = b / dt
    print(json.dumps({
        "metric": "train_step_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip (B=128: device aug 640^2 + fwd+bwd+update)",
        "vs_baseline": round(ips / 272.0, 3),     # round-1 train throughput
    }))


def main():
    from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
    from rsgnet_tpu.core.inference import make_inference_fn
    from rsgnet_tpu.models import get_pose_net

    cfg = rsgnet_w32_256x192()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.uniform(-2, 2, (BATCH, h, w, 3)).astype(np.float32))
          for _ in range(DISTINCT)]
    centers = jnp.tile(jnp.asarray([[320.0, 240.0]], jnp.float32), (BATCH, 1))
    scales = jnp.tile(jnp.asarray([[1.2, 1.6]], jnp.float32), (BATCH, 1))

    variables = model.init(jax.random.PRNGKey(0), xs[0][:1], train=False)
    # auxiliary metrics never break the headline line the driver records
    try:
        bench_train(cfg, model)
    except Exception as e:
        print(json.dumps({"metric": "train_step_images_per_sec_per_chip",
                          "value": None, "unit": f"skipped: {e!r}",
                          "vs_baseline": None}))
    try:
        bench_e2e(cfg, model, variables)
    except Exception as e:
        print(json.dumps({"metric": "coco_val_e2e_eval_images_per_sec_per_chip",
                          "value": None, "unit": f"skipped: {e!r}",
                          "vs_baseline": None}))
    infer = make_inference_fn(cfg, model)

    # warm (compile) + settle
    for i in range(2):
        preds, maxvals = infer(variables, xs[i], centers, scales)
    np.asarray(preds), np.asarray(maxvals)

    t0 = time.perf_counter()
    outs = [infer(variables, xs[i % DISTINCT], centers, scales)
            for i in range(ITERS)]
    # materialize every output — forces all compute, defeats async illusions
    sink = [(np.asarray(p), np.asarray(m)) for p, m in outs]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(p).all() for p, _ in sink)

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "coco_val_topdown_inference_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip (256x192, flip-test on, decode included)",
        "vs_baseline": round(ips / A100_REF_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
