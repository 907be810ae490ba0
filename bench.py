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

``vs_baseline`` ALWAYS normalizes by an estimate of the reference stack's
A100 throughput for the SAME protocol (uniform semantics across every line —
VERDICT round-2 item 4). No published figure exists (BASELINE.md:23 — the
reference repo publishes no speed numbers and the mount is empty), so the
denominators are estimates, documented here and held FIXED across rounds so
the series is comparable:

- eval paths: PyTorch fp32 DataParallel validate loop (flip-test on,
  batch 32/GPU) for HRNet-W32 @ 256x192 on one A100 ~= 800 images/sec.
- train path: PyTorch fp32 train step (fwd+bwd+SGD-class update, batch
  32/GPU, cuDNN benchmark, host cv2 aug pipelined by DataLoader workers)
  for the same model ~= 400 images/sec on one A100 — eval does 2 forwards
  (flip-test) where train does ~1 fwd + ~2x-cost bwd + update, so the
  train ceiling is roughly half the eval ceiling; the host-aug bound of
  the reference loader keeps it at or below that.

The driver target is >=2x A100, i.e. vs_baseline >= 2.0 on every line.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REF_IMAGES_PER_SEC = 800.0   # estimated reference A100 eval throughput
A100_REF_TRAIN_IMAGES_PER_SEC = 400.0   # estimated A100 train throughput
BATCH = 128
DISTINCT = 8
ITERS = 30


def bench_e2e(cfg, model, variables,
              metric="coco_val_e2e_eval_images_per_sec_per_chip",
              b=128):
    """True end-to-end eval throughput: 640^2 uint8 sources, fused device
    warp -> forward -> flip-test -> decode. Small (coords) outputs, so
    materializing them is an honest fence.

    B=128: like the train step, this path is per-op-overhead-bound and
    batch amortizes it (B=64: 900-972, B=128: 1857, B=256: 1791 img/s
    measured round 2)."""
    from rsgnet_tpu.core.inference import make_e2e_fn

    src, iters = 640, 12
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
        "metric": metric,
        "value": round(ips, 2),
        "unit": "images/sec/chip (640^2 src device-warp + flip-test + decode)",
        "vs_baseline": round(ips / A100_REF_IMAGES_PER_SEC, 3),
    }))


def bench_res50(variables_rng=0):
    """Second model family (SimpleBaseline res50 @ 256x192) on the same
    e2e protocol — the repo's highest-MXU-utilization model (57 eff
    TFLOP/s, BENCH_NOTES round 3). B=192 is its sweep optimum.

    vs_baseline uses the SAME 800 img/s A100 denominator as the W32 lines:
    res50@256x192 is the reference family's lighter/faster member (~5.4 vs
    ~7.1 GFLOP/fwd), so a single fixed eval denominator keeps the series
    comparable rather than inventing a per-model estimate."""
    from rsgnet_tpu.config.defaults import res50_256x192
    from rsgnet_tpu.models import get_pose_net

    cfg = res50_256x192()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(variables_rng),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    bench_e2e(cfg, model, variables,
              metric="res50_e2e_eval_images_per_sec_per_chip", b=192)


def bench_e2e_full(cfg, model, variables):
    """The WHOLE BASELINE config-2 contract in one device program: 640^2
    uint8 sources -> device warp -> forward -> flip-test -> decode ->
    rescoring (mean kpt score above IN_VIS_THRE x box score) -> per-image
    greedy OKS-NMS — nothing left on the host but the final gather
    (VERDICT round-2 item 3: the e2e number must include suppression)."""
    from rsgnet_tpu.core.inference import make_e2e_fn
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.ops.nms import oks_nms_jax

    b, src, iters, per_img = 128, 640, 12, 16
    spec = get_spec("coco")
    sigmas = jnp.asarray(spec.sigmas, jnp.float32)
    rng = np.random.RandomState(5)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(4)]
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    box_scores = jnp.asarray(rng.uniform(0.3, 1.0, b).astype(np.float32))
    e2e = make_e2e_fn(cfg, model, (src, src), jit=False)
    ivt = jnp.float32(cfg.TEST.IN_VIS_THRE)
    thre = jnp.float32(cfg.TEST.OKS_THRE)

    def full(variables, raw, c, s, bscore):
        preds, maxvals = e2e(variables, raw, c, s)
        ks = maxvals[..., 0]
        valid = ks > ivt
        cnt = jnp.maximum(valid.sum(-1), 1)
        kpt_score = jnp.where(valid.any(-1),
                              (ks * valid).sum(-1) / cnt, 0.0)
        scores = kpt_score * bscore
        kpts = jnp.concatenate([preds, maxvals], -1)     # (B, K, 3)
        areas = jnp.prod(s * 200.0, axis=-1)
        keep = jax.vmap(lambda kp, sc, ar: oks_nms_jax(
            kp, sc, ar, sigmas, thre))(
                kpts.reshape(-1, per_img, kpts.shape[1], 3),
                scores.reshape(-1, per_img), areas.reshape(-1, per_img))
        # pack scores+keep into ONE aux leaf: on the tunneled backend each
        # materialized output leaf costs a ~30 ms D2H round trip, so a
        # 3-leaf return would bill this path one extra RTT per iteration
        # (~0.23 ms/img of pure measurement artifact vs bench_e2e's 2 leaves)
        aux = jnp.stack([scores, keep.reshape(-1).astype(jnp.float32)], -1)
        return preds, aux

    full = jax.jit(full)
    outs = [full(variables, imgs[i % 4], centers, scales, box_scores)
            for i in range(2)]
    jax.tree_util.tree_map(np.asarray, outs)
    t0 = time.perf_counter()
    outs = [full(variables, imgs[i % 4], centers, scales, box_scores)
            for i in range(iters)]
    sink = jax.tree_util.tree_map(np.asarray, outs)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(p).all() and np.isfinite(a).all()
               for p, a in sink)
    ips = b * iters / dt
    print(json.dumps({
        "metric": "coco_val_e2e_full_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip (640^2 src device-warp + flip-test + "
                "decode + rescore + OKS-NMS on device)",
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
    fp32 gather intermediates that OOM'd round 1. Round 3: the default
    TRAIN.WARP="auto" resolves to the fused Pallas warp on the real chip
    (measured 1002.5 img/s @B=128 vs 806.0 on the XLA shear path —
    BENCH_NOTES "fused Pallas shear warp")."""
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
        "unit": "images/sec/chip (B=128: device aug 640^2 + fwd+bwd+update; "
                "vs est. 400 img/s A100 fp32 train)",
        "vs_baseline": round(ips / A100_REF_TRAIN_IMAGES_PER_SEC, 3),
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
    try:
        bench_e2e_full(cfg, model, variables)
    except Exception as e:
        print(json.dumps({"metric": "coco_val_e2e_full_images_per_sec_per_chip",
                          "value": None, "unit": f"skipped: {e!r}",
                          "vs_baseline": None}))
    try:
        bench_res50()
    except Exception as e:
        print(json.dumps({"metric": "res50_e2e_eval_images_per_sec_per_chip",
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
