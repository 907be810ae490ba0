"""On-chip A/B of TEST.WARP samplers on the FULL e2e eval path (real TPU).

Motivation: the round-2 dissection measured the separable eval warp at
31.5 ms @B=64 — the same multi-stage-latency-floor profile the fused Pallas
kernel removed from the TRAIN path (+24% full step, BENCH_NOTES round-3
"fused Pallas shear warp"). This tool measures whether the fused kernel
also wins the EVAL crop inside the whole e2e program (warp -> forward ->
flip-test -> decode), same-session, interleaved A/B/A/B (tunnel variance
is +-15-35% across sessions; never compare across them).

Run on the real TPU:
  python tools/profile_eval_warp.py [--b 128] [--iters 12] [--rounds 2]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401


def e2e_ips(cfg, model, variables, b, src=640, iters=12):
    from rsgnet_tpu.core.inference import make_e2e_fn
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
    return b * iters / dt, outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved repeats per sampler")
    ap.add_argument("--warps", nargs="+",
                    default=["separable", "pallas", "shear"])
    args = ap.parse_args()

    from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
    from rsgnet_tpu.models import get_pose_net, init_variables

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    base = rsgnet_w32_256x192()
    h, w = base.MODEL.IMAGE_SIZE[1], base.MODEL.IMAGE_SIZE[0]
    model = get_pose_net(base)
    variables = init_variables(model, jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32))

    for r in range(args.rounds):
        for warp in args.warps:
            cfg = rsgnet_w32_256x192()
            cfg.TEST.WARP = warp
            ips, outs = e2e_ips(cfg, model, variables, args.b,
                                iters=args.iters)
            print(f"e2e B={args.b} warp={warp:9s} round {r}: "
                  f"{ips:7.1f} img/s")

    # Correctness check at the CROP level (normalized model inputs).
    # Do NOT compare decoded preds across samplers with a random-init
    # model: its heatmaps are near-flat noise, so ~1e-4-scale input
    # differences flip global argmaxes anywhere in the map — measured
    # 52% pred disagreement while the crops agreed to 2.3e-4 (2026-08-19).
    from rsgnet_tpu.ops.affine import get_affine_transform_jax
    from rsgnet_tpu.ops.warp import crop_and_normalize
    rng = np.random.RandomState(1)
    b, src = args.b, 640
    out = tuple(base.MODEL.IMAGE_SIZE)
    imgs = jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    trans = get_affine_transform_jax(centers, scales,
                                     jnp.zeros(b, jnp.float32), out)
    crops = {}
    for w in ["gather"] + list(args.warps):
        f = jax.jit(lambda i, t, w=w: crop_and_normalize(i, t, out, warp=w))
        crops[w] = np.asarray(f(imgs, trans))
    for w in args.warps:
        d = float(np.abs(crops[w] - crops["gather"]).max())
        print(f"max |{w}-gather| crop diff (normalized units): {d:.6f}")
    print("DONE")


if __name__ == "__main__":
    main()
