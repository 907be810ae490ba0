"""A/B: eval-time BN folding on the flagship headline protocol (real TPU).

VERDICT round-4 item 7. Protocol = bench.py's headline section (pre-staged
crops -> forward -> flip-test -> decode, pipelined, every output
materialized), interleaved A/B rounds so tunnel drift hits both arms:
the SAME jitted program is timed with unfolded vs folded variables
(models/fold_bn.py — variable surgery, no retrace).

Result: recorded in BENCH_NOTES round 5 ("eval-time BN folding A/B");
the TEST.FOLD_BN default follows the measurement.

Usage: python tools/profile_fold_bn.py [--batch 128] [--iters 20]
       [--rounds 3] [--e2e]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
from rsgnet_tpu.models import get_pose_net, init_variables
from rsgnet_tpu.models.fold_bn import count_convbn, fold_bn_variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--e2e", action="store_true",
                    help="use the e2e protocol (device warp included)")
    args = ap.parse_args()

    import os
    from rsgnet_tpu.utils.compile_cache import wire
    wire(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_compile_cache"))

    cfg = rsgnet_w32_256x192()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32))
    host_vars = jax.device_get(variables)
    folded = fold_bn_variables(host_vars)
    print(f"folded {count_convbn(host_vars)} ConvBN pairs")

    b = args.batch
    rng = np.random.RandomState(0)
    if args.e2e:
        from rsgnet_tpu.core.inference import make_e2e_fn
        src = 640
        xs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
              for _ in range(2)]
        fn = make_e2e_fn(cfg, model, (src, src))
    else:
        from rsgnet_tpu.core.inference import make_inference_fn
        xs = [jnp.asarray(rng.uniform(-2, 2, (b, h, w, 3))
                          .astype(np.float32)) for _ in range(2)]
        fn = make_inference_fn(cfg, model)
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))

    arms = {"plain": jax.device_put(host_vars),
            "folded": jax.device_put(folded)}
    # parity on chip first (the exactness claim, at the real dtype)
    outs = {}
    for name, v in arms.items():
        p, m = fn(v, xs[0], centers, scales)
        outs[name] = (np.asarray(p), np.asarray(m))
    d = np.abs(outs["plain"][0] - outs["folded"][0]).max()
    print(f"on-chip coordinate |delta| max = {d:.4f} px (bf16 conv path)")

    results = {k: [] for k in arms}
    for r in range(args.rounds):
        for name, v in arms.items():
            fn(v, xs[0], centers, scales)          # settle
            t0 = time.perf_counter()
            out = [fn(v, xs[i % 2], centers, scales)
                   for i in range(args.iters)]
            sink = [(np.asarray(p), np.asarray(m)) for p, m in out]
            dt = time.perf_counter() - t0
            assert all(np.isfinite(p).all() for p, _ in sink)
            ips = b * args.iters / dt
            results[name].append(ips)
            print(f"round {r} {name:>6}: {ips:8.1f} img/s")
    for name, vals in results.items():
        print(f"{name:>6}: best {max(vals):8.1f}  median "
              f"{sorted(vals)[len(vals) // 2]:8.1f} img/s")
    ratio = max(results["folded"]) / max(results["plain"])
    print(f"folded/plain (best-of-{args.rounds}): {ratio:.3f}x")


if __name__ == "__main__":
    main()
