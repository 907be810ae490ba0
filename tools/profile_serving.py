"""Serving latency/throughput profile: batch-1..N on the real chip.

The reference has no serving story (SURVEY.md §1 "no serving stack"); this
rebuild ships one (utils/export.py StableHLO artifacts + make_inference_fn).
Production serving cares about a different pair of numbers than the batch
benchmarks: per-REQUEST round-trip latency at small batch, and the
latency/throughput knee as batch grows. This tool measures, per batch size:

  - rtt_p50/p95: submit one request, materialize the decoded keypoints
    (the actual serving response, ~B*K*12 bytes D2H), wall time per call.
    On the tunneled axon backend this includes a ~30 ms tunnel round trip
    that direct-attached hardware would not pay; the tool measures that
    floor separately (a null kernel's materialize time) and reports
    compute-attributable latency = rtt - floor as well.
  - pipelined img/s: depth-4 in-flight requests, scalar-digest protocol
    (tools/_profiling.py) — steady-state throughput a server with
    concurrent requests achieves.

Paths profiled: the host-crop serving path (make_inference_fn: normalized
crops -> heatmaps -> flip-test -> decode -> image coords) and, with
--e2e, the detector-to-coordinates path (make_e2e_fn: raw padded frame +
boxes). --exported additionally round-trips through the StableHLO artifact
to show (de)serialized serving matches the live fn.

Run on the real TPU:  python tools/profile_serving.py [--config w32]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import digest


def measure_rtt_floor(iters=30):
    """Materialize a trivial scalar repeatedly: the tunnel/dispatch floor."""
    one = jnp.float32(1.0)
    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(one))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(one))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_request_latency(fn, arg_sets, iters=20):
    """Full request round trip: dispatch + compute + response D2H."""
    out = fn(*arg_sets[0])
    jax.tree_util.tree_map(np.asarray, out)          # compile + settle
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*arg_sets[i % len(arg_sets)])
        sink = jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    leaves = jax.tree_util.tree_leaves(sink)
    assert all(np.isfinite(x).all() for x in leaves)
    ts = np.sort(np.asarray(ts))
    return float(ts[len(ts) // 2]), float(ts[int(len(ts) * 0.95)])


def measure_pipelined(fn, arg_sets, iters=20):
    """Steady-state throughput, depth-limited in-flight scalar digests."""
    def digested(*a):
        return digest(fn(*a))
    s = [digested(*arg_sets[i % len(arg_sets)]) for i in range(2)]
    [np.asarray(x) for x in s]
    t0 = time.perf_counter()
    outs = [digested(*arg_sets[i % len(arg_sets)]) for i in range(iters)]
    sink = [np.asarray(x) for x in outs]
    dt = (time.perf_counter() - t0) / iters
    assert all(np.isfinite(x) for x in sink)
    return dt


def build_crop_requests(cfg, b, n_sets=3, seed=0):
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    rng = np.random.RandomState(seed)
    sets = []
    for _ in range(n_sets):
        imgs = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
        c = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
        s = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                  rng.uniform(0.8, 1.5, b)],
                                 -1).astype(np.float32))
        sets.append((imgs, c, s))
    return sets


def build_e2e_requests(cfg, b, src=640, n_sets=3, seed=0):
    rng = np.random.RandomState(seed)
    sets = []
    for _ in range(n_sets):
        imgs = jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
        c = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
        s = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                  rng.uniform(0.8, 1.5, b)],
                                 -1).astype(np.float32))
        sets.append((imgs, c, s))
    return sets


def profile_path(name, fn, build, cfg, batches, floor_ms):
    print(f"\n--- {name} ---")
    print(f"{'B':>4s} {'rtt p50':>9s} {'rtt p95':>9s} {'-floor':>8s} "
          f"{'lat img/s':>10s} {'pipe ms':>9s} {'pipe img/s':>10s}")
    for b in batches:
        sets = build(cfg, b)
        p50, p95 = measure_request_latency(fn, sets)
        dt = measure_pipelined(fn, sets)
        print(f"{b:4d} {p50 * 1e3:7.1f}ms {p95 * 1e3:7.1f}ms "
              f"{(p50 * 1e3 - floor_ms):6.1f}ms "
              f"{b / p50:10.1f} {dt * 1e3:7.1f}ms {b / dt:10.1f}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["w32", "res50", "tiny"],
                    default="w32")
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64])
    ap.add_argument("--e2e", action="store_true",
                    help="also profile the raw-frame detector-to-coords path")
    ap.add_argument("--exported", action="store_true",
                    help="also profile the StableHLO artifact round trip")
    args = ap.parse_args()

    from rsgnet_tpu.config.defaults import (res50_256x192, rsgnet_w32_256x192,
                                            tiny_rsgnet)
    from rsgnet_tpu.core.inference import make_inference_fn
    from rsgnet_tpu.models import get_pose_net, init_variables

    cfg = {"w32": rsgnet_w32_256x192, "res50": res50_256x192,
           "tiny": tiny_rsgnet}[args.config]()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    floor = measure_rtt_floor()
    print(f"null-kernel materialize floor: {floor * 1e3:.1f} ms "
          f"(tunnel/dispatch overhead a direct-attached chip avoids)")

    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32))

    infer = make_inference_fn(cfg, model)
    profile_path(f"{args.config} serving (crops -> coords, flip-test "
                 f"{'ON' if cfg.TEST.FLIP_TEST else 'OFF'})",
                 lambda i, c, s: infer(variables, i, c, s),
                 build_crop_requests, cfg, args.batches, floor * 1e3)

    if args.e2e:
        from rsgnet_tpu.core.inference import make_e2e_fn
        e2e = make_e2e_fn(cfg, model, (640, 640))
        profile_path(f"{args.config} e2e (raw 640x640 frame + boxes)",
                     lambda i, c, s: e2e(variables, i, c, s),
                     build_e2e_requests, cfg, args.batches, floor * 1e3)

    if args.exported:
        from rsgnet_tpu.utils.export import export_inference, load_exported
        served = load_exported(export_inference(cfg, model, variables))
        profile_path(f"{args.config} serving via StableHLO artifact",
                     lambda i, c, s: served(i, c, s),
                     build_crop_requests, cfg, args.batches, floor * 1e3)


if __name__ == "__main__":
    main()
