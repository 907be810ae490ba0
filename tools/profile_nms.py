"""OKS-NMS A/B: C++ host greedy vs batched device kernel (VERDICT r2 item 3).

Decides the TEST.DEVICE_NMS default with a measurement instead of an
argument. Workload shaped like a real COCO val eval: N_IMAGES images with m
instances each (gt boxes average ~3.5/image; detector boxes up to ~20), poses
spread so suppression actually fires.

Protocol: the host path times the per-image C++ greedy loop exactly as
``evaluate()`` drives it (including the dict packing it does); the device
path times ``batched_oks_nms_jax`` end-to-end INCLUDING host->device
transfer of the padded arrays and the keep-mask fetch, excluding only the
one-off jit compile (amortized over a whole eval). Run on the real TPU:

    python tools/profile_nms.py
"""
from __future__ import annotations

import time

import numpy as np

import _init_paths  # noqa: F401

from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.ops.nms import batched_oks_nms_jax
from rsgnet_tpu.ops.nms_native import available, oks_nms_cpp

SIGMAS = get_spec("coco").sigmas
N_IMAGES = 2000


def make_groups(n_images, m, seed=0):
    rng = np.random.RandomState(seed)
    groups = []
    for _ in range(n_images):
        base = rng.uniform(100, 500, (max(m // 3, 1), 2))
        kpts = np.zeros((m, 17, 3), np.float32)
        for i in range(m):
            c = base[i % base.shape[0]] + rng.uniform(-20, 20, 2)
            kpts[i, :, :2] = c + rng.uniform(-60, 60, (17, 2))
            kpts[i, :, 2] = rng.uniform(0.1, 1.0, 17)
        scores = rng.uniform(0.05, 1.0, m).astype(np.float32)
        areas = rng.uniform(5e3, 5e4, m).astype(np.float32)
        groups.append((kpts, scores, areas))
    return groups


def to_dbs(groups):
    """The dict-of-instances form ``evaluate()`` actually holds."""
    dbs = []
    for kpts, scores, areas in groups:
        dbs.append([{"keypoints": kpts[i], "score": float(scores[i]),
                     "area": float(areas[i])} for i in range(len(scores))])
    return dbs


def _pack(dbs):
    """Per-image dict->array packing, as data/coco.py pays before the device
    call — INSIDE the timed region so the A/B is symmetric (both paths start
    from the dict form)."""
    kp = [np.stack([d["keypoints"] for d in db]) for db in dbs]
    sc = [np.asarray([d["score"] for d in db], np.float32) for db in dbs]
    ar = [np.asarray([d["area"] for d in db], np.float32) for db in dbs]
    return kp, sc, ar


def bench_host(dbs, thresh=0.9):
    t0 = time.perf_counter()
    keeps = [oks_nms_cpp(db, thresh, SIGMAS) for db in dbs]
    dt = time.perf_counter() - t0
    return dt, keeps


def bench_device(dbs, thresh=0.9):
    kp, sc, ar = _pack(dbs)
    batched_oks_nms_jax(kp, sc, ar, SIGMAS, thresh)        # compile
    t0 = time.perf_counter()
    kp, sc, ar = _pack(dbs)
    keeps = batched_oks_nms_jax(kp, sc, ar, SIGMAS, thresh)
    dt = time.perf_counter() - t0
    return dt, keeps


def main():
    import jax
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    assert available(), "C++ NMS library unavailable"
    for m in (4, 8, 20):
        dbs = to_dbs(make_groups(N_IMAGES, m, seed=m))
        dt_h, keeps_h = bench_host(dbs)
        dt_d, keeps_d = bench_device(dbs)
        agree = all(sorted(a) == sorted(b.tolist())
                    for a, b in zip(keeps_h, keeps_d))
        tot = N_IMAGES * m
        print(f"m={m:3d}  host C++ {dt_h * 1e3:8.1f} ms "
              f"({tot / dt_h / 1e3:7.1f}k inst/s)   "
              f"device {dt_d * 1e3:8.1f} ms ({tot / dt_d / 1e3:7.1f}k "
              f"inst/s)   device/host speedup {dt_h / dt_d:5.2f}x   "
              f"agree={agree}")


if __name__ == "__main__":
    main()
