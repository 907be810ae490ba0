"""Multi-seed shear-vs-gather training A/B (VERDICT round-3 item 3).

The TRAIN.WARP="shear" default's safety claim rested on ONE paired run
(PCK 0.394 shear vs 0.285 gather, seed 0). This tool runs N paired seeds
of the exact test_shear_gather_ab workload (same trainer, same aug, same
clean eval set) and reports per-seed deltas plus mean +- spread, so the
non-inferiority tolerance is derived from measured seed noise instead of
a single anecdote.

CPU-backend by design: the claim is about LEARNING OUTCOME (which warp
filtering the model trains under), not device speed — it must match the
test calibration environment.

Run:  python tools/profile_shear_ab_seeds.py [--seeds 3] [--steps 240]
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import _init_paths  # noqa: F401,E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--steps", type=int, default=240)
    args = p.parse_args()

    # reuse the EXACT test workload — a diverging reimplementation here
    # would measure a different claim than the test asserts
    from test_shear_gather_ab import _pck, _train
    from test_rsg_efficacy import render_crowd

    te_imgs, te_tj, _ = render_crowd(np.random.RandomState(777), 64)
    deltas, rows = [], []
    for seed in range(args.seeds):
        t0 = time.time()
        _, m_s, s_s = _train("shear", seed=seed, steps=args.steps)
        _, m_g, s_g = _train("gather", seed=seed, steps=args.steps)
        pck_s = _pck(m_s, s_s, te_imgs, te_tj)
        pck_g = _pck(m_g, s_g, te_imgs, te_tj)
        deltas.append(pck_s - pck_g)
        rows.append((seed, pck_s, pck_g))
        print(f"seed {seed}: shear {pck_s:.3f}  gather {pck_g:.3f}  "
              f"delta {pck_s - pck_g:+.3f}   ({time.time() - t0:.0f}s)",
              flush=True)
    mean = statistics.mean(deltas)
    spread = statistics.stdev(deltas) if len(deltas) > 1 else 0.0
    print(f"\nshear - gather PCK@8px over {len(deltas)} paired seeds: "
          f"mean {mean:+.3f}  stdev {spread:.3f}  "
          f"min {min(deltas):+.3f}  max {max(deltas):+.3f}")
    print("suggested one-sided non-inferiority tolerance "
          f"(mean - 2*stdev floor, 0.02 min): "
          f"{max(0.02, -(mean - 2 * spread)):.3f}")


if __name__ == "__main__":
    main()
