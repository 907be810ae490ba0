"""Per-config HBM footprint from XLA's compiled memory analysis.

Production sizing info the runtime can't lie about: for each BASELINE
config (at its measured sweep-optimum batch) this compiles the exact eval
and train programs `bench.py`/`fit()` run and prints XLA's
``CompiledMemoryStats`` — argument (weights+batch), temp (activations /
workspace), output, and peak HBM. Compile-time numbers, so they are exact
upper bounds the scheduler reserves, not samples of a poll
(``device.memory_stats()`` is unavailable over the axon tunnel — returns
None — which is why this goes through ``lower().compile()``).

Run on the real TPU:  python tools/profile_memory.py [--config w32 ...]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

GB = 1024 ** 3


def _fmt(b):
    return f"{b / GB:6.2f} GB" if b >= GB / 100 else f"{b / 2**20:6.1f} MB"


def eval_memory(cfg, model, b, src=640):
    from rsgnet_tpu.core.inference import make_e2e_fn
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3), jnp.float32),
                             train=False), jax.random.PRNGKey(0))
    e2e = make_e2e_fn(cfg, model, (src, src), jit=False)
    lowered = jax.jit(e2e).lower(
        variables,
        jax.ShapeDtypeStruct((b, src, src, 3), jnp.uint8),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32))
    return lowered.compile().memory_analysis()


def train_memory(cfg, model, b, src=640):
    from rsgnet_tpu.core.train import create_train_state, make_train_step
    from rsgnet_tpu.data.skeletons import get_spec
    k = cfg.MODEL.NUM_JOINTS
    state = jax.eval_shape(
        lambda key: create_train_state(cfg, model, key),
        jax.random.PRNGKey(0))
    batch = {
        "image": jax.ShapeDtypeStruct((b, src, src, 3), jnp.uint8),
        "joints": jax.ShapeDtypeStruct((b, k, 2), jnp.float32),
        "joints_vis": jax.ShapeDtypeStruct((b, k), jnp.float32),
        "center": jax.ShapeDtypeStruct((b, 2), jnp.float32),
        "scale": jax.ShapeDtypeStruct((b, 2), jnp.float32),
    }
    step = make_train_step(cfg, model, get_spec(cfg.DATASET.DATASET),
                           jit=False)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, jax.ShapeDtypeStruct((2,), jnp.uint32))
    return lowered.compile().memory_analysis()


def report(name, cfg, eval_b, train_b):
    from rsgnet_tpu.models import get_pose_net
    model = get_pose_net(cfg)
    for kind, fn, b in (("eval", eval_memory, eval_b),
                        ("train", train_memory, train_b)):
        try:
            ma = fn(cfg, model, b)
            print(f"{name:28s} {kind:5s} B={b:3d}  "
                  f"args {_fmt(ma.argument_size_in_bytes)}  "
                  f"temp {_fmt(ma.temp_size_in_bytes)}  "
                  f"out {_fmt(ma.output_size_in_bytes)}  "
                  f"peak {_fmt(ma.peak_memory_in_bytes)}")
        except Exception as e:
            print(f"{name:28s} {kind:5s} B={b:3d}  failed: "
                  f"{type(e).__name__}: {str(e)[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", nargs="+",
                    default=["w32", "w48", "crowdpose", "res50"])
    args = ap.parse_args()
    from rsgnet_tpu.config.defaults import (crowdpose_rsgnet_w32,
                                            res50_256x192,
                                            rsgnet_w32_256x192, w48_384x288)
    print(f"backend: {jax.default_backend()}  "
          f"device: {jax.devices()[0].device_kind}")
    if "w32" in args.config:
        report("RSG-W32 256x192 (cfg 2/5)", rsgnet_w32_256x192(), 128, 128)
    if "w48" in args.config:
        cfg = w48_384x288()
        cfg.TEST.DECODE = "dark"
        report("W48 384x288 DARK (cfg 3)", cfg, 128, 96)
    if "crowdpose" in args.config:
        report("CrowdPose RSG-W32 (cfg 4)", crowdpose_rsgnet_w32(), 128, 128)
    if "res50" in args.config:
        report("res50 256x192 (SimpleBL)", res50_256x192(), 192, 128)


if __name__ == "__main__":
    main()
