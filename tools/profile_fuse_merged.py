"""A/B the MODEL.FUSE_MERGED knob on the real chip (interleaved protocol).

VERDICT round-3 item 2: the flagship W32 forward is per-op-overhead /
bandwidth bound (~15-17 eff TFLOP/s vs res50's 57 on the same protocol), so
dispatch-count reduction is the structural lever. FUSE_MERGED merges each
HighResolutionModule's exchange-fusion edges into fewer, wider convs
(models/hrnet.py::_merged_fusion). This tool measures, interleaved
round-robin (off, on, off, on, ... — the honest within-session comparison
per BENCH_NOTES remote-timing rules):

- conv-op count in the lowered HLO (the static dispatch diagnostic);
- W32 forward-only at B=128 (the headline eval path's compute);
- W48@384x288 forward-only at B=64 (the heavy config);
- W32 FULL train step at B=128 (aug 640^2 + fwd+bwd+update).

Run on the real TPU:  python tools/profile_fuse_merged.py
"""
from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import digest
from profile_s2d import ab, ab_step

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192, w48_384x288
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net


def conv_count(model, variables, x):
    """Static dispatch diagnostic: stablehlo convolution ops in the lowered
    (pre-XLA-fusion) forward program."""
    txt = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, x).as_text()
    return txt.count("stablehlo.convolution")


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--train-only", action="store_true")
    p.add_argument("--skip-w48", action="store_true")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    B = 128
    cfg = rsgnet_w32_256x192()
    cfg_on = copy.deepcopy(cfg)
    cfg_on.MODEL.FUSE_MERGED = True
    model = get_pose_net(cfg)
    model_on = get_pose_net(cfg_on)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]

    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x1 = jnp.zeros((1, h, w, 3), jnp.float32)
    print(f"W32 lowered conv ops: off {conv_count(model, variables, x1)}  "
          f"on {conv_count(model_on, variables, x1)}", flush=True)

    if not args.train_only:
        xs = [jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3))
                          .astype(np.float32)) for _ in range(3)]
        fwd_off = jax.jit(lambda v, x: digest(model.apply(v, x,
                                                          train=False)))
        fwd_on = jax.jit(lambda v, x: digest(model_on.apply(v, x,
                                                            train=False)))
        ab(f"W32 forward B={B}", fwd_off, fwd_on,
           [(variables, x) for x in xs], B)

        if not args.skip_w48:
            B48 = 64
            c48 = w48_384x288()
            c48_on = copy.deepcopy(c48)
            c48_on.MODEL.FUSE_MERGED = True
            m48 = get_pose_net(c48)
            m48_on = get_pose_net(c48_on)
            h48, w48 = c48.MODEL.IMAGE_SIZE[1], c48.MODEL.IMAGE_SIZE[0]
            s48 = create_train_state(c48, m48, jax.random.PRNGKey(0))
            v48 = {"params": s48.params, "batch_stats": s48.batch_stats}
            xs48 = [jnp.asarray(rng.uniform(-2, 2, (B48, h48, w48, 3))
                                .astype(np.float32)) for _ in range(2)]
            f48_off = jax.jit(lambda v, x: digest(m48.apply(v, x,
                                                            train=False)))
            f48_on = jax.jit(lambda v, x: digest(m48_on.apply(v, x,
                                                              train=False)))
            ab(f"W48@384 forward B={B48}", f48_off, f48_on,
               [(v48, x) for x in xs48], B48)

    # --- W32 FULL train step at B=128 ---------------------------------------
    spec = get_spec("coco")
    step_off = jax.jit(make_train_step(cfg, model, spec, jit=False),
                      donate_argnums=(0,))
    step_on = jax.jit(make_train_step(cfg_on, model_on, spec, jit=False),
                      donate_argnums=(0,))
    imgs = [jnp.asarray(rng.randint(0, 255, (B, 640, 640, 3), np.uint8))
            for _ in range(2)]
    joints = jnp.asarray(rng.uniform(150, 450, (B, 17, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(B, 17)) > 0.2).astype(np.float32))
    centers = jnp.asarray(rng.uniform(200, 400, (B, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, B) * 0.75,
                                   rng.uniform(0.8, 1.5, B)],
                                  -1).astype(np.float32))
    key = jax.random.PRNGKey(0)
    batches = [({"image": x, "joints": joints, "joints_vis": vis,
                 "center": centers, "scale": scales}, key) for x in imgs]
    ab_step(f"W32 FULL train step B={B}", (step_off, step_on),
            (lambda: create_train_state(cfg, model, jax.random.PRNGKey(1)),
             lambda: create_train_state(cfg_on, model_on,
                                        jax.random.PRNGKey(1))),
            batches, B)


if __name__ == "__main__":
    main()
