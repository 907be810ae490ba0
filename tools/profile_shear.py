"""Shear-warp vs gather-warp timing + honestly-pipelined full train step.

Two methodology fixes over tools/profile_paths.py's sequential step timing:
the train step is dispatched PIPELINED (state threads device-side; only the
final loss is materialized), matching how a real accelerator-attached host
drives training — the per-step scalar fetch in the old protocol added one
~30 ms tunnel RTT per step.

Run on the real TPU:  python tools/profile_shear.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import digest, timeit as _timeit, timeit_pipelined_step

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.augment import augment_batch
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.ops.shear_warp import shear_warp_batch
from rsgnet_tpu.ops.warp import affine_warp_batch

B = 64
SRC = 640
ITERS = 10


def timeit(name, fn, arg_sets, iters=ITERS):
    return _timeit(name, fn, arg_sets, iters=iters, batch=B)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = rsgnet_w32_256x192()
    spec = get_spec("coco")
    model = get_pose_net(cfg)
    out_size = tuple(cfg.MODEL.IMAGE_SIZE)

    rng = np.random.RandomState(0)
    n_sets = 3
    imgs = [jnp.asarray(rng.randint(0, 255, (B, SRC, SRC, 3), np.uint8))
            for _ in range(n_sets)]
    centers = jnp.asarray(rng.uniform(200, 400, (B, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, B) * 0.75,
                                   rng.uniform(0.8, 1.5, B)],
                                  -1).astype(np.float32))
    rots = jnp.asarray(rng.uniform(-60, 60, B).astype(np.float32))
    from rsgnet_tpu.ops.affine import get_affine_transform_jax
    t_rot = jax.jit(jax.vmap(lambda c, s, r: get_affine_transform_jax(
        c, s, r, out_size)))(centers, scales, rots)
    t_rot = jnp.asarray(np.asarray(t_rot))

    g = jax.jit(lambda im, t: digest(affine_warp_batch(im, t, out_size)))
    timeit("gather warp 640^2 (rot)", g, [(x, t_rot) for x in imgs])
    sh = jax.jit(lambda im, t: digest(shear_warp_batch(im, t, out_size)))
    timeit("shear warp 640^2 (rot)", sh, [(x, t_rot) for x in imgs])
    from rsgnet_tpu.ops.pallas.shear_warp import shear_warp_pallas
    pk = jax.jit(lambda im, t: digest(shear_warp_pallas(im, t, out_size)))
    timeit("pallas warp 640^2 (rot)", pk, [(x, t_rot) for x in imgs])

    joints = jnp.asarray(rng.uniform(150, 450, (B, 17, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(B, 17)) > 0.2).astype(np.float32))
    key = jax.random.PRNGKey(0)
    for warp in ("gather", "shear", "pallas"):
        cfg.TRAIN.WARP = warp
        aug = jax.jit(lambda k, im, j, v, c, s: digest(augment_batch(
            k, im, j, v, c, s, cfg, spec)))
        timeit(f"augment_batch full ({warp})", aug,
               [(key, x, joints, vis, centers, scales) for x in imgs])

    for warp in ("shear", "pallas", "gather"):
        cfg.TRAIN.WARP = warp
        state = create_train_state(cfg, model, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, spec)
        batches = [{"image": x, "joints": joints, "joints_vis": vis,
                    "center": centers, "scale": scales} for x in imgs]
        timeit_pipelined_step(f"train step FULL pipelined ({warp})", step,
                              state, [(b, key) for b in batches], batch=B)


if __name__ == "__main__":
    main()
