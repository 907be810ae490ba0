"""Round-3 train-step dissection at the B=128 optimum (VERDICT r2 item 5).

Questions this answers on the real TPU (pipelined digest protocol,
tools/_profiling.py):
 1. What does the shear warp cost at B=128, and how does it split between
    pass A (uint8 column resample) and pass B (fp32 row resample)?
 2. How much of pass B is the bit-decomposed roll alone (the suspected
    HBM-traffic bound)?
 3. What does the RSG head add to the CrowdPose train step (the one
    sub-2x cell in the config sweep)?

    python tools/profile_train_dissect.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import digest, timeit as _timeit, timeit_pipelined_step

from rsgnet_tpu.config.defaults import crowdpose_rsgnet_w32
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.ops.shear_warp import (_resample_pass, _roll_by_bits,
                                       shear_warp_batch)
from rsgnet_tpu.ops.warp import invert_affine

B = 128
SRC = 640
OUT_W, OUT_H = 192, 256


def timeit(name, fn, arg_sets, iters=10):
    return _timeit(name, fn, arg_sets, iters=iters, batch=B)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    imgs = [jnp.asarray(rng.randint(0, 255, (B, SRC, SRC, 3), np.uint8))
            for _ in range(3)]
    centers = jnp.asarray(rng.uniform(200, 400, (B, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, B) * 0.75,
                                   rng.uniform(0.8, 1.5, B)],
                                  -1).astype(np.float32))
    rots = jnp.asarray(rng.uniform(-60, 60, B).astype(np.float32))
    from rsgnet_tpu.ops.affine import get_affine_transform_jax
    trans = jax.jit(jax.vmap(lambda c, s, r: get_affine_transform_jax(
        c, s, r, (OUT_W, OUT_H))))(centers, scales, rots)
    trans = jnp.asarray(np.asarray(trans))

    # 1. full shear warp
    f = jax.jit(lambda im, t: digest(
        shear_warp_batch(im, t, (OUT_W, OUT_H))))
    timeit("shear warp full (A+B)", f, [(x, trans) for x in imgs])

    # 2. pass A only (uint8 source -> fp32 intermediate (B, S, out_w, C))
    inv = jax.jit(invert_affine)(jnp.asarray(trans, jnp.float32))
    inv = jnp.asarray(np.asarray(inv))
    m00, m01, m02 = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    m10, m11, m12 = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    a = m00 - m01 * m10 / m11
    bb = m01 / m11
    cc = m02 - m01 * m12 / m11
    xs = np.arange(OUT_W, dtype=np.float32)
    rs = np.arange(SRC, dtype=np.float32)
    ys = np.arange(OUT_H, dtype=np.float32)
    p_a = jnp.asarray(np.asarray(a)[:, None] * xs[None, :])
    s_a = jnp.asarray(np.asarray(bb)[:, None] * rs[None, :]
                      + np.asarray(cc)[:, None])
    p_b = jnp.asarray(np.asarray(m11)[:, None] * ys[None, :]
                      + np.asarray(m12)[:, None])
    s_b = jnp.asarray(np.asarray(m10)[:, None] * xs[None, :])

    fa = jax.jit(lambda im: digest(_resample_pass(im, p_a, s_a, axis=2,
                                                  out_n=OUT_W)))
    timeit("pass A only (u8 cols)", fa, [(x,) for x in imgs])

    inter = np.asarray(jax.jit(lambda im: _resample_pass(
        im, p_a, s_a, axis=2, out_n=OUT_W))(imgs[0]))
    inters = [jnp.asarray(inter + i) for i in range(3)]
    fb = jax.jit(lambda it: digest(_resample_pass(it, p_b, s_b, axis=1,
                                                  out_n=OUT_H)))
    timeit("pass B only (f32 rows)", fb, [(x,) for x in inters])

    # 3. pass B's roll alone (the suspected traffic bound)
    si = jnp.mod(jnp.floor(s_b).astype(jnp.int32), SRC)[:, None, :, None]
    fr = jax.jit(lambda it: digest(_roll_by_bits(it, si, axis=1, size=SRC)))
    timeit("pass B roll_by_bits only", fr, [(x,) for x in inters])
    # bf16 variant of the same roll (half the bytes)
    inters16 = [x.astype(jnp.bfloat16) for x in inters]
    fr16 = jax.jit(lambda it: digest(
        _roll_by_bits(it, si, axis=1, size=SRC).astype(jnp.float32)))
    timeit("pass B roll_by_bits bf16", fr16, [(x,) for x in inters16])

    # 4. RSG head cost in the CrowdPose train step
    spec = get_spec("crowdpose")
    k = 14
    joints = jnp.asarray(rng.uniform(150, 450, (B, k, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(B, k)) > 0.2).astype(np.float32))
    key = jax.random.PRNGKey(0)
    for enabled in (True, False):
        cfg = crowdpose_rsgnet_w32()
        if not enabled:
            cfg.MODEL.NAME = "pose_hrnet"
            cfg.MODEL.RSG.ENABLED = False
        model = get_pose_net(cfg)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, spec)
        batches = [{"image": x, "joints": joints, "joints_vis": vis,
                    "center": centers, "scale": scales} for x in imgs]
        timeit_pipelined_step(
            f"crowdpose train step (RSG={'on' if enabled else 'off'})",
            step, state, [(b, key) for b in batches], iters=8, batch=B)


if __name__ == "__main__":
    main()
