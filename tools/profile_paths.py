"""Hot-path profiler: where does train/eval time actually go on the chip?

Methodology note (supersedes the first attempt): materializing full outputs
per-iter over the tunnel measures D2H bandwidth and per-leaf RTT, not
compute — a (64, 256, 192, 3) warp output is 38 MB (~1.5 s at tunnel rates)
and a TrainState has ~1200 leaves (~36 s of 30 ms RTTs). Honest protocol
here: reduce every output to ONE on-device scalar digest inside the jitted
function, pipeline the dispatches, then materialize only the scalars — the
device cannot produce the digest without completing the compute, and D2H is
4 bytes. The sequential train step threads its state and fetches the loss
scalar each iteration.

Run on the real TPU:  python tools/profile_paths.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import digest, timeit as _timeit

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.augment import augment_batch
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.ops.affine import get_affine_transform_jax
from rsgnet_tpu.ops.heatmap import generate_target_jax
from rsgnet_tpu.ops.warp import (affine_warp_batch, invert_affine,
                                 separable_warp_batch)

B = 64
SRC = 640
ITERS = 12


def timeit(name, fn, arg_sets, iters=ITERS):
    return _timeit(name, fn, arg_sets, iters=iters, batch=B)


def timeit_seq(name, step, state0, arg_sets, iters=6):
    """Sequential stateful step with a PER-STEP loss fetch — SUPERSEDED by
    _profiling.timeit_pipelined_step (one end fetch): each materialization
    adds one ~30 ms tunnel RTT, which inflated the round-1/round-2-early
    train-step numbers (BENCH_NOTES.md). Kept so the historical numbers in
    BENCH_NOTES remain reproducible."""
    state, metrics = step(state0, *arg_sets[0])
    np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, *arg_sets[i % len(arg_sets)])
        loss = np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    print(f"{name:44s} {dt * 1e3:8.1f} ms/iter   {B / dt:8.1f} img/s",
          flush=True)
    return dt


def compose_affine(t2, t1):
    """(t2 o t1) for 2x3 affines: apply t1 first."""
    a = t2[..., :, :2] @ t1[..., :, :2]
    b = (t2[..., :, :2] @ t1[..., :, 2:]) + t2[..., :, 2:]
    return jnp.concatenate([a, b], axis=-1)


def decomposed_warp(images, centers, scales, rots, out_size, inter=336):
    """separable axis-aligned crop to an intermediate square (MXU matmuls)
    then a pure-rotation bilinear gather on the small fp32 intermediate."""
    out_w, out_h = out_size
    si = jnp.stack([scales[:, 0] * inter / out_w,
                    scales[:, 1] * inter / out_h], -1)
    s_mat = jax.vmap(lambda c, s: get_affine_transform_jax(
        c, s, 0.0, (inter, inter)))(centers, si)
    t_mat = jax.vmap(lambda c, s, r: get_affine_transform_jax(
        c, s, r, out_size))(centers, scales, rots)
    inter_img = separable_warp_batch(images, s_mat, (inter, inter))
    r_mat = compose_affine(t_mat, invert_affine(s_mat))
    return affine_warp_batch(inter_img, r_mat, out_size)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = rsgnet_w32_256x192()
    spec = get_spec("coco")
    model = get_pose_net(cfg)
    out_size = tuple(cfg.MODEL.IMAGE_SIZE)          # (192, 256)
    h, w = out_size[1], out_size[0]

    rng = np.random.RandomState(0)
    n_sets = 3
    imgs_640 = [jnp.asarray(rng.randint(0, 255, (B, SRC, SRC, 3), np.uint8))
                for _ in range(n_sets)]
    imgs_320 = [jnp.asarray(np.asarray(x)[:, ::2, ::2]) for x in imgs_640]
    centers = jnp.asarray(
        rng.uniform(200, 400, (B, 2)).astype(np.float32))
    scales = jnp.asarray(
        np.stack([rng.uniform(0.8, 1.5, B) * 0.75,
                  rng.uniform(0.8, 1.5, B)], -1).astype(np.float32))
    rots = jnp.asarray(rng.uniform(-60, 60, B).astype(np.float32))

    t_rot = jax.jit(jax.vmap(lambda c, s, r: get_affine_transform_jax(
        c, s, r, out_size)))(centers, scales, rots)
    t_rot = jnp.asarray(np.asarray(t_rot))
    t_norot = jax.jit(jax.vmap(lambda c, s: get_affine_transform_jax(
        c, s, 0.0, out_size)))(centers, scales)
    t_norot = jnp.asarray(np.asarray(t_norot))
    t_rot_h = jax.jit(jax.vmap(lambda c, s, r: get_affine_transform_jax(
        c, s, r, out_size)))(centers / 2.0, scales / 2.0, rots)
    t_rot_h = jnp.asarray(np.asarray(t_rot_h))

    # --- warp candidates (digest outputs) -----------------------------------
    g640 = jax.jit(lambda im, t: digest(affine_warp_batch(im, t, out_size)))
    timeit("gather warp 640^2 (rot)", g640, [(x, t_rot) for x in imgs_640])
    timeit("gather warp 320^2 (rot)", g640, [(x, t_rot_h) for x in imgs_320])
    sep = jax.jit(lambda im, t: digest(separable_warp_batch(im, t, out_size)))
    timeit("separable warp 640^2 (rot=0)", sep,
           [(x, t_norot) for x in imgs_640])
    dec = jax.jit(lambda im, c, s, r: digest(decomposed_warp(
        im, c, s, r, out_size, inter=336)))
    timeit("decomposed sep640->336 + rot-gather", dec,
           [(x, centers, scales, rots) for x in imgs_640])

    # --- aug pipeline pieces -------------------------------------------------
    joints = jnp.asarray(rng.uniform(150, 450, (B, 17, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(B, 17)) > 0.2).astype(np.float32))
    key = jax.random.PRNGKey(0)

    aug = jax.jit(lambda k, im, j, v, c, s: digest(augment_batch(
        k, im, j, v, c, s, cfg, spec)))
    timeit("augment_batch (full fused aug)", aug,
           [(key, x, joints, vis, centers, scales) for x in imgs_640])

    tgt = jax.jit(lambda j, v: digest(generate_target_jax(
        j, v, tuple(cfg.MODEL.HEATMAP_SIZE), out_size, cfg.MODEL.SIGMA)))
    j_crop = jnp.asarray(rng.uniform(0, 192, (B, 17, 2)).astype(np.float32))
    timeit("generate_target", tgt, [(j_crop, vis)])

    # --- model fwd / train step ----------------------------------------------
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    inputs = [jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3)).astype(np.float32))
              for _ in range(n_sets)]
    fwd = jax.jit(lambda v, x: digest(model.apply(v, x, train=False)))
    timeit("forward only (B=64)", fwd, [(variables, x) for x in inputs])

    step = make_train_step(cfg, model, spec, jit=False)
    step = jax.jit(step, donate_argnums=(0,))
    batches = [{"image": x, "joints": joints, "joints_vis": vis,
                "center": centers, "scale": scales} for x in imgs_640]
    timeit_seq("train step FULL (aug 640^2 + fwd+bwd+update)", step, state,
               [(b, key) for b in batches])

    # fwd+bwd+update on pre-augmented inputs (isolates the model part)
    from rsgnet_tpu.core.loss import make_loss
    loss_inner = make_loss(cfg)
    tgt_hm, tgt_w = jax.jit(lambda j, v: generate_target_jax(
        j, v, tuple(cfg.MODEL.HEATMAP_SIZE), out_size,
        cfg.MODEL.SIGMA))(j_crop, vis)
    tgt_hm = jnp.asarray(np.asarray(tgt_hm))
    tgt_w = jnp.asarray(np.asarray(tgt_w))

    def bare_step(st, x, t, tw):
        def loss_fn(p):
            vs = {"params": p, "batch_stats": st.batch_stats}
            (final, aux), ms = st.apply_fn(vs, x, train=True, return_aux=True,
                                           mutable=["batch_stats"])
            return (loss_inner(final, t, tw)
                    + 0.5 * loss_inner(aux, t, tw)), ms
        (l, ms), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        st = st.apply_gradients(grads=g, batch_stats=ms["batch_stats"])
        return st, {"loss": l}

    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0))
    bare = jax.jit(bare_step, donate_argnums=(0,))
    timeit_seq("train step BARE (fwd+bwd+update only)", bare, state2,
               [(x, tgt_hm, tgt_w) for x in inputs])

    # --- e2e eval fn (small outputs; materialized directly) ------------------
    # NOTE: `variables` above aliases buffers that the donated train-step
    # timings deleted on donation-honoring backends (TPU) — rebuild fresh
    fresh = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": fresh.params, "batch_stats": fresh.batch_stats}
    from rsgnet_tpu.core.inference import make_e2e_fn
    e2e = make_e2e_fn(cfg, model, (SRC, SRC))

    def e2e_run(v, x, c, s):
        return e2e(v, x, c, s)

    outs = [e2e_run(variables, imgs_640[0], centers, scales)]
    jax.tree_util.tree_map(np.asarray, outs)
    t0 = time.perf_counter()
    outs = [e2e_run(variables, imgs_640[i % n_sets], centers, scales)
            for i in range(8)]
    jax.tree_util.tree_map(np.asarray, outs)
    dt = (time.perf_counter() - t0) / 8
    print(f"{'e2e eval (warp+fwd+flip+decode) B=64':44s} {dt * 1e3:8.1f} "
          f"ms/iter   {B / dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
