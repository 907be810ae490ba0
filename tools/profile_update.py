"""Update-tail dissection: where do the ~71 ms between (aug + fwd+bwd) and
the FULL train step go?  Variants (all B=64, W32, shear warp, pipelined
dispatch, one end-of-run loss fetch):

  FULL (flatten-adam)      the new default (optax.flatten wrapper)
  FULL no-accuracy         drops the PCK meter from the step
  BARE+update              pre-augmented inputs: fwd+bwd+flatten-update only

Run on the real TPU:  python tools/profile_update.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import timeit_pipelined_step

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
from rsgnet_tpu.core.loss import make_loss
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.ops.heatmap import generate_target_jax

B = 64


def timeit_pipelined(name, step, state0, arg_sets, iters=10):
    return timeit_pipelined_step(name, step, state0, arg_sets, iters=iters,
                                 batch=B)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = rsgnet_w32_256x192()
    spec = get_spec("coco")
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]

    rng = np.random.RandomState(0)
    imgs = [jnp.asarray(rng.randint(0, 255, (B, 640, 640, 3), np.uint8))
            for _ in range(3)]
    joints = jnp.asarray(rng.uniform(150, 450, (B, 17, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(B, 17)) > 0.2).astype(np.float32))
    centers = jnp.asarray(rng.uniform(200, 400, (B, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, B) * 0.75,
                                   rng.uniform(0.8, 1.5, B)],
                                  -1).astype(np.float32))
    key = jax.random.PRNGKey(0)
    batches = [{"image": x, "joints": joints, "joints_vis": vis,
                "center": centers, "scale": scales} for x in imgs]

    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, spec)
    timeit_pipelined("FULL shear + flatten-adam", step, state,
                     [(b, key) for b in batches])

    # no-accuracy variant
    from rsgnet_tpu.data.augment import augment_batch
    loss_inner = make_loss(cfg)

    def step_noacc(st, batch, rng_):
        aug = augment_batch(rng_, batch["image"], batch["joints"],
                            batch["joints_vis"], batch["center"],
                            batch["scale"], cfg, spec)

        def loss_fn(p):
            vs = {"params": p, "batch_stats": st.batch_stats}
            (final, aux), ms = st.apply_fn(vs, aug.inputs, train=True,
                                           return_aux=True,
                                           mutable=["batch_stats"])
            return (loss_inner(final, aug.target, aug.target_weight)
                    + 0.5 * loss_inner(aux, aug.target, aug.target_weight)), ms
        (l, ms), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        st = st.apply_gradients(grads=g, batch_stats=ms["batch_stats"])
        return st, {"loss": l}

    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0))
    timeit_pipelined("FULL shear, no accuracy",
                     jax.jit(step_noacc, donate_argnums=(0,)), state2,
                     [(b, key) for b in batches])

    # bare: pre-augmented inputs, fwd+bwd+update only
    inputs = [jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3)).astype(np.float32))
              for _ in range(3)]
    j_crop = jnp.asarray(rng.uniform(0, 192, (B, 17, 2)).astype(np.float32))
    tgt, tw = jax.jit(lambda j, v: generate_target_jax(
        j, v, tuple(cfg.MODEL.HEATMAP_SIZE), tuple(cfg.MODEL.IMAGE_SIZE),
        cfg.MODEL.SIGMA))(j_crop, vis)
    tgt = jnp.asarray(np.asarray(tgt))
    tw = jnp.asarray(np.asarray(tw))

    def bare(st, x, t, tw_):
        def loss_fn(p):
            vs = {"params": p, "batch_stats": st.batch_stats}
            (final, aux), ms = st.apply_fn(vs, x, train=True, return_aux=True,
                                           mutable=["batch_stats"])
            return (loss_inner(final, t, tw_)
                    + 0.5 * loss_inner(aux, t, tw_)), ms
        (l, ms), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        st = st.apply_gradients(grads=g, batch_stats=ms["batch_stats"])
        return st, {"loss": l}

    state3 = create_train_state(cfg, model, jax.random.PRNGKey(0))
    timeit_pipelined("BARE fwd+bwd+flatten-update",
                     jax.jit(bare, donate_argnums=(0,)), state3,
                     [(x, tgt, tw) for x in inputs])


if __name__ == "__main__":
    main()
