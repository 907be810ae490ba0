"""Training core: train state, optimizer/LR schedule, jitted train/eval steps.

Reference contract (SURVEY.md §2.1, §2.17, §2.19): Adam (or SGD) with
MultiStepLR (factor 0.1 at LR_STEP epochs), JointsMSELoss, PCK accuracy
meter, checkpoint best-by-AP. Here:

- ``TrainState`` = flax train state + BatchNorm ``batch_stats``.
- ``make_multistep_lr(cfg, steps_per_epoch)``: optax piecewise-constant
  mirroring MultiStepLR semantics.
- ``make_train_step(cfg, model, spec)``: ONE jitted function that takes the
  *raw* batch (padded images + boxes + joints) and does on-device
  augmentation -> forward -> loss -> backward -> optimizer update, sharded
  over the data axis of the mesh it is placed on (gradients all-reduced by
  XLA over ICI per BASELINE.json:11).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.core.evaluate import accuracy_jax
from rsgnet_tpu.core.loss import make_loss
from rsgnet_tpu.data.augment import augment_batch
from rsgnet_tpu.data.skeletons import KeypointSpec


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_multistep_lr(cfg: Config, steps_per_epoch: int):
    """MultiStepLR: LR * LR_FACTOR^(#milestones passed), per-step schedule."""
    boundaries = {int(e * steps_per_epoch): cfg.TRAIN.LR_FACTOR
                  for e in cfg.TRAIN.LR_STEP}
    return optax.piecewise_constant_schedule(cfg.TRAIN.LR, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000):
    sched = make_multistep_lr(cfg, steps_per_epoch)
    if cfg.TRAIN.OPTIMIZER.lower() == "adam":
        tx = optax.adam(sched)                 # reference Adam takes no WD
    elif cfg.TRAIN.OPTIMIZER.lower() == "sgd":
        # reference get_optimizer: SGD(lr, momentum, weight_decay=WD,
        # nesterov) — torch adds wd*param to the gradient BEFORE the
        # momentum buffer, which is exactly add_decayed_weights -> sgd
        tx = optax.chain(
            optax.add_decayed_weights(cfg.TRAIN.WD),
            optax.sgd(sched, momentum=cfg.TRAIN.MOMENTUM,
                      nesterov=cfg.TRAIN.NESTEROV))
    else:
        raise KeyError(cfg.TRAIN.OPTIMIZER)
    # HRNet has ~1200 parameter leaves; per-leaf optimizer ops dominate the
    # update tail on TPU (~70 ms/step of kernel-dispatch overhead measured at
    # B=64 — BENCH_NOTES.md round 2). Flattening runs ONE fused elementwise
    # update over a single concatenated buffer; numerics are unchanged.
    return optax.flatten(tx)


def create_train_state(cfg: Config, model, rng, steps_per_epoch: int = 1000):
    from rsgnet_tpu.models import init_variables

    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, rng,
                               jnp.zeros((1, h, w, 3), jnp.float32))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch))


def make_train_step(cfg: Config, model, spec: KeypointSpec, jit=True,
                    donate=True, mesh=None):
    """Raw batch -> aug -> forward -> loss -> update. Returns (state, metrics).

    batch dict keys: 'image' (N, Hs, Ws, 3), 'joints' (N, K, 2),
    'joints_vis' (N, K), 'center' (N, 2), 'scale' (N, 2).

    mesh: pass the data mesh when the step runs batch-sharded over multiple
    devices — the "pallas" warp needs it to shard_map its kernel (a
    pallas_call is opaque to the SPMD partitioner and would otherwise
    all-gather the image batch; ops/pallas/shear_warp.py).
    """
    loss_fn_inner = make_loss(cfg)
    is_rsg = cfg.MODEL.RSG.ENABLED or cfg.MODEL.NAME == "pose_rsgnet"

    def step(state: TrainState, batch, rng):
        # optional consensual-stop flag (multi-process preemption): a
        # (local_batch,) 0/1 array per process; the max over the SHARDED
        # global array is one scalar all-reduce, so every process reads the
        # identical "any rank wants to stop" value from this step's metrics
        # (core/function.py::train_one_epoch stop_sync)
        stop = batch.pop("stop", None)
        aug = augment_batch(rng, batch["image"], batch["joints"],
                            batch["joints_vis"], batch["center"],
                            batch["scale"], cfg, spec, mesh=mesh)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if is_rsg:
                (final, aux), new_model_state = state.apply_fn(
                    variables, aug.inputs, train=True, return_aux=True,
                    mutable=["batch_stats"])
                loss = (loss_fn_inner(final, aug.target, aug.target_weight)
                        + 0.5 * loss_fn_inner(aux, aug.target,
                                              aug.target_weight))
                out = final
            else:
                out, new_model_state = state.apply_fn(
                    variables, aug.inputs, train=True,
                    mutable=["batch_stats"])
                loss = loss_fn_inner(out, aug.target, aug.target_weight)
            return loss, (out, new_model_state)

        (loss, (out, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=new_model_state["batch_stats"])
        _, avg_acc, _, _ = accuracy_jax(out, aug.target)
        metrics = {"loss": loss, "acc": avg_acc}
        if stop is not None:
            metrics["stop"] = jnp.max(stop)
        if cfg.DEBUG.DEBUG:
            # expose the augmented batch + predictions so the host loop can
            # dump reference-style debug images (utils/vis.py)
            metrics["debug"] = {"inputs": aug.inputs, "target": aug.target,
                                "output": out, "joints": aug.joints_heatmap,
                                "joints_vis": aug.target_weight}
        return state, metrics

    if jit:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step


def make_eval_forward(cfg: Config, model, jit=True):
    """validation forward producing heatmaps only (flip-test handled by
    core.inference); kept separate so eval can reuse train batch layout."""
    def fwd(state: TrainState, images):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return model.apply(variables, images, train=False)
    return jax.jit(fwd) if jit else fwd
