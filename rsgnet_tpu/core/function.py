"""Epoch driver: train loop + periodic validation + checkpointing.

The reference ``lib/core/function.py`` + ``tools/train.py`` orchestration
(SURVEY.md §2.17, §3.1) rebuilt around the TPU execution model:

- ONE jitted train step (on-device aug -> forward -> loss -> backward ->
  update) sharded over the data axis of a 1-D mesh; gradients all-reduce over
  ICI via the sharding annotations (BASELINE.json:11).
- Host loop only feeds batches (threaded decode + device prefetch double
  buffering) and reads metrics — metrics are fetched lazily so the device
  pipeline stays ahead of the host.
- AverageMeter logging every PRINT_FREQ, per-epoch validate, checkpoint +
  best-by-AP (reference save_checkpoint contract).
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.core.validate import validate
from rsgnet_tpu.data.loader import BatchLoader, device_prefetch
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.parallel.mesh import make_mesh
from rsgnet_tpu.utils.checkpoint import auto_resume, save_checkpoint
from rsgnet_tpu.utils.logger import AverageMeter
from rsgnet_tpu.utils.profiler import StepTraceWindow


def train_one_epoch(step_fn, state, loader, rng, epoch, shard, logger=None,
                    print_freq=100, cfg=None, debug_dir=None,
                    profile=None):
    """Returns (state, mean_loss). Device ahead of host via prefetch.

    ``profile``: optional ``(logdir, n_steps)`` — capture an xprof trace of
    ``n_steps`` steady-state steps via ``StepTraceWindow`` (starts after
    step 0, so compilation and warmup are excluded; fenced edges).
    """
    batch_time = AverageMeter()
    losses = AverageMeter()
    accs = AverageMeter()
    end = time.perf_counter()
    pending = None                    # lazily-read metrics (1-step delay)
    n = 0
    tracer = (StepTraceWindow(profile[0], profile[1], logger=logger)
              if profile is not None else None)
    try:
        for i, batch in enumerate(device_prefetch(iter(loader),
                                                  sharding=shard)):
            if tracer is not None:
                # the threaded state is the fence: it is an output of every
                # dispatched step, so its readiness marks them complete
                tracer.step(i, state)
            batch.pop("num_valid", None)
            batch.pop("image_id", None)
            batch.pop("score", None)
            batch.pop("factor", None)  # eval-only: targets live in crop space
            batch.pop("offset", None)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            bs = batch["image"].shape[0]
            n += bs
            if pending is not None:
                losses.update(float(pending["loss"]), bs)
                accs.update(float(pending["acc"]), bs)
            pending = metrics
            batch_time.update(time.perf_counter() - end)
            end = time.perf_counter()
            if (cfg is not None and cfg.DEBUG.DEBUG and debug_dir
                    and i % print_freq == 0 and "debug" in metrics):
                from rsgnet_tpu.utils.vis import save_debug_images
                d = {k: np.asarray(v) for k, v in metrics["debug"].items()}
                save_debug_images(cfg, d["inputs"], d["joints"],
                                  d["joints_vis"], d["target"], d["output"],
                                  f"{debug_dir}/train_e{epoch}_i{i}")
            if logger and i % print_freq == 0:
                logger.info(
                    "Epoch [%d][%d/%d] time %.3fs (%.3f) loss %.5f (%.5f) "
                    "acc %.3f (%.3f) %.1f img/s",
                    epoch, i, len(loader), batch_time.val, batch_time.avg,
                    losses.val, losses.avg, accs.val, accs.avg,
                    bs / max(batch_time.avg, 1e-9))
    finally:
        if tracer is not None:        # short epoch OR a raising loop: the
            tracer.close(state)       # trace is flushed either way
    if pending is not None:
        losses.update(float(pending["loss"]), bs)
        accs.update(float(pending["acc"]), bs)
    return state, losses.avg


def _make_tb_writer(tb_dir):
    """clu TensorBoard writer (reference SummaryWriter analogue, SURVEY.md
    §5.5); None if clu/TF is unavailable."""
    if not tb_dir:
        return None
    try:
        from clu import metric_writers
        return metric_writers.create_default_writer(tb_dir)
    except Exception:
        return None


def fit(cfg: Config, model, train_dataset, val_dataset=None,
        output_dir: str = "output", logger=None, num_workers: int = 8,
        mesh=None, max_epochs=None, eval_every: int = 1,
        init_state=None, tb_dir=None, profile_steps: int = 0):
    """Full training run. Returns (state, best_perf).

    ``profile_steps``: when > 0, capture a ``jax.profiler`` (xprof) trace of
    that many steady-state train steps of the FIRST epoch into
    ``<output_dir>/xprof`` (process 0 only — each process traces its local
    devices, and process 0 owns file outputs). View with TensorBoard's
    profile plugin.

    Multi-process (multi-host DP): when ``jax.process_count() > 1`` (the
    launcher called ``initialize_distributed``), the mesh spans every
    process's devices, each process's loader collates only its slice of the
    bit-identical global batch (``BatchLoader(process_shard=...)``), the
    gradient all-reduce rides ICI within a slice and DCN across, validation
    shards per host and gathers results, and process 0 alone writes
    checkpoints/TB/debug files (a shared filesystem is assumed for resume,
    as usual for multi-host training).
    """
    spec = get_spec(cfg.DATASET.DATASET)
    pid, nproc = jax.process_index(), jax.process_count()
    is_main = pid == 0
    if not is_main:
        tb_dir = None                 # process 0 owns all file outputs
    mesh = mesh or make_mesh(axis_name=cfg.MESH_DATA_AXIS)
    n_dev = mesh.size
    batch_size = cfg.TRAIN.BATCH_SIZE_PER_GPU * n_dev
    if cfg.TRAIN.LOADER == "grain":
        if nproc > 1:
            raise NotImplementedError(
                "TRAIN.LOADER=grain has no multi-process sharding; use the "
                "threaded loader for multi-host runs")
        from rsgnet_tpu.data.grain_pipeline import GrainBatchLoader
        loader = GrainBatchLoader(train_dataset, batch_size,
                                  shuffle=cfg.TRAIN.SHUFFLE,
                                  num_workers=num_workers)
    else:
        loader = BatchLoader(train_dataset, batch_size,
                             shuffle=cfg.TRAIN.SHUFFLE, drop_last=True,
                             num_workers=num_workers, pad_last=False,
                             process_shard=(pid, nproc) if nproc > 1
                             else None)
    if len(loader) == 0 and logger:
        logger.warning(
            "dataset (%d instances) is smaller than one global batch (%d, "
            "drop_last) — epochs will run ZERO training steps",
            len(train_dataset), batch_size)
    steps_per_epoch = max(1, len(loader))

    state = init_state or create_train_state(
        cfg, model, jax.random.PRNGKey(0), steps_per_epoch=steps_per_epoch)
    if (init_state is None and cfg.MODEL.INIT_WEIGHTS
            and cfg.MODEL.PRETRAINED):
        # reference init_weights: backbone from a pretrained torch checkpoint
        from rsgnet_tpu.utils.torch_convert import (load_pretrained_backbone,
                                                    load_torch_checkpoint)
        sd = load_torch_checkpoint(cfg.MODEL.PRETRAINED)
        nest = "backbone" if "backbone" in state.params else None
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables, n = load_pretrained_backbone(cfg, variables, sd,
                                                nest_under=nest)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        if logger:
            logger.info("loaded %d pretrained backbone tensors from %s",
                        n, cfg.MODEL.PRETRAINED)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(cfg.MESH_DATA_AXIS))
    state = jax.device_put(state, repl)
    step_fn = make_train_step(cfg, model, spec, jit=False, mesh=mesh)
    batch_shardings = {"image": shard, "joints": shard, "joints_vis": shard,
                       "center": shard, "scale": shard}
    step_fn = jax.jit(step_fn,
                      in_shardings=(repl, batch_shardings, repl),
                      donate_argnums=(0,))

    begin_epoch, best_perf = cfg.TRAIN.BEGIN_EPOCH, 0.0
    auto_resumed = False
    if cfg.TRAIN.AUTO_RESUME:
        state, resumed_epoch, resumed_perf = auto_resume(output_dir, state)
        auto_resumed = resumed_epoch > 0
        if auto_resumed:
            begin_epoch, best_perf = resumed_epoch, resumed_perf
            if logger:
                logger.info("auto-resumed at epoch %d (best %.4f)",
                            begin_epoch, best_perf)
    if not auto_resumed and cfg.TRAIN.RESUME:
        # reference TRAIN.RESUME semantics: no output-dir checkpoint found
        # (auto-resume takes precedence), resume from the explicit
        # TRAIN.CHECKPOINT path instead
        if not cfg.TRAIN.CHECKPOINT:
            raise ValueError("TRAIN.RESUME=true requires TRAIN.CHECKPOINT")
        from rsgnet_tpu.utils.checkpoint import load_checkpoint
        state, epoch, best_perf = load_checkpoint(cfg.TRAIN.CHECKPOINT, state)
        begin_epoch = epoch + 1
        if logger:
            logger.info("resumed from TRAIN.CHECKPOINT=%s at epoch %d "
                        "(best %.4f)", cfg.TRAIN.CHECKPOINT, begin_epoch,
                        best_perf)

    writer = _make_tb_writer(tb_dir)
    ckpt = None
    if cfg.TRAIN.ASYNC_CHECKPOINT:
        from rsgnet_tpu.utils.checkpoint import AsyncCheckpointer
        ckpt = AsyncCheckpointer()
        saver = ckpt.save
    else:
        saver = save_checkpoint
    # build the eval function ONCE — per-epoch rebuilds would retrace and
    # recompile the whole inference program every epoch
    val_infer = None
    if val_dataset is not None:
        from rsgnet_tpu.core.validate import make_validate_infer_fn
        # multi-process: eval runs per-host on LOCAL devices (zero
        # collectives in the eval forward), results gathered afterwards —
        # so the infer fn compiles against the local mesh
        val_mesh = mesh if nproc == 1 else make_mesh(
            devices=jax.local_devices(), axis_name=cfg.MESH_DATA_AXIS)
        val_infer = make_validate_infer_fn(cfg, model, val_dataset,
                                           mesh=val_mesh)
    end_epoch = min(cfg.TRAIN.END_EPOCH, max_epochs or cfg.TRAIN.END_EPOCH)
    # Per-epoch streams are pure functions of the epoch NUMBER (fold_in), not
    # of a running split chain, and the loader's shuffle order is pinned to
    # the same epoch number — so a run killed at any epoch boundary and
    # auto-resumed is bitwise-identical to an uninterrupted run
    # (tests/test_resume_equivalence.py).
    base_rng = jax.random.PRNGKey(0)
    for epoch in range(begin_epoch, end_epoch):
        erng = jax.random.fold_in(base_rng, epoch)
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        prof = None
        if profile_steps > 0 and epoch == begin_epoch and is_main:
            prof = (os.path.join(output_dir, "xprof"), profile_steps)
        state, loss = train_one_epoch(step_fn, state, loader, erng, epoch,
                                      shard, logger, cfg.PRINT_FREQ,
                                      cfg=cfg,
                                      # debug tensors are batch-sharded
                                      # across processes — fetchable only
                                      # single-process
                                      debug_dir=output_dir if nproc == 1
                                      else None, profile=prof)
        perf = 0.0
        validated = (val_dataset is not None
                     and (epoch + 1) % eval_every == 0)
        if validated:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            if nproc == 1:
                _, perf = validate(cfg, val_dataset, model, variables,
                                   output_dir=output_dir, logger=logger,
                                   num_workers=num_workers, mesh=mesh,
                                   infer_fn=val_infer)
            else:
                # every process computes the identical AP (results gathered
                # host-side), so best_perf / is_best stay consistent
                from rsgnet_tpu.core.validate import validate_distributed
                _, perf = validate_distributed(
                    cfg, val_dataset, model, variables,
                    output_dir=output_dir, logger=logger,
                    num_workers=num_workers, infer_fn=val_infer)
        # best is only meaningful on epochs that actually evaluated
        is_best = validated and perf >= best_perf
        best_perf = max(best_perf, perf)
        if is_main:
            saver(output_dir, state, epoch, perf, is_best,
                  best_perf=best_perf)
        if writer:
            writer.write_scalars(epoch, {"train_loss": loss,
                                         "valid_AP": perf,
                                         "best_AP": best_perf})
        if logger:
            logger.info("epoch %d: loss %.5f perf %.4f best %.4f",
                        epoch, loss, perf, best_perf)
    if ckpt is not None:
        ckpt.wait()                 # last checkpoint durable before return
    if writer:
        writer.flush()
    return state, best_perf
