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
import signal
import threading
import time

import jax
import jax.numpy as jnp
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


class PreemptionGuard:
    """Graceful-preemption hook for ``fit`` (TRAIN.PREEMPT_CHECKPOINT).

    TPU pods (and spot VMs generally) get a SIGTERM plus a short grace
    window before eviction. The reference's only answer is AUTO_RESUME from
    the last epoch boundary — a preemption late in an epoch loses the whole
    epoch. With the guard installed, ``fit`` finishes the in-flight step,
    writes a MID-epoch checkpoint (``batch_in_epoch`` in the payload) and
    returns cleanly; ``auto_resume`` re-enters the same epoch at the same
    batch, and because the per-step RNG and shuffle order are pure functions
    of (epoch, step), the resumed run is bitwise-identical to an
    uninterrupted one (tests/test_preemption.py).

    ``install()`` is main-thread-only (CPython signal rule); elsewhere the
    guard still works via ``request_stop()``. Multi-process DP: the stop is
    CONSENSUAL — each process feeds its local flag into the train step as a
    batch input, the step all-reduces it (``metrics["stop"]``), and every
    process breaks on the identical reduced value, so all ranks stop at the
    same step boundary and rank 0's mid-epoch checkpoint is valid for the
    whole job (``train_one_epoch(stop_sync=True)``;
    tests/test_multiprocess_dp.py). Even a signal delivered to only ONE
    rank (operator kill) stops the job cleanly instead of hanging peers in
    the next collective.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._stop = threading.Event()
        self._previous = None

    def install(self):
        if threading.current_thread() is not threading.main_thread():
            return self                 # signal API is main-thread-only
        self._previous = [(s, signal.getsignal(s)) for s in self._signals]
        for s in self._signals:
            signal.signal(s, lambda signum, frame: self.request_stop())
        return self

    def uninstall(self):
        for s, prev in self._previous or ():
            signal.signal(s, prev)
        self._previous = None

    def request_stop(self):
        self._stop.set()

    @property
    def stop_requested(self) -> bool:
        return self._stop.is_set()

    def should_stop(self, step: int) -> bool:
        """Consulted by the train loop before dispatching ``step``.
        Subclass for deterministic test injection."""
        return self.stop_requested


def consensual_stop_flag(stop_requested: bool, mesh, axis_name) -> bool:
    """One tiny max-reduce of a host-local stop flag over the mesh.

    The epoch-boundary half of the consensual-preemption protocol: a signal
    that lands during validate/checkpointing reaches only some ranks, and a
    local break would strand the peers in the next epoch's first
    collective. Reducing the flag makes the boundary decision identical on
    every rank. (The in-epoch half rides the batch through the train step —
    ``_inject_stop_flags`` + ``metrics["stop"]``.)
    Default-tier coverage: tests/test_consensual_stop.py.
    """
    local = np.full((len(jax.local_devices()),),
                    1.0 if stop_requested else 0.0, np.float32)
    flag = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis_name)), local)
    return float(jax.jit(jnp.max)(flag)) > 0


def _inject_stop_flags(iterator, guard, start_step=0):
    """Attach each process's LOCAL stop flag to every host batch (key
    "stop", (local_batch,) float32 0/1). The train step max-reduces the
    sharded global array, so the stop DECISION all ranks read back is
    identical even when the flags disagree; per-rank staleness from the
    prefetch depth only delays the common stop by that many steps.
    ``start_step`` keeps step-keyed guards (the documented subclass API)
    on ABSOLUTE step indices after a mid-epoch resume, matching the
    non-sync path's ``should_stop(start_step + i)``."""
    for i, batch in enumerate(iterator):
        flag = 1.0 if guard.should_stop(start_step + i) else 0.0
        n = len(batch["image"])
        batch["stop"] = np.full((n,), flag, np.float32)
        yield batch


def train_one_epoch(step_fn, state, loader, rng, epoch, shard, logger=None,
                    print_freq=100, cfg=None, debug_dir=None,
                    profile=None, start_step=0, guard=None,
                    stop_sync=False):
    """Returns (state, mean_loss, steps_done, stopped). Device ahead of
    host via prefetch.

    ``profile``: optional ``(logdir, n_steps)`` — capture an xprof trace of
    ``n_steps`` steady-state steps via ``StepTraceWindow`` (starts after
    step 0, so compilation and warmup are excluded; fenced edges).

    ``start_step``: mid-epoch resume offset — the loader must already be
    positioned there (``set_position``); the per-step RNG is
    ``fold_in(rng, step)``, a pure function of the ABSOLUTE step index, so
    a resumed epoch consumes exactly the streams the uninterrupted one
    would. ``steps_done`` counts absolute steps (start_step + completed).

    ``guard``: optional ``PreemptionGuard`` — checked before each dispatch;
    when it fires the loop drains the in-flight metrics and returns with
    ``stopped=True`` (the caller writes the mid-epoch checkpoint).

    ``stop_sync``: multi-process consensual stop. Instead of breaking on
    the LOCAL flag (ranks could diverge by a step and deadlock the next
    collective), each batch carries the local flag ("stop" key, sharded
    like the batch) and the loop breaks only on the all-reduced
    ``metrics["stop"]`` read back from a completed step — identical on
    every rank, so all ranks stop at the same step boundary.
    """
    batch_time = AverageMeter()
    losses = AverageMeter()
    accs = AverageMeter()
    end = time.perf_counter()
    pending = None                    # lazily-read metrics (1-step delay)
    n = 0
    bs = 0
    steps_done = start_step
    stopped = False
    tracer = (StepTraceWindow(profile[0], profile[1], logger=logger)
              if profile is not None else None)
    src = iter(loader)
    if stop_sync and guard is not None:
        src = _inject_stop_flags(src, guard, start_step)
    try:
        for i, batch in enumerate(device_prefetch(src, sharding=shard)):
            step = start_step + i
            if guard is not None and not stop_sync and guard.should_stop(step):
                stopped = True
                break
            if tracer is not None:
                # the threaded state is the fence: it is an output of every
                # dispatched step, so its readiness marks them complete
                tracer.step(i, state)
            batch.pop("num_valid", None)
            batch.pop("image_id", None)
            batch.pop("score", None)
            batch.pop("factor", None)  # eval-only: targets live in crop space
            batch.pop("offset", None)
            # pure function of (epoch rng, absolute step) — NOT a running
            # split chain — so a mid-epoch resume replays identical streams
            sub = jax.random.fold_in(rng, step)
            state, metrics = step_fn(state, batch, sub)
            steps_done = step + 1
            bs = batch["image"].shape[0]
            n += bs
            stop_now = False
            if pending is not None:
                losses.update(float(pending["loss"]), bs)
                accs.update(float(pending["acc"]), bs)
                # the all-reduced flag is identical on every rank, so every
                # rank breaks at this same step boundary
                stop_now = stop_sync and float(pending.get("stop", 0.0)) > 0
            pending = metrics              # the tail drain settles step s
            if stop_now:
                stopped = True
                break
            batch_time.update(time.perf_counter() - end)
            end = time.perf_counter()
            if (cfg is not None and cfg.DEBUG.DEBUG and debug_dir
                    and step % print_freq == 0 and "debug" in metrics):
                from rsgnet_tpu.utils.vis import save_debug_images
                d = {k: np.asarray(v) for k, v in metrics["debug"].items()}
                save_debug_images(cfg, d["inputs"], d["joints"],
                                  d["joints_vis"], d["target"], d["output"],
                                  f"{debug_dir}/train_e{epoch}_i{step}")
            if logger and step % print_freq == 0:
                logger.info(
                    "Epoch [%d][%d/%d] time %.3fs (%.3f) loss %.5f (%.5f) "
                    "acc %.3f (%.3f) %.1f img/s",
                    epoch, step, len(loader), batch_time.val, batch_time.avg,
                    losses.val, losses.avg, accs.val, accs.avg,
                    bs / max(batch_time.avg, 1e-9))
    finally:
        if tracer is not None:        # short epoch OR a raising loop: the
            tracer.close(state)       # trace is flushed either way
    if pending is not None:
        # drains the in-flight step — after this the state/metrics are
        # materializable, so a preemption save reads a settled step count
        losses.update(float(pending["loss"]), bs)
        accs.update(float(pending["acc"]), bs)
    return state, losses.avg, steps_done, stopped


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
        init_state=None, tb_dir=None, profile_steps: int = 0,
        preempt_guard=None):
    """Full training run. Returns (state, best_perf).

    ``profile_steps``: when > 0, capture a ``jax.profiler`` (xprof) trace of
    that many steady-state train steps of the FIRST epoch into
    ``<output_dir>/xprof`` (process 0 only — each process traces its local
    devices, and process 0 owns file outputs). View with TensorBoard's
    profile plugin.

    ``preempt_guard``: optional ``PreemptionGuard``. When None and
    TRAIN.PREEMPT_CHECKPOINT is on (single-process, main thread), fit
    installs one on SIGTERM: the loop stops at the next step boundary,
    writes a MID-epoch checkpoint and returns; AUTO_RESUME re-enters the
    same epoch at the same batch, bitwise-identical to an uninterrupted
    run (tests/test_preemption.py).

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
        from rsgnet_tpu.data.grain_pipeline import GrainBatchLoader
        loader = GrainBatchLoader(train_dataset, batch_size,
                                  shuffle=cfg.TRAIN.SHUFFLE,
                                  num_workers=num_workers,
                                  process_shard=(pid, nproc) if nproc > 1
                                  else None)
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

    # The guard itself installs right before the epoch loop (so a raise in
    # the jit wiring / resume below can never leak a SIGTERM handler), but
    # the step program's signature needs the decision NOW; the predicate
    # here is exactly the install condition further down.
    will_own_guard = (preempt_guard is None and cfg.TRAIN.PREEMPT_CHECKPOINT
                      and threading.current_thread()
                      is threading.main_thread())
    guard = preempt_guard
    # consensual preemption stop is the multi-process protocol: the batch
    # carries each rank's local flag and the loop breaks on the all-reduced
    # metrics["stop"] — all ranks stop at the same step (PreemptionGuard)
    stop_sync = nproc > 1 and (guard is not None or will_own_guard)

    def _boundary_stop():
        """Epoch-boundary stop decision. Single-process: the local flag.
        Multi-process: consensual via ``consensual_stop_flag`` — see its
        docstring for why a local break would strand the peers."""
        if guard is None:
            return False
        if not stop_sync:
            return guard.stop_requested
        return consensual_stop_flag(guard.stop_requested, mesh,
                                    cfg.MESH_DATA_AXIS)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(cfg.MESH_DATA_AXIS))
    state = jax.device_put(state, repl)
    step_fn = make_train_step(cfg, model, spec, jit=False, mesh=mesh)
    batch_shardings = {"image": shard, "joints": shard, "joints_vis": shard,
                       "center": shard, "scale": shard}
    if stop_sync:
        batch_shardings["stop"] = shard
    step_fn = jax.jit(step_fn,
                      in_shardings=(repl, batch_shardings, repl),
                      donate_argnums=(0,))

    begin_epoch, best_perf, start_batch = cfg.TRAIN.BEGIN_EPOCH, 0.0, 0
    auto_resumed = False
    if cfg.TRAIN.AUTO_RESUME:
        state, resumed_epoch, resumed_perf, start_batch = auto_resume(
            output_dir, state)
        auto_resumed = resumed_epoch > 0 or start_batch > 0
        if auto_resumed:
            begin_epoch, best_perf = resumed_epoch, resumed_perf
            if logger:
                logger.info("auto-resumed at epoch %d%s (best %.4f)",
                            begin_epoch,
                            f" batch {start_batch}" if start_batch else "",
                            best_perf)
    if not auto_resumed and cfg.TRAIN.RESUME:
        # reference TRAIN.RESUME semantics: no output-dir checkpoint found
        # (auto-resume takes precedence), resume from the explicit
        # TRAIN.CHECKPOINT path instead
        if not cfg.TRAIN.CHECKPOINT:
            raise ValueError("TRAIN.RESUME=true requires TRAIN.CHECKPOINT")
        from rsgnet_tpu.utils.checkpoint import load_checkpoint
        state, epoch, best_perf, start_batch = load_checkpoint(
            cfg.TRAIN.CHECKPOINT, state)
        begin_epoch = epoch if start_batch > 0 else epoch + 1
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
    # RNG streams are pure functions of POSITION — fold_in(base, epoch) per
    # epoch, fold_in(erng, step) per step — and the loader's shuffle order
    # is pinned to the same epoch number, so a run killed at ANY step
    # boundary and auto-resumed is bitwise-identical to an uninterrupted
    # run (tests/test_resume_equivalence.py, tests/test_preemption.py).
    base_rng = jax.random.PRNGKey(0)
    owns_guard = False
    if will_own_guard:
        guard = PreemptionGuard().install()
        owns_guard = True
    stopped = False
    try:
        for epoch in range(begin_epoch, end_epoch):
            erng = jax.random.fold_in(base_rng, epoch)
            start_step = start_batch if epoch == begin_epoch else 0
            if start_step and not hasattr(loader, "set_position"):
                if logger:
                    logger.warning(
                        "loader %s lacks set_position; restarting epoch %d "
                        "from batch 0 (re-trains %d batches)",
                        type(loader).__name__, epoch, start_step)
                start_step = 0
            if start_step:
                loader.set_position(epoch, start_step)
            elif hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)
            prof = None
            if profile_steps > 0 and epoch == begin_epoch and is_main:
                prof = (os.path.join(output_dir, "xprof"), profile_steps)
            state, loss, steps_done, stopped = train_one_epoch(
                step_fn, state, loader, erng, epoch,
                shard, logger, cfg.PRINT_FREQ,
                cfg=cfg,
                # debug tensors are batch-sharded across processes —
                # fetchable only single-process
                debug_dir=output_dir if nproc == 1 else None,
                profile=prof, start_step=start_step, guard=guard,
                stop_sync=stop_sync)
            if stopped:
                if steps_done > 0:
                    # batch_in_epoch > 0 is what makes auto_resume re-enter
                    # THIS epoch; steps_done == 0 must NOT be saved — a
                    # (epoch, batch 0) payload reads as an epoch-BOUNDARY
                    # checkpoint and resume would skip the whole epoch. With
                    # zero steps run the state is unchanged, so the prior
                    # on-disk checkpoint (or a fresh start) already resumes
                    # exactly here.
                    if is_main:
                        saver(output_dir, state, epoch, 0.0, False,
                              best_perf=best_perf, batch_in_epoch=steps_done)
                    if logger:
                        logger.info(
                            "preemption stop: mid-epoch checkpoint written "
                            "(epoch %d, batch %d) — auto-resume continues "
                            "here", epoch, steps_done)
                elif logger:
                    logger.info(
                        "preemption stop before the first step of epoch %d "
                        "— no checkpoint needed, resume re-enters here",
                        epoch)
                break
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
                    # every process computes the identical AP (results
                    # gathered host-side), so best_perf / is_best stay
                    # consistent
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
            if _boundary_stop():
                # the signal landed during validate/checkpointing (or too
                # late in the epoch for an in-batch flag): the
                # epoch-boundary checkpoint above is already written —
                # every rank reads the same reduced flag and stops cleanly
                # before the next epoch
                if logger:
                    logger.info("preemption stop at epoch %d boundary",
                                epoch)
                break
    finally:
        if owns_guard:
            guard.uninstall()
    if ckpt is not None:
        ckpt.wait()                 # last checkpoint durable before return
    if writer:
        writer.flush()
    return state, best_perf
