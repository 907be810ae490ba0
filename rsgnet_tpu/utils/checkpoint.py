"""Checkpoint save/resume (reference ``save_checkpoint``/AUTO_RESUME,
SURVEY.md §2.19/§5.4) on flax msgpack serialization.

Field-compatible with the reference dict {epoch, state_dict, best_state_dict,
perf, optimizer}: here {epoch, params, batch_stats, opt_state, perf}, written
to ``checkpoint.msgpack`` each epoch with the best params additionally at
``model_best.msgpack``. ``auto_resume`` restores epoch + optimizer state from
``checkpoint.msgpack`` when present (reference TRAIN.AUTO_RESUME semantics).
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import numpy as np
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"
BEST_NAME = "model_best.msgpack"


def _to_host(tree):
    import jax
    return jax.tree_util.tree_map(np.asarray, tree)


def _snapshot(state, epoch: int, perf: float,
              best_perf: float | None, batch_in_epoch: int = 0) -> dict:
    """Host-side payload. MUST run before the next train step: the step
    donates the state buffers, so device arrays referenced here would be
    invalidated — which is why even the async path snapshots inline."""
    return {
        "epoch": epoch,
        # >0 marks a MID-epoch (preemption) checkpoint: `epoch` is the
        # in-progress epoch and this many of its steps are already applied
        # — resume re-enters the same epoch at this batch offset
        "batch_in_epoch": int(batch_in_epoch),
        "step": int(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        # to_state_dict: optax states are (named)tuples msgpack can't encode
        "opt_state": serialization.to_state_dict(_to_host(state.opt_state)),
        "perf": float(perf),
        "best_perf": float(perf if best_perf is None else best_perf),
    }


def _atomic_write(path: str, data: bytes) -> None:
    """tmp + os.replace: a crash mid-write can never corrupt the resume
    point (the previous checkpoint stays intact until the rename)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _write_payload(out_dir: str, payload: dict, is_best: bool) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, CKPT_NAME)
    _atomic_write(path, serialization.msgpack_serialize(payload))
    if is_best:
        best = {"params": payload["params"],
                "batch_stats": payload["batch_stats"],
                "perf": payload["perf"], "epoch": payload["epoch"]}
        _atomic_write(os.path.join(out_dir, BEST_NAME),
                      serialization.msgpack_serialize(best))
    return path


def save_checkpoint(out_dir: str, state, epoch: int, perf: float,
                    is_best: bool, best_perf: float | None = None,
                    batch_in_epoch: int = 0) -> str:
    """state: core.train.TrainState. Returns the checkpoint path.

    ``perf`` is THIS epoch's metric (0.0 on epochs that didn't validate);
    ``best_perf`` is the running best, persisted separately so a resumed run
    never overwrites ``model_best`` with a worse model (the reference stores
    the running best too — ADVICE round-2). ``batch_in_epoch`` > 0 writes a
    mid-epoch (preemption) checkpoint — see ``_snapshot``."""
    return _write_payload(out_dir,
                          _snapshot(state, epoch, perf, best_perf,
                                    batch_in_epoch),
                          is_best)


class AsyncCheckpointer:
    """Checkpointing with the serialize+write moved off the train loop
    (TRAIN.ASYNC_CHECKPOINT). The device->host snapshot stays synchronous
    (donation — see ``_snapshot``); msgpack encoding + the filesystem write
    (seconds for sub-GB checkpoints, worse on network filesystems) overlap
    the next epoch. At most one write is in flight — ``save`` joins the
    previous one first, so on-disk checkpoints are always ordered and
    ``wait()`` at the end of ``fit`` guarantees durability of the last."""

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(1, thread_name_prefix="ckpt")
        self._pending = None

    def save(self, out_dir: str, state, epoch: int, perf: float,
             is_best: bool, best_perf: float | None = None,
             batch_in_epoch: int = 0) -> None:
        payload = _snapshot(state, epoch, perf, best_perf, batch_in_epoch)
        self.wait()
        self._pending = self._pool.submit(_write_payload, out_dir, payload,
                                          is_best)

    def wait(self):
        """Join the in-flight write (re-raises its exception, if any)."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()


def peek_checkpoint(path: str) -> dict:
    """Read {'epoch', 'perf', 'best_perf', 'batch_in_epoch'} without a
    state template (e.g. to inspect where a preemption checkpoint stopped).

    Note: msgpack has no lazy field access, so this decodes the WHOLE
    payload (params/opt_state included) to return four scalars — seconds
    and a params-sized transient allocation on a real W32 checkpoint. Fine
    for one-off inspection; do not call it in a loop."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return {"epoch": int(raw.get("epoch", 0)),
            "perf": float(raw.get("perf", 0.0)),
            "best_perf": float(raw.get("best_perf", raw.get("perf", 0.0))),
            "batch_in_epoch": int(raw.get("batch_in_epoch", 0))}


def load_checkpoint(path: str, state) -> Tuple[Any, int, float, int]:
    """Restore ``state`` (template for structure) from ``path``.

    Returns (state, epoch, best_perf, batch_in_epoch). ``batch_in_epoch``
    is 0 for epoch-boundary checkpoints (and for checkpoints written before
    the field existed); >0 means ``epoch`` is in progress and that many of
    its steps are already applied (preemption checkpoint). Works for both
    full checkpoints (with opt_state) and best-model files
    (params/batch_stats only).

    Layout-compat note: round-2 renamed the RSG head's refine layers
    (``refine{i}_conv``/``refine{i}_bn`` -> ``refine{i}/conv|bn``), so
    msgpack checkpoints written before that rename fail to restore params.
    No shipped checkpoint predates the rename; if one ever matters, remap
    the keys before ``from_state_dict``.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(state.params, raw["params"])
    batch_stats = serialization.from_state_dict(state.batch_stats,
                                                raw["batch_stats"])
    kw = dict(params=params, batch_stats=batch_stats)
    if "step" in raw:
        # TrainState.step mirrors the optax count; restoring it keeps a
        # resumed run's step numbering identical to an uninterrupted one
        # (tests/test_resume_equivalence.py)
        kw["step"] = int(raw["step"])
    if "opt_state" in raw:
        try:
            kw["opt_state"] = serialization.from_state_dict(state.opt_state,
                                                            raw["opt_state"])
        except (KeyError, ValueError, TypeError) as e:
            # optimizer-state layout changed between writer and reader (e.g.
            # per-leaf Adam state from before the optax.flatten fusion).
            # Weights + epoch still resume; the optimizer restarts fresh —
            # strictly better than crashing the run at startup.
            import logging
            logging.getLogger("rsgnet").warning(
                "checkpoint %s: optimizer state layout mismatch (%s); "
                "resuming weights/epoch with a fresh optimizer state",
                path, e)
    state = state.replace(**kw)
    best = raw.get("best_perf", raw.get("perf", 0.0))
    return (state, int(raw.get("epoch", 0)), float(best),
            int(raw.get("batch_in_epoch", 0)))


def load_weights(cfg, model, model_file: str):
    """Init variables, then load eval weights from a native ``.msgpack``
    checkpoint or a reference torch ``.pth`` via the converter. Empty
    ``model_file`` returns the random init (smoke mode)."""
    import jax

    from rsgnet_tpu.models import init_variables
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32))
    if not model_file:
        return variables
    if model_file.endswith((".pth", ".pt", ".pth.tar")):
        from rsgnet_tpu.utils.torch_convert import (convert_state_dict,
                                                    load_torch_checkpoint)
        sd = load_torch_checkpoint(model_file)
        # nest by the ACTUAL params structure, not MODEL.NAME — RSG can also
        # be enabled via MODEL.RSG.ENABLED, and a wrong guess would merge the
        # backbone tensors as ignored orphans (silently-random backbone)
        nest = "backbone" if "backbone" in variables["params"] else None
        params, stats = convert_state_dict(cfg, sd, nest_under=nest)
        merged_p = dict(variables["params"])
        merged_s = dict(variables["batch_stats"])
        merged_p.update(params)
        merged_s.update(stats)
        return {"params": merged_p, "batch_stats": merged_s}
    with open(model_file, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(variables["params"], raw["params"])
    stats = serialization.from_state_dict(variables["batch_stats"],
                                          raw["batch_stats"])
    return {"params": params, "batch_stats": stats}


def auto_resume(out_dir: str, state):
    """(state, begin_epoch, best_perf, start_batch) — restored when a
    checkpoint exists. Epoch-boundary checkpoints resume at the NEXT epoch
    (start_batch 0); mid-epoch preemption checkpoints re-enter the SAME
    epoch at the recorded batch offset."""
    path = os.path.join(out_dir, CKPT_NAME)
    if os.path.exists(path):
        state, epoch, perf, batch = load_checkpoint(path, state)
        if batch > 0:
            return state, epoch, perf, batch
        return state, epoch + 1, perf, 0
    return state, 0, 0.0, 0
