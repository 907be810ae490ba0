"""Validation loop: batched inference over a dataset -> keypoint AP.

The reference ``core.function.validate`` (SURVEY.md §3.2): per batch, model
forward + flip-test average + decode, accumulate ``all_preds``/``all_boxes``,
then ``dataset.evaluate``. Here the whole per-batch device path (fused warp
from the padded source canvas -> backbone -> flip-test -> sub-pixel decode ->
inverse affine) is ONE jitted function (``make_e2e_fn``), the host loop only
feeds batches (double-buffered prefetch) and collects results.
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.core.inference import make_e2e_fn
from rsgnet_tpu.data.loader import BatchLoader, device_prefetch
from rsgnet_tpu.utils.profiler import StepTraceWindow


def make_validate_infer_fn(cfg: Config, model, dataset, mesh=None,
                           pipeline: str = "device"):
    """Build the jitted per-batch eval function once; pass to ``validate``
    via ``infer_fn`` to avoid re-tracing/compiling on every call (the epoch
    loop would otherwise recompile per epoch — minutes on remote backends).

    Returns (infer_fn, image_key).
    """
    if pipeline == "host":
        from rsgnet_tpu.core.inference import make_inference_fn
        infer = make_inference_fn(cfg, model, jit=(mesh is None),
                                  normalize_input=True)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P(cfg.MESH_DATA_AXIS))
            infer = jax.jit(infer, in_shardings=(repl, shard, shard, shard),
                            out_shardings=(shard, shard))
        return infer, "input"
    return make_e2e_fn(cfg, model, dataset.src_size, mesh=mesh), "image"


def collect_predictions(cfg: Config, dataset, model, variables,
                        batch_size: int | None = None, num_workers: int = 8,
                        logger=None, mesh=None, pipeline: str = "device",
                        infer_fn=None, profile=None):
    """The device half of ``validate``: run the jitted eval path over the
    whole dataset and return host arrays
    ``(all_preds (N,K,3), all_boxes (N,6), image_ids (N,))`` in db order —
    everything ``dataset.evaluate`` needs. Split out so multi-host eval can
    collect per-process shards and gather before evaluating
    (``validate_distributed``).

    ``profile``: optional ``(logdir, n_batches)`` — capture an xprof trace
    of steady-state eval batches (``StepTraceWindow``: batch 0's compile
    stays out, fenced edges)."""
    n_dev = mesh.size if mesh is not None else 1
    batch_size = (batch_size or cfg.TEST.BATCH_SIZE_PER_GPU) * n_dev
    host_crop = pipeline == "host"
    if cfg.TEST.FOLD_BN and variables is not None:
        # host-side, once, before the loop: the SAME jitted program serves
        # folded and unfolded variables (models/fold_bn.py)
        from rsgnet_tpu.models.fold_bn import fold_bn_variables
        variables = fold_bn_variables(variables)
    if cfg.TEST.LOADER == "grain":
        from rsgnet_tpu.data.grain_pipeline import GrainEvalLoader
        loader = GrainEvalLoader(dataset, batch_size,
                                 num_workers=num_workers, cropped=host_crop)
    else:
        loader = BatchLoader(dataset, batch_size, shuffle=False,
                             num_workers=num_workers, pad_last=True,
                             cropped=host_crop)
    if infer_fn is not None:
        # infer_fn is the (fn, image_key) pair from make_validate_infer_fn —
        # bundling prevents silently pairing a host-crop fn with canvas
        # batches (or vice versa)
        infer, image_key = infer_fn
        expected = "input" if host_crop else "image"
        assert image_key == expected, (
            f"infer_fn was built for image_key={image_key!r} but "
            f"pipeline={pipeline!r} ships {expected!r} batches")
    else:
        infer, image_key = make_validate_infer_fn(cfg, model, dataset,
                                                  mesh=mesh,
                                                  pipeline=pipeline)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def to_mesh(x):
            # multi-host fit passes params living on the GLOBAL train mesh
            # while eval runs on the LOCAL mesh — device_put between the two
            # is a "cross-host transfer" jax refuses. Replicated leaves have
            # an addressable shard on every host, so start from that local
            # device buffer (no D2H round trip of the whole param tree);
            # anything else (not expected here) falls back through numpy.
            if (hasattr(x, "sharding")
                    and not x.sharding.device_set <= set(mesh.devices.flat)):
                x = (x.addressable_data(0)
                     if x.sharding.is_fully_replicated else jax.device_get(x))
            return jax.device_put(x, NamedSharding(mesh, P()))

        variables = jax.tree_util.tree_map(to_mesh, variables)

    n = len(dataset)
    k = dataset.num_joints
    all_preds = np.zeros((n, k, 3), np.float32)
    all_boxes = np.zeros((n, 6), np.float32)
    image_ids = np.zeros((n,), np.int64)
    seen = 0
    t0 = time.perf_counter()
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(mesh, P(cfg.MESH_DATA_AXIS))
    # keep a window of batches in flight and materialize the oldest lazily:
    # per-batch host syncs cost a full tunnel round trip on remote backends
    # (BENCH_NOTES.md), while unbounded dispatch would pin every in-flight
    # batch's buffers in HBM
    window: list = []

    def drain_one():
        nonlocal seen
        nv, preds, maxvals, c, s, score, img_id, factor, offset = \
            window.pop(0)
        sl = slice(seen, seen + nv)
        # undo the canvas mapping (dataset.load_sample): predictions were
        # decoded in canvas space; GT annotations live in original-image
        # space. p_orig = (p_canvas + offset) / factor
        f = (np.ones((nv, 1), np.float32) if factor is None
             else np.asarray(factor, np.float32)[:nv].reshape(-1, 1))
        off = (np.zeros((nv, 2), np.float32) if offset is None
               else np.asarray(offset, np.float32)[:nv].reshape(-1, 2))
        all_preds[sl, :, :2] = ((np.asarray(preds)[:nv] + off[:, None, :])
                                / f[:, :, None])
        all_preds[sl, :, 2:3] = np.asarray(maxvals)[:nv]
        c = (np.asarray(c)[:nv] + off) / f
        s = np.asarray(s)[:nv] / f
        all_boxes[sl, 0:2] = c
        all_boxes[sl, 2:4] = s
        all_boxes[sl, 4] = np.prod(s * 200.0, axis=1)
        all_boxes[sl, 5] = np.asarray(score)[:nv]
        image_ids[sl] = np.asarray(img_id)[:nv]
        seen += nv

    tracer = (StepTraceWindow(profile[0], profile[1], logger=logger)
              if profile is not None else None)
    last = None                       # newest dispatched outputs (fence)
    try:
        for i, batch in enumerate(
                device_prefetch(iter(loader), sharding=batch_sharding)):
            if tracer is not None:
                tracer.step(i, last)
            nv = int(batch["num_valid"])
            # uint8 images go to the device as-is; casts happen on device
            preds, maxvals = infer(variables, batch[image_key],
                                   batch["center"], batch["scale"])
            last = (preds, maxvals)
            window.append((nv, preds, maxvals, batch["center"],
                           batch["scale"], batch["score"],
                           batch["image_id"], batch.get("factor"),
                           batch.get("offset")))
            if len(window) > 8:
                drain_one()
    finally:
        if tracer is not None:        # flushed even if the loop raised
            tracer.close(last)
    while window:
        drain_one()
    dt = time.perf_counter() - t0
    if logger:
        logger.info("validate: %d instances in %.1fs (%.1f img/s)",
                    seen, dt, seen / max(dt, 1e-9))
    assert seen == n, (seen, n)
    return all_preds, all_boxes, image_ids


def validate(cfg: Config, dataset, model, variables,
             batch_size: int | None = None, output_dir: str | None = None,
             num_workers: int = 8, logger=None, mesh=None,
             pipeline: str = "device", infer_fn=None,
             profile_steps: int = 0):
    """Returns (name_value OrderedDict, AP). Mirrors reference validate().

    With ``mesh`` (a 1-D data mesh) the batch is sharded over the chips and
    params replicated — data-parallel eval, the reference DataParallel
    validate analogue. Batch size scales per chip.

    pipeline:
      "device" — ship padded uint8 canvases; crop/warp fused on device (the
        BASELINE design; best when host<->device bandwidth is PCIe-class).
      "host"   — reference-style cv2 crop on host threads, ship only the
        model-input-sized uint8 crops (8x less transfer; best on
        bandwidth-constrained links — see BENCH_NOTES.md).
    """
    profile = None
    if profile_steps > 0:
        if output_dir:
            profile = (os.path.join(output_dir, "xprof"), profile_steps)
        elif logger:
            logger.warning("profile_steps=%d ignored: validate() has no "
                           "output_dir to write the trace into",
                           profile_steps)
    all_preds, all_boxes, image_ids = collect_predictions(
        cfg, dataset, model, variables, batch_size=batch_size,
        num_workers=num_workers, logger=logger, mesh=mesh,
        pipeline=pipeline, infer_fn=infer_fn, profile=profile)
    _save_eval_debug(cfg, dataset, all_preds, output_dir)
    return _evaluate_and_log(dataset, all_preds, all_boxes, image_ids,
                             output_dir, logger)


def _save_eval_debug(cfg: Config, dataset, all_preds, output_dir,
                     max_images: int = 4):
    """The eval-path analogue of the reference validate()'s
    ``save_debug_images`` call (SURVEY.md §2.20, §3.2): DEBUG-gated dump of
    the final predictions, rendered as skeleton overlays on the ORIGINAL
    frames. The reference draws on the model-input crops mid-loop; here the
    predictions are already mapped back to source-image coordinates, so the
    dump shows exactly the poses ``evaluate`` scores — per-image, all
    instances together (crowding visible at a glance)."""
    if not (cfg.DEBUG.DEBUG and cfg.DEBUG.SAVE_BATCH_IMAGES_PRED
            and output_dir):
        return
    from rsgnet_tpu.utils.imageio import decode_image, read_bytes
    from rsgnet_tpu.utils.vis import save_prediction_image
    selected: dict = {}          # image_id -> (db indices, path)
    for i, rec in enumerate(dataset.db):
        img_id = int(rec["image_id"])
        if img_id in selected:
            selected[img_id][0].append(i)
        elif len(selected) < max_images:
            selected[img_id] = ([i], rec["image_path"])
    for img_id, (idx, path) in selected.items():
        image = decode_image(read_bytes(path), color_rgb=dataset.color_rgb)
        preds = all_preds[idx]
        save_prediction_image(
            image, preds[:, :, :2], preds[:, :, 2], dataset.spec,
            os.path.join(output_dir, "val_debug", f"pred_{img_id}.png"),
            thresh=cfg.TEST.IN_VIS_THRE)


def _evaluate_and_log(dataset, preds, boxes, ids, output_dir, logger):
    """The shared tail of both validate flavors: AP table + metric log."""
    name_value, ap = dataset.evaluate(preds, boxes, ids,
                                      output_dir=output_dir)
    if logger:
        logger.info("| %s |", " | ".join(f"{kk}: {v:.4f}"
                                         for kk, v in name_value.items()))
    return name_value, ap


def validate_distributed(cfg: Config, dataset, model, variables,
                         batch_size: int | None = None,
                         output_dir: str | None = None, num_workers: int = 8,
                         logger=None, pipeline: str = "device",
                         infer_fn=None):
    """Multi-host eval: each process runs the jitted eval path over ITS
    contiguous slice of the dataset on its LOCAL devices (the eval forward
    compiles to zero collectives — tests/test_dp_hlo.py — so a global mesh
    buys nothing), then one ``process_allgather`` exchanges the small result
    arrays and every process computes the identical AP table. Files (results
    json, eval log) are written by process 0 only.

    Single-process: falls through to ``validate`` on a local mesh.
    """
    pid, nproc = jax.process_index(), jax.process_count()
    from rsgnet_tpu.parallel.distributed import gather_host_results
    from rsgnet_tpu.parallel.mesh import make_mesh
    local_mesh = make_mesh(devices=jax.local_devices(),
                           axis_name=cfg.MESH_DATA_AXIS)
    if nproc == 1:
        return validate(cfg, dataset, model, variables,
                        batch_size=batch_size, output_dir=output_dir,
                        num_workers=num_workers, logger=logger,
                        mesh=local_mesh, pipeline=pipeline, infer_fn=infer_fn)
    sub = dataset.shard(pid, nproc)
    preds, boxes, ids = collect_predictions(
        cfg, sub, model, variables, batch_size=batch_size,
        num_workers=num_workers, logger=logger, mesh=local_mesh,
        pipeline=pipeline, infer_fn=infer_fn)
    preds, boxes, ids = gather_host_results((preds, boxes, ids),
                                            len(dataset))
    if pid == 0:
        _save_eval_debug(cfg, dataset, preds, output_dir)
    return _evaluate_and_log(dataset, preds, boxes, ids,
                             output_dir if pid == 0 else None, logger)
