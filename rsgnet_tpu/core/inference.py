"""Batched inference pipeline: preprocess -> model -> flip-test -> decode.

The benchmark-critical path (SURVEY.md §3.2): everything between raw crops
and image-space keypoints is ONE jitted function per config, including the
flip-test average (reference ``validate`` loop body) and the sub-pixel decode.

``make_inference_fn(cfg, model)`` returns ``fn(variables, images, centers,
scales) -> (preds, maxvals)``:
- images: (N, H, W, 3) already-cropped, normalized model inputs (NHWC);
- flip-test runs the model on the x-mirrored batch, un-flips with the L/R
  channel permutation + SHIFT_HEATMAP, and averages (reference §3.2);
- decode: DARK or quarter-offset per TEST.DECODE / TEST.POST_PROCESS;
- preds are original-image coordinates via the inverse affine.

``make_e2e_fn`` additionally fuses the preprocessing warp (raw padded images
+ boxes -> crops) on device, i.e. reference §3.5 end-to-end in one XLA
program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.ops.affine import get_affine_transform_jax
from rsgnet_tpu.ops.decode import get_final_preds_jax
from rsgnet_tpu.ops.flip import flip_back_jax
from rsgnet_tpu.ops.warp import crop_and_normalize, resolve_eval_warp


def heatmaps_with_flip_test(apply_fn, variables, images, cfg: Config, perm,
                            fused=False):
    """Model forward (+ optional flip-test average). images: (N, H, W, 3).

    ``fused=True`` runs original + x-mirrored crops as ONE 2N-batch forward
    (bit-identical in eval mode — BatchNorm uses running averages, so
    samples are independent). Measured A/B on the chip (B=128, W32): fused
    72.6/68.3 ms vs two-pass 62.9/66.7 ms — halving the op count does NOT
    help (the 2N-batch working set hurts more than per-op overhead), so
    two-pass is the default; the fused variant is kept for experimentation.
    """
    if not cfg.TEST.FLIP_TEST:
        return apply_fn(variables, images)
    if fused:
        n = images.shape[0]
        both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
        out = apply_fn(variables, both)
        output, flipped = out[:n], out[n:]
    else:
        output = apply_fn(variables, images)
        flipped = apply_fn(variables, images[:, :, ::-1, :])
    flipped = flip_back_jax(flipped, perm, shift=cfg.TEST.SHIFT_HEATMAP)
    return (output + flipped) * 0.5


def make_inference_fn(cfg: Config, model, jit=True, normalize_input=False):
    """Crops -> image-space keypoints, honoring TEST.* config.

    ``normalize_input=True`` accepts raw uint8 crops and applies the
    ImageNet normalization on device (host-crop eval pipeline); otherwise
    images must already be normalized float inputs.
    """
    spec = get_spec(cfg.DATASET.DATASET)
    perm = jnp.asarray(spec.flip_perm)
    use_dark = cfg.TEST.DECODE.lower() == "dark"

    def fn(variables, images, centers, scales):
        if normalize_input:
            from rsgnet_tpu.ops.warp import normalize_image
            images = normalize_image(jnp.asarray(images, jnp.float32))
        apply_fn = lambda v, x: model.apply(v, x, train=False)
        output = heatmaps_with_flip_test(apply_fn, variables, images, cfg, perm)
        preds, maxvals = get_final_preds_jax(
            output, centers, scales,
            post_process=cfg.TEST.POST_PROCESS,
            use_dark=use_dark, blur_kernel=cfg.TEST.BLUR_KERNEL,
            use_pallas=cfg.TEST.PALLAS_DECODE)
        return preds, maxvals

    return jax.jit(fn) if jit else fn


def make_e2e_fn(cfg: Config, model, src_size, jit=True, mesh=None):
    """Raw padded images + center/scale -> keypoints; warp fused on device.

    src_size: static (H, W) of the padded source images.
    mesh: optional 1-D data mesh — batch args sharded over it, params
    replicated (data-parallel eval; collectives-free, XLA just splits the
    batch over ICI).
    """
    spec = get_spec(cfg.DATASET.DATASET)
    perm = jnp.asarray(spec.flip_perm)
    use_dark = cfg.TEST.DECODE.lower() == "dark"
    image_size = tuple(cfg.MODEL.IMAGE_SIZE)       # (w, h)

    # "auto" -> "separable" (the measured e2e winner); the shared resolver
    # in ops/warp.py is the single source of truth for the option set and
    # carries the full measurement note.
    warp = resolve_eval_warp(cfg.TEST.WARP, name="TEST.WARP")

    def fn(variables, raw_images, centers, scales):
        rot = jnp.zeros(centers.shape[0], jnp.float32)
        trans = get_affine_transform_jax(centers, scales, rot, image_size)
        # eval crops are rotation-free -> every sampler is exact-footprint
        inputs = crop_and_normalize(raw_images, trans, image_size, warp=warp,
                                    mesh=mesh, data_axis=cfg.MESH_DATA_AXIS)
        apply_fn = lambda v, x: model.apply(v, x, train=False)
        output = heatmaps_with_flip_test(apply_fn, variables, inputs, cfg, perm)
        preds, maxvals = get_final_preds_jax(
            output, centers, scales,
            post_process=cfg.TEST.POST_PROCESS,
            use_dark=use_dark, blur_kernel=cfg.TEST.BLUR_KERNEL,
            use_pallas=cfg.TEST.PALLAS_DECODE)
        return preds, maxvals

    if not jit:
        return fn
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(cfg.MESH_DATA_AXIS))
    return jax.jit(fn, in_shardings=(repl, shard, shard, shard),
                   out_shardings=(shard, shard))
