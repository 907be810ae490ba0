"""Fused on-device training augmentation (reference §2.9 / §3.4 -> one jit).

The reference does, per sample, on host CPU with NumPy randomness:
half-body transform -> random scale (+-SCALE_FACTOR) -> random rotation
(+-2*ROT_FACTOR, 60% of the time) -> random flip -> cv2.warpAffine -> Gaussian
targets. Here the entire chain is a stateless, batched device function driven
by per-sample ``jax.random`` keys (BASELINE.json:5: the preprocessing path is
"fused on-device to feed the model at line rate").

Parity note (SURVEY.md §7 hard-part 5): the reference uses NumPy per-sample
RNG; this uses counter-based jax.random. Parity is **distributional**, not
bitwise — same clipping, probabilities, and ranges; different streams. The
deterministic geometry (warp, targets) is bit-matched and tested.

The horizontal flip is folded into the affine matrix (pre-composing the
source-space mirror ``x -> width - 1 - x``) instead of materializing a
flipped image — one warp, no extra HBM traffic.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.skeletons import KeypointSpec
from rsgnet_tpu.ops.affine import (affine_transform_jax,
                                   get_affine_transform_jax)
from rsgnet_tpu.ops.heatmap import generate_target_jax
from rsgnet_tpu.ops.shear_warp import shear_warp_batch
from rsgnet_tpu.ops.warp import (affine_warp_batch, normalize_image,
                                 resolve_train_warp)


class AugBatch(NamedTuple):
    inputs: jnp.ndarray         # (N, H, W, 3) normalized model inputs
    target: jnp.ndarray         # (N, Hh, Hw, K) Gaussian heatmaps
    target_weight: jnp.ndarray  # (N, K)
    joints_heatmap: jnp.ndarray  # (N, K, 2) warped joints in input space


def _half_body(key, joints, vis, spec: KeypointSpec, aspect_ratio,
               num_joints_half_body, prob_half_body):
    """Vectorized half-body transform (reference `half_body_transform`).

    Reference semantics reproduced exactly:
    - upper half chosen when randn() < 0.5 (the HRNet-family quirk draws a
      *normal*, so upper is picked ~69% of the time, not 50%) AND it has
      > 2 visible joints;
      otherwise the lower half if IT has > 2; otherwise fall back to upper;
    - center = MEAN of the selected joints (not the box center);
    - box = joint extent, aspect-ratio-fixed, /200, * 1.5 padding;
    - applied only when total visible > NUM_JOINTS_HALF_BODY, the prob gate
      fires, and the selection has >= 2 joints.

    Returns (center, scale, applied).
    """
    k = joints.shape[0]
    k_prob, k_side = jax.random.split(key, 2)
    upper_mask = jnp.zeros((k,), bool).at[
        jnp.asarray(spec.upper_body_ids)].set(True)
    up = upper_mask & (vis > 0)
    low = (~upper_mask) & (vis > 0)
    n_up = jnp.sum(up)
    n_low = jnp.sum(low)
    # reference: np.random.randn() < 0.5 — a NORMAL draw, so P(upper)≈0.69
    use_upper = (jax.random.normal(k_side) < 0.5) & (n_up > 2)
    use_lower = (~use_upper) & (n_low > 2)
    sel = jnp.where(use_upper, up, jnp.where(use_lower, low, up))
    nsel = jnp.sum(sel)

    self32 = sel.astype(jnp.float32)[:, None]
    center = jnp.sum(joints * self32, axis=0) / jnp.maximum(nsel, 1)
    big = 1e9
    mins = jnp.min(jnp.where(sel[:, None], joints, big), axis=0)
    maxs = jnp.max(jnp.where(sel[:, None], joints, -big), axis=0)
    wh = maxs - mins
    w, h = wh[0], wh[1]
    w = jnp.where(w > aspect_ratio * h, w, h * aspect_ratio)
    h = jnp.where(wh[0] > aspect_ratio * wh[1], wh[0] / aspect_ratio, h)
    scale = jnp.stack([w, h]) / 200.0 * 1.5

    gate = ((jnp.sum(vis > 0) > num_joints_half_body)
            & (jax.random.uniform(k_prob) < prob_half_body)
            & (nsel >= 2))
    return center, scale, gate


def augment_batch(key, images, joints, joints_vis, centers, scales,
                  cfg: Config, spec: KeypointSpec, mesh=None):
    """The fused train-time preprocessing kernel.

    Args:
      key: PRNG key for the batch (split per sample internally).
      images: (N, Hs, Ws, 3) raw source images padded to a common size.
      joints: (N, K, 2) gt keypoints in source-image pixels.
      joints_vis: (N, K) visibility in {0, 1}.
      centers, scales: (N, 2) detection-box center/scale (pixel_std 200).
      mesh: optional explicit data mesh for the "pallas" warp (shard_maps
        the kernel per shard). With mesh=None the kernel stays SPMD-safe
        on multi-device hosts via its custom_partitioning wrapper
        (ops/pallas/shear_warp.py::shear_warp_pallas_dp).

    Returns AugBatch (all on device, all static shapes).
    """
    n, src_h, src_w = images.shape[0], images.shape[1], images.shape[2]
    image_size = tuple(cfg.MODEL.IMAGE_SIZE)
    heatmap_size = tuple(cfg.MODEL.HEATMAP_SIZE)
    d = cfg.DATASET
    aspect = cfg.aspect_ratio
    keys = jax.random.split(key, n)

    def per_sample(k, jnts, vis, c, s):
        k_hb, k_s, k_r, k_rgate, k_f = jax.random.split(k, 5)
        # --- half-body
        hb_c, hb_s, hb_on = _half_body(k_hb, jnts, vis, spec, aspect,
                                       d.NUM_JOINTS_HALF_BODY,
                                       d.PROB_HALF_BODY)
        c = jnp.where(hb_on, hb_c, c)
        s = jnp.where(hb_on, hb_s, s)
        # --- random scale
        sf = d.SCALE_FACTOR
        s = s * jnp.clip(jax.random.normal(k_s) * sf + 1.0, 1.0 - sf, 1.0 + sf)
        # --- random rotation (60% of samples, reference quirk)
        rf = d.ROT_FACTOR
        r = jnp.clip(jax.random.normal(k_r) * rf, -2.0 * rf, 2.0 * rf)
        r = jnp.where(jax.random.uniform(k_rgate) <= 0.6, r, 0.0)
        # --- random flip, folded into the matrix
        do_flip = d.FLIP & (jax.random.uniform(k_f) <= 0.5)
        c_flipped = jnp.stack([src_w - c[0] - 1.0, c[1]])
        c = jnp.where(do_flip, c_flipped, c)
        trans = get_affine_transform_jax(c, s, r, image_size)
        return trans, do_flip

    trans, do_flip = jax.vmap(per_sample)(
        keys, joints, joints_vis, centers, scales)

    # compose source-space mirror into the transform where flipped:
    # M' = trans @ F, F = [[-1, 0, w-1], [0, 1, 0], [0, 0, 1]]
    f_col0 = -trans[:, :, 0]
    f_col2 = trans[:, :, 0] * (src_w - 1.0) + trans[:, :, 2]
    trans_flipped = jnp.stack([f_col0, trans[:, :, 1], f_col2], axis=-1)
    total_trans = jnp.where(do_flip[:, None, None], trans_flipped, trans)

    # warp backend: the roll-decomposed shear warp replaces the 4-tap gather
    # (the round-1 train-step bottleneck — BENCH_NOTES.md) on square source
    # canvases; "pallas" fuses the whole two-pass warp into ONE kernel
    # (bit-identical outputs, removes the XLA path's multi-stage latency
    # floor — ops/pallas/shear_warp.py); non-square sources or
    # TRAIN.WARP="gather" use the exact gather.
    # "auto" resolves at trace time: the fused kernel on real TPU, the
    # jitted XLA shear path elsewhere. The kernel is partitioner-safe in
    # every calling convention — shard_map'd when mesh= is threaded,
    # custom_partitioning-wrapped when it is not — so the resolver no
    # longer gates on mesh (ops/warp.py::resolve_train_warp).
    warp = resolve_train_warp(cfg.TRAIN.WARP, mesh=mesh)
    if warp == "pallas" and src_h == src_w:
        from rsgnet_tpu.ops.pallas.shear_warp import shear_warp_pallas_dp
        inputs = shear_warp_pallas_dp(jnp.asarray(images), total_trans,
                                      tuple(image_size), mesh=mesh,
                                      axis=cfg.MESH_DATA_AXIS)
    elif warp == "shear" and src_h == src_w:
        inputs = shear_warp_batch(jnp.asarray(images), total_trans, image_size)
    else:
        inputs = affine_warp_batch(jnp.asarray(images), total_trans, image_size)
    inputs = normalize_image(inputs)

    # joints through the same (flip-composed) transform + L/R permutation
    warped = affine_transform_jax(joints, total_trans[:, None, :, :])
    perm = jnp.asarray(spec.flip_perm)
    warped = jnp.where(do_flip[:, None, None],
                       jnp.take(warped, perm, axis=1), warped)
    vis = jnp.where(do_flip[:, None], jnp.take(joints_vis, perm, axis=1),
                    joints_vis)

    target, tw = generate_target_jax(
        warped, vis, heatmap_size, image_size, cfg.MODEL.SIGMA,
        joints_weight=(spec.joints_weight
                       if cfg.LOSS.USE_DIFFERENT_JOINTS_WEIGHT else None))
    return AugBatch(inputs=inputs, target=target, target_weight=tw,
                    joints_heatmap=warped)
