"""Training losses (reference ``lib/core/loss.py``, SURVEY.md §2.16).

``JointsMSELoss``: per-joint MSE over flattened heatmaps with optional
target-weight masking — the reference computes, per joint,
``0.5 * MSE(pred_k * w_k, gt_k * w_k)`` and averages over joints
(torch MSELoss(size_average=True) divides by N*HW).

``JointsOHKMMSELoss``: online hard-keypoint mining — per-sample, keep the
top-k joint losses and average those (reference OHKM variant).

Both are pure jnp functions of NHWC heatmaps (N, H, W, K) and weights (N, K),
so XLA fuses them into the backward pass.
"""
from __future__ import annotations

import jax.numpy as jnp


def joints_mse_loss(pred, target, target_weight=None, use_target_weight=True):
    """pred/target: (N, H, W, K); target_weight: (N, K). Returns scalar."""
    n, h, w, k = pred.shape
    pred_f = jnp.reshape(jnp.transpose(pred, (0, 3, 1, 2)), (n, k, h * w))
    gt_f = jnp.reshape(jnp.transpose(target, (0, 3, 1, 2)), (n, k, h * w))
    if use_target_weight and target_weight is not None:
        tw = target_weight[..., None]
        diff = pred_f * tw - gt_f * tw
    else:
        diff = pred_f - gt_f
    # reference: sum over joints of 0.5*mean((d_k)^2), then / num_joints
    per_joint = 0.5 * jnp.mean(diff ** 2, axis=(0, 2))       # (K,)
    return jnp.sum(per_joint) / k


def joints_ohkm_mse_loss(pred, target, target_weight=None, topk=8,
                         use_target_weight=True):
    """OHKM: per-sample top-k hardest joints only (reference `JointsOHKMMSELoss`)."""
    n, h, w, k = pred.shape
    pred_f = jnp.reshape(jnp.transpose(pred, (0, 3, 1, 2)), (n, k, h * w))
    gt_f = jnp.reshape(jnp.transpose(target, (0, 3, 1, 2)), (n, k, h * w))
    if use_target_weight and target_weight is not None:
        tw = target_weight[..., None]
        diff = pred_f * tw - gt_f * tw
    else:
        diff = pred_f - gt_f
    per_joint = 0.5 * jnp.mean(diff ** 2, axis=2)            # (N, K)
    top_vals = jnp.sort(per_joint, axis=1)[:, -topk:]         # (N, topk)
    per_sample = jnp.sum(top_vals, axis=1) / topk
    return jnp.mean(per_sample)


def make_loss(cfg):
    """Loss factory honoring LOSS.USE_OHKM / TOPK / USE_TARGET_WEIGHT."""
    if cfg.LOSS.USE_OHKM:
        return lambda p, t, w: joints_ohkm_mse_loss(
            p, t, w, topk=cfg.LOSS.TOPK,
            use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT)
    return lambda p, t, w: joints_mse_loss(
        p, t, w, use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT)
