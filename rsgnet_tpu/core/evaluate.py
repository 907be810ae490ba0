"""PCK training-progress metric (reference ``lib/core/evaluate.py``, §2.18).

``accuracy``: PCK@0.5 on heatmap argmaxes with per-sample normalization by
heatmap-size/10 — the reference's quick signal during training (not the COCO
AP). Fully batched jnp so it runs on device next to the loss.

Reference semantics reproduced:
- ``calc_dists``: normalized L2 between pred and gt peaks, but -1 (missing)
  where the gt peak is at or below (1,1) (invisible).
- ``dist_acc``: fraction of valid dists below 0.5; -1 if no valid entries.
- ``accuracy``: per-joint PCK plus average over joints with any valid sample.
"""
from __future__ import annotations

import jax.numpy as jnp

from rsgnet_tpu.ops.decode import get_max_preds_jax


def calc_dists_jax(preds, target, normalize):
    """preds/target: (N, K, 2); normalize: (N, 2). Returns (K, N) dists."""
    valid = (target[..., 0] > 1.0) & (target[..., 1] > 1.0)     # (N, K)
    d = jnp.linalg.norm(preds / normalize[:, None, :]
                        - target / normalize[:, None, :], axis=-1)
    dists = jnp.where(valid, d, -1.0)
    return jnp.transpose(dists)                                  # (K, N)


def dist_acc_jax(dists, thr=0.5):
    """dists: (N,) with -1 for missing. Returns scalar acc or -1."""
    valid = dists != -1.0
    num = jnp.sum(valid)
    hit = jnp.sum((dists < thr) & valid)
    return jnp.where(num > 0, hit / jnp.maximum(num, 1), -1.0)


def accuracy_jax(output_nhwc, target_nhwc, thr=0.5):
    """Returns (per_joint_acc (K,), avg_acc scalar, cnt, pred_coords).

    Matches the reference `accuracy` including its normalization QUIRK:
    the reference builds ``norm = np.array([h, w]) / 10`` (NCHW shape[2:])
    and divides the (x, y) coordinate pairs by it — so x is normalized by
    the heatmap HEIGHT and y by the WIDTH. Reproduced deliberately for
    training-curve parity (this is only the train-time progress meter).
    """
    n, h, w, k = output_nhwc.shape
    pred, _ = get_max_preds_jax(output_nhwc)
    gt, _ = get_max_preds_jax(target_nhwc)
    norm = jnp.full((n, 2), jnp.array([h, w], jnp.float32) / 10.0)
    dists = calc_dists_jax(pred, gt, norm)                       # (K, N)
    per_joint = jnp.stack([dist_acc_jax(dists[i], thr) for i in range(k)])
    valid_joint = per_joint >= 0.0
    cnt = jnp.sum(valid_joint)
    avg = jnp.where(cnt > 0,
                    jnp.sum(jnp.where(valid_joint, per_joint, 0.0))
                    / jnp.maximum(cnt, 1), 0.0)
    return per_joint, avg, cnt, pred
