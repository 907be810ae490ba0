"""Gaussian heatmap target generation — fused, batched, on device.

Reimplements the reference ``JointsDataset.generate_target`` contract
(SURVEY.md §2.9): for each joint, a 2D Gaussian with standard deviation
``sigma`` is stamped on the HEATMAP_SIZE grid, centered at the *integer*
heatmap cell ``mu = int(joint / feat_stride + 0.5)``; joints whose 3-sigma
window falls entirely outside the grid get ``target_weight = 0``; visibility
weights come from ``joints_vis``.

The reference pastes a precomputed (6*sigma+1)^2 patch with NumPy slicing per
joint on the host. On TPU we evaluate the Gaussian directly on the full grid
(one fused VPU expression over (N, K, H, W)) — exactly equal to the pasted
patch because the patch itself is ``exp(-((x-x0)^2+(y-y0)^2)/(2 sigma^2))``
evaluated at integer offsets, and values beyond the 3-sigma window that the
reference truncates to zero are masked the same way here.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def generate_target_np(joints, joints_vis, heatmap_size, image_size, sigma,
                       use_different_joints_weight=False, joints_weight=None):
    """NumPy oracle, mirroring the reference implementation structure.

    joints: (K, 3) in input-image pixels; joints_vis: (K, 3).
    heatmap_size/image_size: (w, h).
    Returns: target (K, Hh, Hw) float32, target_weight (K, 1).
    """
    num_joints = joints.shape[0]
    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_vis[:, 0]
    target = np.zeros((num_joints, heatmap_size[1], heatmap_size[0]),
                      dtype=np.float32)
    tmp_size = sigma * 3
    feat_stride = (np.asarray(image_size, np.float32)
                   / np.asarray(heatmap_size, np.float32))
    for j in range(num_joints):
        mu_x = int(joints[j][0] / feat_stride[0] + 0.5)
        mu_y = int(joints[j][1] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if (ul[0] >= heatmap_size[0] or ul[1] >= heatmap_size[1]
                or br[0] < 0 or br[1] < 0):
            target_weight[j] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], heatmap_size[0]) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], heatmap_size[1]) - ul[1]
        img_x = max(0, ul[0]), min(br[0], heatmap_size[0])
        img_y = max(0, ul[1]), min(br[1], heatmap_size[1])
        if target_weight[j] > 0.5:
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    if use_different_joints_weight and joints_weight is not None:
        target_weight = np.multiply(target_weight, joints_weight)
    return target, target_weight


def generate_target_jax(joints, joints_vis, heatmap_size, image_size, sigma,
                        joints_weight=None):
    """Fused on-device target generation (batched over any leading dims).

    Args:
      joints: (..., K, 2) joint coordinates in input-image pixels.
      joints_vis: (..., K) visibility weight (the reference's joints_vis[:, 0]).
      heatmap_size: static (w, h); image_size: static (w, h); sigma: static.
      joints_weight: optional (K,) per-joint loss weights.

    Returns:
      target: (..., Hh, Hw, K) float32 heatmaps (NHWC to match the model).
      target_weight: (..., K) float32.
    """
    hw, hh = int(heatmap_size[0]), int(heatmap_size[1])
    iw, ih = float(image_size[0]), float(image_size[1])
    tmp_size = sigma * 3

    joints = jnp.asarray(joints, jnp.float32)
    stride = jnp.array([iw / hw, ih / hh], jnp.float32)
    # reference: int(x/stride + 0.5) — floor for non-negative, trunc otherwise.
    mu = joints[..., :2] / stride + 0.5
    mu = jnp.trunc(mu).astype(jnp.int32)             # python int() truncates
    mu_x, mu_y = mu[..., 0], mu[..., 1]

    # in-bounds check on the 3-sigma window (reference sets weight 0 outside)
    ul_x, ul_y = mu_x - tmp_size, mu_y - tmp_size
    br_x, br_y = mu_x + tmp_size + 1, mu_y + tmp_size + 1
    inside = ((ul_x < hw) & (ul_y < hh) & (br_x >= 0) & (br_y >= 0))
    weight = jnp.asarray(joints_vis, jnp.float32) * inside.astype(jnp.float32)

    xs = jnp.arange(hw, dtype=jnp.float32)
    ys = jnp.arange(hh, dtype=jnp.float32)
    dx2 = (xs - mu_x[..., None].astype(jnp.float32)) ** 2    # (..., K, Hw)
    dy2 = (ys - mu_y[..., None].astype(jnp.float32)) ** 2    # (..., K, Hh)
    g = jnp.exp(-(dy2[..., :, None] + dx2[..., None, :]) / (2 * sigma ** 2))
    # truncate outside the window like the pasted patch does
    in_win = ((jnp.abs(xs - mu_x[..., None]) <= tmp_size)[..., None, :]
              & (jnp.abs(ys - mu_y[..., None]) <= tmp_size)[..., :, None])
    g = jnp.where(in_win, g, 0.0)
    # zero map when the joint's weight gate fails (reference skips the paste)
    g = g * (weight[..., None, None] > 0.5).astype(jnp.float32)
    target = jnp.moveaxis(g, -3, -1)                  # (..., Hh, Hw, K)

    if joints_weight is not None:
        weight = weight * jnp.asarray(joints_weight, jnp.float32)
    return target, weight
