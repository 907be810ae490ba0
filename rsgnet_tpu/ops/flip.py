"""Horizontal-flip utilities for joints and heatmaps (reference §2.13).

Reimplements ``fliplr_joints`` and ``flip_back`` from the reference
``lib/utils/transforms.py`` contract (SURVEY.md §2.13):

- ``fliplr_joints(joints, joints_vis, width, matched_parts)``: mirror joint x
  (``x -> width - 1 - x``) then swap each left/right pair (both coords and
  visibility).
- ``flip_back(heatmaps, matched_parts)``: flip heatmaps along the x axis and
  swap left/right channel pairs — used by flip-test averaging (§3.2).

Device versions operate on NHWC heatmaps (N, H, W, K) and are pure gathers, so
XLA fuses them into the surrounding flip-test arithmetic.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def flip_pair_permutation(num_joints, matched_parts):
    """Channel permutation equivalent to swapping matched (left, right) pairs."""
    perm = np.arange(num_joints)
    for a, b in matched_parts:
        perm[a], perm[b] = perm[b], perm[a]
    return perm


def fliplr_joints(joints, joints_vis, width, matched_parts):
    """NumPy host version (reference `fliplr_joints`).

    joints, joints_vis: (K, 3). Returns (joints * joints_vis, joints_vis)
    exactly as the reference does (zeroing out invisible joints).
    """
    joints = np.array(joints, dtype=np.float32)
    joints_vis = np.array(joints_vis, dtype=np.float32)
    joints[:, 0] = width - joints[:, 0] - 1
    for a, b in matched_parts:
        joints[[a, b]] = joints[[b, a]]
        joints_vis[[a, b]] = joints_vis[[b, a]]
    return joints * joints_vis, joints_vis


def fliplr_joints_jax(joints, joints_vis, width, perm):
    """Batched device version. joints: (..., K, 2), perm: (K,) int array.

    Matches the reference: mirrors x, swaps pairs, and zeroes coordinates of
    invisible joints (the reference multiplies ``joints * joints_vis``).
    """
    joints = jnp.asarray(joints, jnp.float32)
    x = width - joints[..., 0] - 1.0
    joints = jnp.concatenate([x[..., None], joints[..., 1:]], axis=-1)
    joints = jnp.take(joints, perm, axis=-2)
    joints_vis = jnp.take(joints_vis, perm, axis=-2)
    return joints * joints_vis[..., :1], joints_vis


def flip_back_jax(heatmaps, perm, shift=False):
    """Flip-test heatmap un-flip (reference `flip_back` + SHIFT_HEATMAP).

    Args:
      heatmaps: (N, H, W, K) output of the model on the flipped input.
      perm: (K,) left/right channel permutation.
      shift: if True, apply the reference's SHIFT_HEATMAP quirk — shift the
        un-flipped heatmap one pixel to the right (col j takes col j-1,
        col 0 keeps its value), compensating the half-pixel flip asymmetry.

    Returns:
      (N, H, W, K) heatmaps aligned with the unflipped output.
    """
    hm = heatmaps[:, :, ::-1, :]
    hm = jnp.take(hm, perm, axis=-1)
    if shift:
        # reference: output_flipped[:, :, :, 1:] = output_flipped[:, :, :, 0:-1]
        # (NCHW, last axis = x). In NHWC the x axis is 2.
        hm = jnp.concatenate([hm[:, :, :1, :], hm[:, :, :-1, :]], axis=2)
    return hm
