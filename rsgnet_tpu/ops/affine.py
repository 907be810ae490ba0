"""Affine-geometry core: center/scale/rot <-> 2x3 transforms, point mapping.

Reimplements the reference geometry contract (SURVEY.md §2.13,
``lib/utils/transforms.py`` in the HRNet-family layout):

- ``get_affine_transform(center, scale, rot, output_size, shift, inv)``
  builds the 2x3 matrix via the 3-point construction (center point, a point
  rotated ``rot`` degrees at half the box width above the center, and a third
  point at 90 degrees), with the HRNet ``pixel_std = 200`` convention
  (``scale`` is box-size / 200).
- ``affine_transform(pt, t)`` applies a 2x3 matrix to a point.
- ``transform_preds(coords, center, scale, output_size)`` maps heatmap-space
  peaks back to original-image coordinates using the inverse transform.

Everything here exists in two flavors:

- NumPy (fp32) — the host/oracle path, bit-compatible with the reference
  (cv2.getAffineTransform solves the same exact 3-point system).
- ``jax.numpy`` batched — traced into the on-device fused pipelines. These
  accept arrays with leading batch dims and are jit/vmap-friendly (no Python
  branching on traced values).

The coordinate path is kept in float32 throughout — AP parity is gated on
bit-for-bit coordinates (BASELINE.json:5).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PIXEL_STD = 200.0


# ---------------------------------------------------------------------------
# NumPy host/oracle implementations
# ---------------------------------------------------------------------------

def get_dir(src_point, rot_rad):
    """Rotate a 2-vector by ``rot_rad`` radians (reference `get_dir`)."""
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array(
        [src_point[0] * cs - src_point[1] * sn,
         src_point[0] * sn + src_point[1] * cs],
        dtype=np.float32,
    )


def get_3rd_point(a, b):
    """Third point completing a right angle at ``b`` (reference `get_3rd_point`)."""
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def _solve_affine(src, dst):
    """Exact 2x3 affine mapping src[i] -> dst[i] for 3 point pairs.

    Equivalent to cv2.getAffineTransform (solves the 6x6 linear system).
    """
    a = np.zeros((6, 6), dtype=np.float64)
    b = np.zeros((6,), dtype=np.float64)
    for i in range(3):
        a[2 * i, 0:2] = src[i]
        a[2 * i, 2] = 1.0
        a[2 * i + 1, 3:5] = src[i]
        a[2 * i + 1, 5] = 1.0
        b[2 * i] = dst[i][0]
        b[2 * i + 1] = dst[i][1]
    sol = np.linalg.solve(a, b)
    return sol.reshape(2, 3)


def get_affine_transform(center, scale, rot, output_size, shift=(0.0, 0.0), inv=0):
    """Build the 2x3 crop transform (reference `get_affine_transform`).

    Args:
      center: (2,) box center in source-image pixels.
      scale: (2,) box size / 200 (HRNet pixel_std convention). A scalar is
        promoted to an isotropic pair.
      rot: rotation in degrees.
      output_size: (w, h) of the destination crop.
      shift: fractional shift of the source box.
      inv: if nonzero, return the dst->src transform instead.

    Returns:
      float64 (2, 3) matrix mapping src->dst points (or dst->src if inv).
    """
    center = np.asarray(center, dtype=np.float32)
    scale = np.asarray(scale, dtype=np.float32)
    if scale.ndim == 0:
        scale = np.array([scale, scale], dtype=np.float32)
    shift = np.asarray(shift, dtype=np.float32)

    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[0]
    dst_w = float(output_size[0])
    dst_h = float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    src_dir = get_dir([0.0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0.0, dst_w * -0.5], dtype=np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5], dtype=np.float32) + dst_dir
    src[2, :] = get_3rd_point(src[0, :], src[1, :])
    dst[2, :] = get_3rd_point(dst[0, :], dst[1, :])

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def affine_transform(pt, t):
    """Apply a 2x3 transform to a single 2D point (reference `affine_transform`)."""
    new_pt = np.array([pt[0], pt[1], 1.0], dtype=np.float64)
    return (t @ new_pt)[:2]


def transform_preds(coords, center, scale, output_size):
    """Map heatmap-space coords to image space (reference `transform_preds`).

    coords: (K, 2) array of peak coordinates in heatmap pixels.
    """
    coords = np.asarray(coords)
    target = np.zeros_like(coords, dtype=np.float32)
    trans = get_affine_transform(center, scale, 0, output_size, inv=1)
    for p in range(coords.shape[0]):
        target[p, 0:2] = affine_transform(coords[p, 0:2], trans)
    return target


def box_to_center_scale(box, aspect_ratio, scale_padding=1.25):
    """COCO bbox [x, y, w, h] -> (center, scale) (reference `_box2cs`/`_xywh2cs`).

    Fixes aspect ratio to the model input's, divides by pixel_std = 200, and
    pads the box by ``scale_padding`` (1.25 for gt boxes in the reference).
    """
    x, y, w, h = box[:4]
    center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float32)
    if w > aspect_ratio * h:
        h = w * 1.0 / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / PIXEL_STD, h / PIXEL_STD], dtype=np.float32)
    if center[0] != -1:
        scale = scale * scale_padding
    return center, scale


# ---------------------------------------------------------------------------
# JAX batched implementations (device path)
# ---------------------------------------------------------------------------

def get_dir_jax(src_point, rot_rad):
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    return jnp.stack(
        [src_point[..., 0] * cs - src_point[..., 1] * sn,
         src_point[..., 0] * sn + src_point[..., 1] * cs],
        axis=-1,
    )


def _solve_affine_jax(src, dst):
    """Batched exact 3-point affine solve. src, dst: (..., 3, 2) -> (..., 2, 3)."""
    ones = jnp.ones(src.shape[:-1] + (1,), src.dtype)
    A = jnp.concatenate([src, ones], axis=-1)          # (..., 3, 3)
    # Solve A @ X = dst for X (3x2), transpose to (2, 3).
    X = jnp.linalg.solve(A, dst)
    return jnp.swapaxes(X, -1, -2)


def get_affine_transform_jax(center, scale, rot_deg, output_size,
                             shift=None, inv=False):
    """Batched 2x3 crop transforms on device.

    center: (..., 2); scale: (..., 2); rot_deg: (...,) degrees.
    output_size: static (w, h). Returns (..., 2, 3) float32.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot_deg = jnp.asarray(rot_deg, jnp.float32)
    if shift is None:
        shift = jnp.zeros_like(center)
    else:
        shift = jnp.asarray(shift, jnp.float32)

    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[..., 0]
    dst_w = float(output_size[0])
    dst_h = float(output_size[1])

    rot_rad = jnp.pi * rot_deg / 180.0
    src_point = jnp.stack(
        [jnp.zeros_like(src_w), src_w * -0.5], axis=-1)
    src_dir = get_dir_jax(src_point, rot_rad)
    dst_dir = jnp.broadcast_to(
        jnp.array([0.0, dst_w * -0.5], jnp.float32), src_dir.shape)

    src0 = center + scale_tmp * shift
    src1 = src0 + src_dir
    # third point: b + rot90(a - b)
    d_src = src0 - src1
    src2 = src1 + jnp.stack([-d_src[..., 1], d_src[..., 0]], axis=-1)

    dst0 = jnp.broadcast_to(
        jnp.array([dst_w * 0.5, dst_h * 0.5], jnp.float32), src0.shape)
    dst1 = dst0 + dst_dir
    d_dst = dst0 - dst1
    dst2 = dst1 + jnp.stack([-d_dst[..., 1], d_dst[..., 0]], axis=-1)

    src = jnp.stack([src0, src1, src2], axis=-2)   # (..., 3, 2)
    dst = jnp.stack([dst0, dst1, dst2], axis=-2)

    if inv:
        src, dst = dst, src
    return _solve_affine_jax(src, dst)


def affine_transform_jax(pts, t):
    """Apply 2x3 transforms to points. pts: (..., 2), t: (..., 2, 3).

    Precision.HIGHEST is REQUIRED: at the TPU default the einsum's bf16
    passes cost ~0.4% of the absolute coordinate (measured ~2.3 px at
    x~600 on chip vs 7e-5 at HIGHEST) — this op is the eval
    heatmap->image mapping, the exact path the bit-for-bit coordinate
    contract gates on (same reason separable_warp_batch pins it)."""
    pts = jnp.asarray(pts, jnp.float32)
    xy1 = jnp.concatenate([pts, jnp.ones(pts.shape[:-1] + (1,), pts.dtype)],
                          axis=-1)
    return jnp.einsum('...ij,...j->...i', t, xy1,
                      precision=jax.lax.Precision.HIGHEST)


def transform_preds_jax(coords, center, scale, output_size):
    """Batched heatmap->image mapping. coords: (..., K, 2); center/scale (..., 2)."""
    trans = get_affine_transform_jax(center, scale,
                                     jnp.zeros(jnp.asarray(center).shape[:-1]),
                                     output_size, inv=True)
    return affine_transform_jax(coords, trans[..., None, :, :])
