"""Heatmap decoding: argmax peaks, quarter-pixel shift, and DARK sub-pixel.

Reimplements the reference ``lib/core/inference.py`` contract (SURVEY.md
§2.15) as fully-batched device code — no per-joint Python loops:

- ``get_max_preds``: per-map argmax over the flattened heatmap (first-match
  tie-breaking, identical to ``np.argmax``), coords ``(x, y) = (idx % W,
  idx // W)``, zeroed where ``maxval <= 0``.
- POST_PROCESS quarter-offset: shift each peak 0.25 px toward the larger of
  its two neighbors on each axis (only when ``1 < p < size - 1``).
- DARK decode (Gaussian-blur + log + second-order Taylor expansion at the
  integer peak), matching DarkPose: modulate with a cv2-style Gaussian blur
  (sigma derived from kernel size the way ``cv2.GaussianBlur(..., 0)`` does,
  zero-padded borders, per-map max renormalization), ``clip(1e-10, 50)`` +
  ``log``, then the Newton step ``-H^{-1} grad`` (applied only when
  ``1 < p < size - 2`` and the Hessian is invertible).

Heatmaps here are NHWC ``(N, H, W, K)`` (the model's native layout); decode
transposes to ``(N, K, H, W)`` internally — the tensors are tiny (64x48).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rsgnet_tpu.ops.affine import transform_preds_jax


def get_max_preds_jax(heatmaps_nhwc):
    """Batched argmax decode. Returns coords (N, K, 2) xy float32, maxvals (N, K, 1)."""
    n, h, w, k = heatmaps_nhwc.shape
    hm = jnp.transpose(heatmaps_nhwc, (0, 3, 1, 2)).reshape(n, k, h * w)
    idx = jnp.argmax(hm, axis=2)
    maxvals = jnp.max(hm, axis=2, keepdims=True)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)       # reference tiles (1,1,2)
    return preds * mask, maxvals


def _gather_nk(hm_nkhw, py, px):
    """Gather hm[n, k, py[n,k], px[n,k]] -> (N, K). Out-of-range clamped."""
    n, k, h, w = hm_nkhw.shape
    pyc = jnp.clip(py, 0, h - 1)
    pxc = jnp.clip(px, 0, w - 1)
    flat = hm_nkhw.reshape(n, k, h * w)
    lin = pyc * w + pxc
    return jnp.take_along_axis(flat, lin[..., None], axis=2)[..., 0]


def quarter_offset_jax(heatmaps_nhwc, coords):
    """The reference POST_PROCESS: +-0.25 px toward the larger neighbor."""
    n, h, w, k = heatmaps_nhwc.shape
    hm = jnp.transpose(heatmaps_nhwc, (0, 3, 1, 2))
    # reference: px = int(floor(coords[0] + 0.5)) on already-integer coords
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    diff_x = _gather_nk(hm, py, px + 1) - _gather_nk(hm, py, px - 1)
    diff_y = _gather_nk(hm, py + 1, px) - _gather_nk(hm, py - 1, px)
    delta = jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1) * 0.25
    return coords + delta * ok[..., None].astype(jnp.float32)


# cv2.getGaussianKernel(ksize, sigma<=0) does NOT use the sigma formula for
# small kernels: ksize 1/3/5/7 come from fixed binomial-style tables
# (OpenCV's small_gaussian_tab). DARK configs commonly use BLUR_KERNEL in
# that range at small heatmap sizes, so parity requires the tables.
_CV2_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125,
                 0.21875, 0.109375, 0.03125], np.float32),
}


def _cv2_gaussian_kernel_1d(ksize):
    """cv2.getGaussianKernel(ksize, sigma=0) coefficients (incl. the fixed
    small-kernel tables cv2 substitutes below ksize 9)."""
    if ksize in _CV2_SMALL_GAUSSIAN_TAB:
        return _CV2_SMALL_GAUSSIAN_TAB[ksize]
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def dark_gaussian_blur_jax(heatmaps_nhwc, kernel):
    """DARK's modulation blur: zero-pad separable Gaussian + per-map max rescale."""
    k1d = jnp.asarray(_cv2_gaussian_kernel_1d(kernel))
    n, h, w, kk = heatmaps_nhwc.shape
    origin_max = jnp.max(heatmaps_nhwc, axis=(1, 2), keepdims=True)
    x = jnp.transpose(heatmaps_nhwc, (0, 3, 1, 2)).reshape(n * kk, 1, h, w)
    pad = (kernel - 1) // 2
    # separable conv, zero padding (the DARK code zero-pads then blurs)
    kx = k1d.reshape(1, 1, 1, kernel)
    ky = k1d.reshape(1, 1, kernel, 1)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (pad, pad)])
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(pad, pad), (0, 0)])
    x = jnp.transpose(x.reshape(n, kk, h, w), (0, 2, 3, 1))
    new_max = jnp.max(x, axis=(1, 2), keepdims=True)
    return x * (origin_max / jnp.maximum(new_max, 1e-20))


def dark_refine_jax(heatmaps_nhwc, coords, blur_kernel=11):
    """DARK Taylor refinement of integer peaks (batched Newton step)."""
    n, h, w, k = heatmaps_nhwc.shape
    hm = dark_gaussian_blur_jax(heatmaps_nhwc, blur_kernel)
    hm = jnp.log(jnp.clip(hm, 1e-10, 50.0))
    hm = jnp.transpose(hm, (0, 3, 1, 2))             # (N, K, H, W)

    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)
    ok = (px > 1) & (px < w - 2) & (py > 1) & (py < h - 2)

    g = lambda dy, dx: _gather_nk(hm, py + dy, px + dx)
    dx = 0.5 * (g(0, 1) - g(0, -1))
    dy = 0.5 * (g(1, 0) - g(-1, 0))
    c = g(0, 0)
    dxx = 0.25 * (g(0, 2) - 2.0 * c + g(0, -2))
    dyy = 0.25 * (g(2, 0) - 2.0 * c + g(-2, 0))
    dxy = 0.25 * (g(1, 1) - g(-1, 1) - g(1, -1) + g(-1, -1))

    det = dxx * dyy - dxy * dxy
    ok = ok & (det != 0.0)
    inv_det = jnp.where(det == 0.0, 0.0, 1.0 / det)
    # offset = -H^{-1} @ [dx, dy]
    off_x = -(dyy * dx - dxy * dy) * inv_det
    off_y = -(-dxy * dx + dxx * dy) * inv_det
    offset = jnp.stack([off_x, off_y], axis=-1)
    return coords + offset * ok[..., None].astype(jnp.float32)


def get_final_preds_jax(heatmaps_nhwc, center, scale, *,
                        post_process=True, use_dark=False, blur_kernel=11,
                        use_pallas=False):
    """Full decode: peaks -> sub-pixel refinement -> image coordinates.

    Mirrors the reference ``get_final_preds`` (SURVEY.md §3.2): DARK replaces
    the quarter-offset when enabled. center/scale: (N, 2).
    ``use_pallas`` routes the DARK path through the fused single-HBM-pass
    Pallas kernel (ops/pallas/dark_decode.py).

    Returns preds (N, K, 2) in original-image coords and maxvals (N, K, 1).
    """
    # reference get_final_preds applies ANY sub-pixel refinement (DARK or
    # quarter-offset) only under TEST.POST_PROCESS; post_process=False is
    # the raw-argmax ablation and must bypass DARK too
    use_dark = use_dark and post_process
    if use_dark and use_pallas:
        from rsgnet_tpu.ops.pallas import dark_decode_pallas_spmd
        # Mosaic compiles on TPU backends (incl. tunneled ones, e.g. 'axon');
        # the CPU backend runs the kernel in interpret mode (bit-identical,
        # slower — tests/CPU CI). The _spmd entry keeps batch-sharded eval
        # per-shard on multi-device hosts (custom_partitioning wrapper).
        interpret = jax.default_backend() == "cpu"
        coords, maxvals = dark_decode_pallas_spmd(heatmaps_nhwc,
                                                  blur_kernel=blur_kernel,
                                                  interpret=interpret)
    else:
        coords, maxvals = get_max_preds_jax(heatmaps_nhwc)
        if use_dark:
            coords = dark_refine_jax(heatmaps_nhwc, coords, blur_kernel)
        elif post_process:
            coords = quarter_offset_jax(heatmaps_nhwc, coords)
    h, w = heatmaps_nhwc.shape[1], heatmaps_nhwc.shape[2]
    preds = transform_preds_jax(coords, center, scale, (w, h))
    return preds, maxvals
