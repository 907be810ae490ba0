"""Batched on-device affine crop/warp — replaces ``cv2.warpAffine``.

The reference preprocessing (SURVEY.md §2.9, §3.4) does, per sample and on the
host CPU: ``get_affine_transform`` + ``cv2.warpAffine(img, trans, (W, H),
flags=INTER_LINEAR)``. Here the whole thing is a single gather-based bilinear
sampler traced under ``jit`` so the crop + resize + normalize pipeline runs on
device, batched, feeding the model at line rate (BASELINE.json:5).

cv2.warpAffine semantics reproduced:
- ``trans`` maps SRC -> DST points; the sampler therefore evaluates
  ``src_xy = inv(trans) @ (dst_x, dst_y, 1)`` per destination pixel.
- INTER_LINEAR bilinear interpolation on the 4 integer neighbors.
- BORDER_CONSTANT(0): out-of-bounds taps contribute 0.

Pixel-center convention: integer coordinates are sample positions (cv2 uses
``src_x = M00*x + M01*y + M02`` with x, y integer destination indices) — no
half-pixel offset, which matches cv2's warpAffine exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# resolve cv2 once: host_affine_crop sits in the loader hot loop, and a
# per-call failed ``import cv2`` costs a sys.path scan + caught ImportError
# per dataset sample when cv2 is absent (ADVICE round 3)
try:
    import cv2 as _cv2
except ImportError:      # pragma: no cover - image has cv2; keep the fallback
    _cv2 = None


def invert_affine(trans):
    """Invert 2x3 affine matrices. trans: (..., 2, 3) -> (..., 2, 3)."""
    a = trans[..., 0, 0]
    b = trans[..., 0, 1]
    c = trans[..., 0, 2]
    d = trans[..., 1, 0]
    e = trans[..., 1, 1]
    f = trans[..., 1, 2]
    det = a * e - b * d
    inv_det = 1.0 / det
    ia = e * inv_det
    ib = -b * inv_det
    id_ = -d * inv_det
    ie = a * inv_det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    row0 = jnp.stack([ia, ib, ic], axis=-1)
    row1 = jnp.stack([id_, ie, if_], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def affine_warp(image, trans, out_size):
    """Warp one image with a src->dst 2x3 transform (cv2.warpAffine semantics).

    Args:
      image: (H, W, C) float array.
      trans: (2, 3) src->dst affine matrix (as from ``get_affine_transform``).
      out_size: static (out_w, out_h).

    Returns:
      (out_h, out_w, C) warped image, zeros outside the source.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    inv = invert_affine(jnp.asarray(trans, jnp.float32))

    dst_x = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    dst_y = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    src_x = inv[0, 0] * dst_x + inv[0, 1] * dst_y + inv[0, 2]
    src_y = inv[1, 0] * dst_x + inv[1, 1] * dst_y + inv[1, 2]
    return _bilinear_gather(image, src_x, src_y)


def _bilinear_gather(image, src_x, src_y):
    """Bilinear sample ``image`` (H, W, C) at float coords; 0 outside.

    The gather reads the source in its stored dtype (uint8 sources move 4x
    less HBM/H2D traffic than pre-converted fp32) and casts taps afterward.
    """
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        vals = image[yc, xc].astype(jnp.float32)   # gather: (out_h, out_w, C)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def warp_affine_np(img, trans, out_size):
    """Host-side (pure NumPy, vectorized) ``cv2.warpAffine`` equivalent:
    INTER_LINEAR, constant-0 border — the same sampling semantics as
    ``affine_warp`` but with no device dispatch and no per-source-shape
    recompile, for host pipelines (data loading, serving preprocessing)
    where source frames arrive in arbitrary sizes.

    Args:
      img: (H, W, C) or (H, W) array, any real dtype.
      trans: (2, 3) src->dst affine matrix.
      out_size: (out_w, out_h).

    Returns:
      (out_h, out_w[, C]) float32 warped image, zeros outside the source.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    m = np.vstack([np.asarray(trans, np.float64), [0.0, 0.0, 1.0]])
    minv = np.linalg.inv(m)
    xs = np.arange(out_w, dtype=np.float64)[None, :]
    ys = np.arange(out_h, dtype=np.float64)[:, None]
    src_x = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    src_y = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    x0 = np.floor(src_x).astype(np.int64)
    y0 = np.floor(src_y).astype(np.int64)
    fx = (src_x - x0).astype(np.float32)
    fy = (src_y - y0).astype(np.float32)
    h, w = img.shape[:2]
    flat = np.ascontiguousarray(img, dtype=np.float32).reshape(h, w, -1)
    out = np.zeros((out_h, out_w, flat.shape[2]), np.float32)
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xi, yi = x0 + dx, y0 + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            vals = flat[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
            out += (wx * wy * valid)[..., None] * vals
    return out.reshape((out_h, out_w) + img.shape[2:])


def host_affine_crop(img, trans, out_size):
    """Crop/warp one host image to ``out_size`` for the reference-style host
    pipeline: cv2.warpAffine when cv2 is importable (bit-identical to the
    reference), else ``warp_affine_np`` (same INTER_LINEAR math; uint8
    results rounded like cv2's fixed-point path). uint8 in -> uint8 out;
    float in -> float32 out."""
    size = (int(out_size[0]), int(out_size[1]))
    if _cv2 is not None:
        return _cv2.warpAffine(img, np.asarray(trans, np.float64), size,
                               flags=_cv2.INTER_LINEAR)
    out = warp_affine_np(img, trans, size)
    if np.issubdtype(np.asarray(img).dtype, np.integer):
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out


def affine_warp_batch(images, trans, out_size):
    """vmap'd ``affine_warp``: images (N, H, W, C) any dtype, trans (N, 2, 3).
    Output is float32; uint8 sources are gathered as uint8 (see
    ``_bilinear_gather``)."""
    return jax.vmap(lambda im, t: affine_warp(im, t, out_size))(images, trans)


def _bilinear_resample_matrix(starts, steps, out_n, src_n):
    """Batched (out_n, src_n) bilinear row-weight matrices on device.

    Row i holds the two-tap bilinear weights for source coordinate
    ``starts + i * steps`` (per batch element): W[i, u] = max(0, 1 - |c_i - u|)
    for u in [0, src_n); coordinates outside the source get all-zero rows —
    BORDER_CONSTANT(0), identical to the gather sampler.
    """
    i = jax.lax.broadcasted_iota(jnp.float32, (out_n, src_n), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (out_n, src_n), 1)
    coords = starts[:, None, None] + i * steps[:, None, None]   # (B, O, S)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords - u))


def separable_warp_batch(images, trans, out_size):
    """Axis-separable affine warp for rotation-free transforms — two MXU
    matmuls instead of a 4-tap gather (SURVEY.md §7(7): the eval-path warp is
    gather-bound on TPU; rot=0 crops, i.e. ALL eval crops, are separable).

    Requires trans with zero cross terms (trans[:,0,1] == trans[:,1,0] == 0 —
    true for every ``get_affine_transform(center, scale, rot=0)``).
    images: (N, H, W, C) any dtype; returns (N, out_h, out_w, C) float32,
    numerically equal to ``affine_warp_batch`` up to matmul accumulation
    order.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    inv = invert_affine(jnp.asarray(trans, jnp.float32))
    # src_x = inv[0,0]*dst_x + inv[0,2];  src_y = inv[1,1]*dst_y + inv[1,2]
    src_h, src_w = images.shape[1], images.shape[2]
    wx = _bilinear_resample_matrix(inv[:, 0, 2], inv[:, 0, 0], out_w, src_w)
    wy = _bilinear_resample_matrix(inv[:, 1, 2], inv[:, 1, 1], out_h, src_h)
    img = jnp.asarray(images, jnp.float32)
    # (B, out_h, src_w, C) then (B, out_h, out_w, C); HIGHEST keeps the fp32
    # path exact enough that parity with the gather sampler is ~1e-3/255
    tmp = jnp.einsum("bhs,bswc->bhwc", wy, img,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bxw,bhwc->bhxc", wx, tmp,
                      precision=jax.lax.Precision.HIGHEST)


def resolve_train_warp(warp, mesh=None, name="TRAIN.WARP"):
    """Resolve a TRAIN.WARP value (incl. "auto") to a concrete sampler name.

    The single source of truth for the train-side option set — shared by
    ``data/augment.py`` and the profiling tools so the accepted values
    cannot drift between call sites.

    "auto" picks the fused Pallas kernel on the real TPU backend — the
    measured winner (BENCH_NOTES "fused Pallas shear warp", +24% full-step
    at B=128) — and the XLA shear path elsewhere. The kernel is
    partitioner-safe in EVERY calling convention: with a caller-threaded
    ``mesh=`` it is shard_map'd per shard, and with ``mesh=None`` on a
    multi-device host the ``custom_partitioning`` wrapper
    (``ops/pallas/shear_warp._partitioned_warp``) teaches the SPMD
    partitioner the op's layout, so a forgotten mesh can no longer cause
    the silent full-batch all-gather that motivated the old mesh gate.
    ``mesh`` is kept as a parameter for call-site symmetry but no longer
    affects the choice.
    """
    del mesh  # no longer gates "auto" — see docstring
    if warp == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "shear"
    if warp not in ("gather", "shear", "pallas"):
        raise ValueError(
            f"{name}={warp!r}: expected auto|pallas|shear|gather")
    return warp


def resolve_eval_warp(warp, name="warp"):
    """Resolve a TEST.WARP value (incl. "auto") to a concrete sampler name.

    "auto" resolves to "separable" on EVERY backend: the fused Pallas
    kernel wins the warp in isolation but loses the e2e composition (XLA
    overlaps the separable stages with the flip-test forwards; the opaque
    kernel serializes — measured 1934-1952 vs 1781-1800 img/s @B=128,
    tools/profile_eval_warp.py). Kept as an explicit option and as the
    symmetric API to TRAIN.WARP, where the conclusion is the opposite.
    """
    if warp == "auto":
        return "separable"
    if warp not in ("gather", "separable", "shear", "pallas"):
        raise ValueError(f"{name}={warp!r}: expected "
                         "auto|separable|shear|pallas|gather")
    return warp


# ImageNet normalization constants used by the whole HRNet family (RGB).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(image, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """(pix/255 - mean) / std, channels-last. Fused into the warp under jit."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (image / 255.0 - mean) / std


def crop_and_normalize(images, trans, out_size, flip=None, separable=False,
                       warp=None, mesh=None, data_axis="data"):
    """The fused preprocessing kernel: warp -> (optional hflip) -> normalize.

    Args:
      images: (N, H, W, 3) uint8/float source images (padded to a common size).
      trans: (N, 2, 3) src->dst transforms.
      out_size: static (out_w, out_h) model input size.
      flip: optional (N,) bool — horizontally flip the *cropped* output.
        (Training flips are folded into ``trans`` instead; this flag serves
        flip-test inference where the unflipped crop is also needed.)
      separable: use the MXU matmul sampler — valid ONLY for rotation-free
        transforms (all eval crops); much faster than the gather on TPU.
      warp: explicit sampler choice overriding ``separable``: any TEST.WARP
        value — "auto" | "gather" | "separable" | "shear" | "pallas"
        (resolved via ``resolve_eval_warp``). "shear"/"pallas" require a
        square source and fall back to "separable" otherwise (both are
        exact-footprint at rot=0, the only case eval produces).
      mesh/data_axis: optional explicit data mesh for the "pallas" sampler
        (shard_maps the kernel per shard). With mesh=None the sampler is
        still SPMD-safe on multi-device hosts via its custom_partitioning
        wrapper; see ``shear_warp_pallas_dp``.

    Returns:
      (N, out_h, out_w, 3) float32 normalized inputs.
    """
    if warp is None:
        warp = "separable" if separable else "gather"
    else:
        warp = resolve_eval_warp(warp)
    if warp in ("shear", "pallas") and images.shape[1] != images.shape[2]:
        warp = "separable"      # the shear decomposition needs a square src
    if warp == "pallas":
        from rsgnet_tpu.ops.pallas.shear_warp import shear_warp_pallas_dp
        crops = shear_warp_pallas_dp(jnp.asarray(images), trans,
                                     tuple(out_size), mesh=mesh,
                                     axis=data_axis)
    elif warp == "shear":
        from rsgnet_tpu.ops.shear_warp import shear_warp_batch
        crops = shear_warp_batch(jnp.asarray(images), trans, out_size)
    elif warp == "separable":
        crops = separable_warp_batch(jnp.asarray(images), trans, out_size)
    else:                       # "gather" — resolve_eval_warp validated
        crops = affine_warp_batch(jnp.asarray(images), trans, out_size)
    if flip is not None:
        flipped = crops[:, :, ::-1, :]
        crops = jnp.where(flip[:, None, None, None], flipped, crops)
    return normalize_image(crops)
