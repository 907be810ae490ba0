"""Fused DARK sub-pixel decode as a Pallas TPU kernel.

The eval hot path's decode (SURVEY.md §2.15 / §7(7): "Pallas kernels where
XLA fusion falls short (… DARK blur+Taylor)") chains, per heatmap: separable
Gaussian blur -> per-map max renormalization -> clip+log -> argmax -> 10-tap
gather -> 2x2 Newton step. Under plain XLA that is several HBM round trips
over the (N, K, H, W) tensor (conv, reductions, gathers compile to separate
fusions). This kernel does ONE pass: each grid cell pulls one heatmap into
VMEM and produces the refined coordinate + peak value without touching HBM
again.

Grid: one program per (sample, joint) map. Shifting for the separable blur
uses ``pltpu.roll`` + column/row-index masks (zero-fill semantics identical
to the zero-padded blur the DARK procedure uses — see
ops/decode.dark_gaussian_blur_jax and its cv2 parity test).

``dark_decode_pallas(heatmaps_nhwc, blur_kernel)`` returns (coords, maxvals)
with coords already Taylor-refined, matching
``get_max_preds_jax`` + ``dark_refine_jax`` bit-for-bit in interpret mode
(float-associativity differences on real hardware are below coordinate
tolerance; see tests/test_pallas_dark.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsgnet_tpu.ops.decode import _cv2_gaussian_kernel_1d


def _masked_roll(x, d, axis, size):
    """Shift with zero fill: out[i] = x[i - d] where valid, else 0."""
    rolled = pltpu.roll(x, shift=d % size, axis=axis)   # roll is circular;
    # pltpu.roll rejects negative shifts, d % size is the same rotation
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    valid = (idx - d >= 0) & (idx - d < size)
    return jnp.where(valid, rolled, 0.0)


def _kernel(hm_ref, coords_ref, maxval_ref, *, k1d, h, w):
    hm = hm_ref[0]                                   # (H, W)

    # original-map peak: first-match argmax (np.argmax tie semantics)
    flat_idx = jnp.argmax(hm.reshape(-1))
    maxv = jnp.max(hm)
    px0 = (flat_idx % w).astype(jnp.int32)
    py0 = (flat_idx // w).astype(jnp.int32)

    # separable zero-fill Gaussian blur in VMEM
    r = (len(k1d) - 1) // 2
    acc = jnp.zeros_like(hm)
    for d in range(-r, r + 1):
        acc = acc + float(k1d[d + r]) * _masked_roll(hm, d, 1, w)
    out = jnp.zeros_like(hm)
    for d in range(-r, r + 1):
        out = out + float(k1d[d + r]) * _masked_roll(acc, d, 0, h)
    # per-map max renormalization (DARK modulation)
    out = out * (maxv / jnp.maximum(jnp.max(out), 1e-20))
    lg = jnp.log(jnp.clip(out, 1e-10, 50.0))

    # 10-tap neighborhood reads (scalar loads at dynamic indices)
    def tap(dy, dx):
        yy = jnp.clip(py0 + dy, 0, h - 1)
        xx = jnp.clip(px0 + dx, 0, w - 1)
        return jax.lax.dynamic_slice(lg, (yy, xx), (1, 1))[0, 0]

    dx = 0.5 * (tap(0, 1) - tap(0, -1))
    dy = 0.5 * (tap(1, 0) - tap(-1, 0))
    cval = tap(0, 0)
    dxx = 0.25 * (tap(0, 2) - 2.0 * cval + tap(0, -2))
    dyy = 0.25 * (tap(2, 0) - 2.0 * cval + tap(-2, 0))
    dxy = 0.25 * (tap(1, 1) - tap(-1, 1) - tap(1, -1) + tap(-1, -1))

    det = dxx * dyy - dxy * dxy
    ok = ((px0 > 1) & (px0 < w - 2) & (py0 > 1) & (py0 < h - 2)
          & (det != 0.0))
    inv_det = jnp.where(det == 0.0, 0.0, 1.0 / det)
    off_x = -(dyy * dx - dxy * dy) * inv_det
    off_y = -(-dxy * dx + dxx * dy) * inv_det
    okf = ok.astype(jnp.float32)

    # reference get_max_preds zeroes coords where maxval <= 0
    alive = (maxv > 0.0).astype(jnp.float32)
    coords_ref[0, 0] = (px0.astype(jnp.float32) + off_x * okf) * alive
    coords_ref[0, 1] = (py0.astype(jnp.float32) + off_y * okf) * alive
    maxval_ref[0, 0] = maxv


@functools.partial(jax.jit, static_argnames=("blur_kernel", "interpret"))
def dark_decode_pallas(heatmaps_nhwc, blur_kernel: int = 11,
                       interpret: bool = False):
    """Fused DARK decode. heatmaps_nhwc: (N, H, W, K) fp32.

    Returns (coords (N, K, 2) heatmap-space xy, maxvals (N, K, 1)).
    """
    n, h, w, k = heatmaps_nhwc.shape
    maps = jnp.transpose(heatmaps_nhwc, (0, 3, 1, 2)).reshape(n * k, h, w)
    k1d = _cv2_gaussian_kernel_1d(blur_kernel)
    kernel = functools.partial(_kernel, k1d=np.asarray(k1d, np.float64),
                               h=h, w=w)
    coords, maxvals = pl.pallas_call(
        kernel,
        grid=(n * k,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 2), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n * k, 2), jnp.float32),
                   jax.ShapeDtypeStruct((n * k, 1), jnp.float32)),
        interpret=interpret,
    )(maps)
    return coords.reshape(n, k, 2), maxvals.reshape(n, k, 1)
