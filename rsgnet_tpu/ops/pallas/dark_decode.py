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


MAPS_PER_PROGRAM = 8     # sublane-aligned output rows per grid cell


def _kernel(hm_ref, out_ref, *, k1d, h, w):
    """Processes MAPS_PER_PROGRAM heatmaps; out block (8, 128) rows are
    [x, y, maxval, 0, ...] per map (lane-padded to Mosaic's tile width)."""
    r = (len(k1d) - 1) // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    for m in range(MAPS_PER_PROGRAM):
        hm = hm_ref[m]                               # (H, W)

        # original-map peak: first-match argmax (np.argmax tie semantics)
        # without the flat reshape Mosaic can't lower: min row-major index
        # among the cells equal to the max
        maxv = jnp.max(hm)
        flat_grid = rows * w + cols
        flat_idx = jnp.min(jnp.where(hm == maxv, flat_grid, h * w))
        px0 = (flat_idx % w).astype(jnp.int32)
        py0 = (flat_idx // w).astype(jnp.int32)

        # separable zero-fill Gaussian blur in VMEM
        acc = jnp.zeros_like(hm)
        for d in range(-r, r + 1):
            acc = acc + float(k1d[d + r]) * _masked_roll(hm, d, 1, w)
        out = jnp.zeros_like(hm)
        for d in range(-r, r + 1):
            out = out + float(k1d[d + r]) * _masked_roll(acc, d, 0, h)
        # per-map max renormalization (DARK modulation)
        out = out * (maxv / jnp.maximum(jnp.max(out), 1e-20))
        lg = jnp.log(jnp.clip(out, 1e-10, 50.0))

        # 10-tap neighborhood reads as masked reductions (Mosaic has no
        # dynamic_slice on values; a one-hot reduction is VPU-trivial here)
        def tap(dy, dx):
            yy = jnp.clip(py0 + dy, 0, h - 1)
            xx = jnp.clip(px0 + dx, 0, w - 1)
            return jnp.sum(jnp.where((rows == yy) & (cols == xx), lg, 0.0))

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
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, (px0.astype(jnp.float32) + off_x * okf) * alive,
            jnp.where(lane == 1,
                      (py0.astype(jnp.float32) + off_y * okf) * alive,
                      jnp.where(lane == 2, maxv, 0.0)))
        out_ref[m, :] = row[0]


@functools.partial(jax.jit, static_argnames=("blur_kernel", "interpret"))
def dark_decode_pallas(heatmaps_nhwc, blur_kernel: int = 11,
                       interpret: bool = False):
    """Fused DARK decode. heatmaps_nhwc: (N, H, W, K) fp32.

    Returns (coords (N, K, 2) heatmap-space xy, maxvals (N, K, 1)).
    """
    n, h, w, k = heatmaps_nhwc.shape
    maps = jnp.transpose(heatmaps_nhwc, (0, 3, 1, 2)).reshape(n * k, h, w)
    # pad the map count to a full final program (zero maps decode to zeros)
    mp = MAPS_PER_PROGRAM
    total = ((n * k + mp - 1) // mp) * mp
    if total != n * k:
        maps = jnp.pad(maps, ((0, total - n * k), (0, 0), (0, 0)))
    k1d = _cv2_gaussian_kernel_1d(blur_kernel)
    kernel = functools.partial(_kernel, k1d=np.asarray(k1d, np.float64),
                               h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(total // mp,),
        in_specs=[pl.BlockSpec((mp, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((mp, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 128), jnp.float32),
        interpret=interpret,
    )(maps)
    out = out[:n * k]
    return out[:, :2].reshape(n, k, 2), out[:, 2:3].reshape(n, k, 1)


@functools.lru_cache(maxsize=None)
def _partitioned_decode(blur_kernel, interpret):
    """``dark_decode_pallas`` wrapped in ``custom_partitioning`` — the same
    treatment as the fused shear warp (ops/pallas/shear_warp.py
    ::_partitioned_warp): batch and joint dims passthrough, spatial dims
    replicated. The sharded call runs per shard with zero collectives,
    matching the unsharded kernel to fp32-rounding order (per-shard
    compilation fuses independently — tests/test_pallas_dark.py). Shared
    machinery: ops/pallas/partitioning.py."""
    from rsgnet_tpu.ops.pallas.partitioning import make_partitioned

    return make_partitioned(
        lambda heatmaps: dark_decode_pallas(heatmaps, blur_kernel,
                                            interpret),
        rule="b h w k -> b k i, b k j",
        need_replication=("h", "w", "i", "j"),
    )


def dark_decode_pallas_spmd(heatmaps_nhwc, blur_kernel: int = 11,
                            interpret: bool = False):
    """SPMD-safe entry for the fused DARK decode: on a multi-device host
    routes through the ``custom_partitioning`` wrapper so batch-sharded
    eval stays per-shard; single-device hosts run the raw kernel (the
    exact program the bench measures)."""
    if jax.device_count() > 1:
        return _partitioned_decode(int(blur_kernel), bool(interpret))(
            heatmaps_nhwc)
    return dark_decode_pallas(heatmaps_nhwc, blur_kernel, interpret)
