"""Roll-decomposed affine warp — the train-aug rotation warp without gathers.

Motivation (BENCH_NOTES.md round-2 dissection): every XLA gather formulation
of the train-time rotation warp runs at ~1 element/cycle on TPU (~129 ms for
B=64 from 640^2 canvases), and it is OUTPUT-bound — shrinking the source does
not help. This module reformulates the exact same bilinear affine warp
(cv2.warpAffine semantics, BORDER_CONSTANT(0), the contract of
``ops.warp.affine_warp_batch``) as gather-free TPU primitives:

Catmull–Smith two-pass decomposition. With ``M = inv(trans)`` mapping dst
(x, y) -> src (u, v):

  u(x, y) = m00 x + m01 y + m02         (source column)
  v(x, y) = m10 x + m11 y + m12         (source row)

Pass A resamples every source row r along u at the positions where the dst
column x's pre-image crosses that row:  substituting y = (r - m12 - m10 x)/m11
into u gives  U(x, r) = A x + (B r + C)  with

  A = m00 - m01 m10 / m11,   B = m01 / m11,   C = m02 - m01 m12 / m11.

Pass B then resamples the intermediate's rows at V(y, x) = (m11 y + m12)
+ m10 x.  Both passes have the same structure — a per-line REAL sampling
position that splits into a shared-scale term (p) and a per-line shift (s):

  position = p + s,   p per output column (pass A) / row (pass B),
                      s per source row (pass A) / output column (pass B).

Each pass is computed exactly with:
  1. integer part of s: circular roll by ``floor(s) mod S`` implemented as
     ~log2(S) static ``jnp.roll`` + per-line ``where`` stages (bit
     decomposition) — pure slices/concats/selects, no gather;
  2. the three integer taps floor(p)+{0,1,2} via batched ONE-HOT einsums
     (MXU) on the rolled array;
  3. exact bilinear weights from phi = frac(p) + frac(s):
        w0 = relu(1-phi), w2 = relu(phi-1), w1 = 1 - w0 - w2
     (phi < 1 lands in [floor(U), floor(U)+1]; phi >= 1 in the next cell);
  4. per-tap validity masks on the TRUE source index
     floor(p) + floor(s) + j (BORDER_CONSTANT semantics, identical to the
     gather sampler's per-tap masking).

FILTERING SEMANTICS (honest contract): the geometric MAP is exact — every
output pixel is interpolated at exactly its cv2 source position, and the
joint/label transform is untouched. The interpolation FOOTPRINT, however, is
the classic two-pass one: pass B blends rows that pass A sampled at slightly
sheared u positions (offset B*frac(v)), i.e. bilinear on a SHEARED lattice
rather than the axis-aligned square. Consequences, validated in
tests/test_shear_warp.py:
  - rot == 0, +-90, and flips: identical to ``affine_warp_batch`` within
    ~2e-5 absolute (0-255 scale) — the bf16x3 selection decomposition's
    reconstruction bound; 8-bit sources select exactly;
  - intermediate angles: mean |err| ~0.05-0.3 (0-255 scale) on smooth
    images, larger only where the footprint crosses the zero border
    (cv2's own border feather composes per-pass there).
This is used for TRAINING augmentation only (TRAIN.WARP="shear"); the eval
coordinate path keeps the exact separable warp (rot=0) so bit-for-bit eval
parity (SURVEY.md §7 hard-part 1) is unaffected.

Degeneracy: pass A divides by m11; when |m11| < |m10| (rotations beyond
~45deg) the sample is computed in the TRANSPOSED source frame instead —
swap the rows of M and the source's spatial axes, which is exact and keeps
all shears bounded. Requires a square source (the training canvas is).

Reference parity contract: SURVEY.md §2.13 / §2.9 (cv2.warpAffine INTER_LINEAR
+ BORDER_CONSTANT(0)); replaces the gather in ``data.augment.augment_batch``
when ``TRAIN.WARP == "shear"``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rsgnet_tpu.ops.warp import invert_affine


def _roll_by_bits(x, k, axis, size):
    """Circular-roll ``x`` LEFT along ``axis`` by per-line amounts ``k``.

    k: int32 in [0, size) with shape broadcastable to x's batch/line dims
    (pre-expanded by the caller to x.ndim). Implemented as ceil(log2(size))
    static-roll + select stages — no gather.
    """
    b = 0
    while (1 << b) < size:
        amt = 1 << b
        bit = ((k >> b) & 1).astype(bool)
        x = jnp.where(bit, jnp.roll(x, -amt, axis=axis), x)
        b += 1
    return x


def _tap_weights(fp, fs):
    """Exact bilinear weights for taps floor(p)+floor(s)+{0,1,2}.

    fp: frac(p) broadcast shape; fs: frac(s) broadcast shape. Returns
    (w0, w1, w2) with w_j >= 0, sum = 1.
    """
    phi = fp + fs
    w0 = jnp.maximum(0.0, 1.0 - phi)
    w2 = jnp.maximum(0.0, phi - 1.0)
    w1 = 1.0 - w0 - w2
    return w0, w1, w2


def _resample_pass(x, p, s, axis, out_n):
    """One exact 1-D resampling pass at positions ``p + s``.

    x: (B, D1, D2, C) fp-or-int array; the sampled axis is ``axis`` (2 for
      pass A/columns, 1 for pass B/rows) of size S.
    p: (B, out_n) real positions — the shared-scale term; indexes the NEW
      axis that replaces ``axis``.
    s: (B, L) real per-line shifts, L = size of the OTHER spatial axis
      (axis 1 for pass A, axis 2 for pass B).
    Returns an array like x with ``axis`` replaced by out_n, fp32.
    """
    size = x.shape[axis]
    si = jnp.floor(s).astype(jnp.int32)                       # (B, L)
    fs = (s - jnp.floor(s)).astype(jnp.float32)
    pi = jnp.floor(p).astype(jnp.int32)                       # (B, out_n)
    fp = (p - jnp.floor(p)).astype(jnp.float32)

    if axis == 2:     # shifts vary over rows (axis 1)
        k = jnp.mod(si, size)[:, :, None, None]
    else:             # axis == 1: shifts vary over columns (axis 2)
        k = jnp.mod(si, size)[:, None, :, None]
    x1 = _roll_by_bits(x, k, axis=axis, size=size)

    # one-hot selection matrix at floor(p) mod size: (B, out_n, S)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, out_n, size), 2)
    hot = (iota == jnp.mod(pi, size)[:, :, None]).astype(jnp.float32)

    # The one-hot matmul is pure SELECTION (one nonzero per row), so it is
    # exact whenever the DATA operand is exactly representable at the matmul
    # precision:
    #  - 8-bit sources: values <= 255 are exact in bf16 -> ONE bf16 pass;
    #  - float sources (pass B's fp32 intermediates): decompose the data
    #    into three bf16 components (hi + mid + lo reconstructs fp32 to
    #    ~2^-24 relative) and select each at bf16 rate -- 3 single-pass
    #    matmuls instead of fp32-HIGHEST's 6, result within ~2e-5 absolute
    #    on a 0-255 scale.
    eq = "bxc,brcd->brxd" if axis == 2 else "byr,brxc->byxc"

    def select(hot_m, data):
        return jnp.einsum(eq, hot_m, data,
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)

    int8_src = jnp.issubdtype(x.dtype, jnp.integer) and x.dtype.itemsize == 1
    hot16 = hot.astype(jnp.bfloat16)
    taps = []
    for j in range(3):
        xj = x1 if j == 0 else jnp.roll(x1, -j, axis=axis)
        if int8_src:
            taps.append(select(hot16, jnp.asarray(xj, jnp.bfloat16)))
        else:
            xf = jnp.asarray(xj, jnp.float32)
            # The barriers at the CAST SITES are load-bearing on TPU: XLA's
            # TPU simplifier folds the f32->bf16->f32 round-trip to identity,
            # which makes the residuals r1 (and so mid/lo) EXACTLY ZERO and
            # silently degrades the selection to bf16-quantized data
            # (measured: dense <=0.5 errors on a 0-255 scale vs the same
            # code on CPU, max|r1|==0 in the compiled TPU graph; with the
            # barriers the TPU output matches CPU bit-exactly — BENCH_NOTES
            # round-3 "fused Pallas warp" entry).
            hi = jax.lax.optimization_barrier(xf.astype(jnp.bfloat16))
            r1 = xf - hi.astype(jnp.float32)
            mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            taps.append(select(hot16, hi) + select(hot16, mid)
                        + select(hot16, lo))

    # weights + true-source-index validity, broadcast to (B, rows, cols)
    if axis == 2:
        fp_b = fp[:, None, :]           # (B, 1, out_n)
        fs_b = fs[:, :, None]           # (B, L, 1)
        base = pi[:, None, :] + si[:, :, None]
    else:
        fp_b = fp[:, :, None]           # (B, out_n, 1)
        fs_b = fs[:, None, :]           # (B, 1, L)
        base = pi[:, :, None] + si[:, None, :]
    ws = _tap_weights(fp_b, fs_b)
    out = None
    for j in range(3):
        valid = (base + j >= 0) & (base + j < size)
        wj = jnp.where(valid, ws[j], 0.0)[..., None]
        out = taps[j] * wj if out is None else out + taps[j] * wj
    return out


def shear_prepare(images, trans, out_size):
    """Frame swap + per-pass sampling positions, shared by the XLA path
    below and the fused Pallas kernel (``ops/pallas/shear_warp.py``) so the
    two backends compute positions from literally the same code.

    Returns ``(x, (p_a, s_a), (p_b, s_b))`` where x is the (possibly
    transposed-frame) source batch and the p/s vectors are the per-pass
    shared-scale / per-line-shift terms described in the module docstring.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    sh, sw = images.shape[1], images.shape[2]
    assert sh == sw, "shear warp requires square sources (pad first)"
    size = sh
    inv = invert_affine(jnp.asarray(trans, jnp.float32))      # (N, 2, 3)

    # |m11| < |m10|: sample in the transposed source frame (swap M's rows and
    # the source's spatial axes) so pass A's division stays well-conditioned.
    swap = jnp.abs(inv[:, 1, 1]) < jnp.abs(inv[:, 1, 0])      # (N,)
    inv_sw = inv[:, ::-1, :]
    inv = jnp.where(swap[:, None, None], inv_sw, inv)
    images_t = jnp.swapaxes(images, 1, 2)
    x = jnp.where(swap[:, None, None, None], images_t, images)

    m00, m01, m02 = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    m10, m11, m12 = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]

    # ---- pass A: resample columns of every source row at U = A x + (B r + C)
    a = m00 - m01 * m10 / m11
    bb = m01 / m11
    cc = m02 - m01 * m12 / m11
    xs = jnp.arange(out_w, dtype=jnp.float32)
    rs = jnp.arange(size, dtype=jnp.float32)
    p_a = a[:, None] * xs[None, :]                            # (N, out_w)
    s_a = bb[:, None] * rs[None, :] + cc[:, None]             # (N, S)

    # ---- pass B: resample rows at V = (m11 y + m12) + m10 x
    ys = jnp.arange(out_h, dtype=jnp.float32)
    p_b = m11[:, None] * ys[None, :] + m12[:, None]           # (N, out_h)
    s_b = m10[:, None] * xs[None, :]                          # (N, out_w)
    return x, (p_a, s_a), (p_b, s_b)


def shear_warp_batch(images, trans, out_size):
    """Gather-free batched affine warp, exact vs ``affine_warp_batch``.

    Args:
      images: (N, S, S, C) SQUARE source images, any real/integer dtype.
      trans: (N, 2, 3) src->dst affine matrices (``get_affine_transform``).
      out_size: static (out_w, out_h).

    Returns (N, out_h, out_w, C) float32, zeros outside the source.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    x, (p_a, s_a), (p_b, s_b) = shear_prepare(images, trans, out_size)
    inter = _resample_pass(x, p_a, s_a, axis=2, out_n=out_w)  # (N,S,out_w,C)
    return _resample_pass(inter, p_b, s_b, axis=1,
                          out_n=out_h)                       # (N, out_h, out_w, C)
