"""Fused single-kernel shear warp — the whole two-pass warp in VMEM.

The XLA shear warp (``ops/shear_warp.py``) measures as a ~31-38 ms LATENCY
floor at B=128 (BENCH_NOTES round-3 dissection): its ~10 dependent
roll+select stages and narrow selection einsums compile to sequential
full-tensor HBM round trips whose latencies do not overlap, and shrinking
the bytes (bf16 rolls) recovered only ~4 ms. This kernel removes the floor
structurally: ONE Pallas program per (image, channel) pulls the whole
square source into VMEM and runs BOTH passes — roll-by-bits stages, tap
selection, bilinear weighting — without touching HBM in between, and the
tap selection becomes a dense (S, S) @ (S, out) one-hot matmul (K=S wide on
the MXU) instead of XLA's N=3-lane einsum.

Math and numerics are IDENTICAL to ``shear_warp_batch`` by construction:

- positions come from the shared ``shear_prepare`` (same code object);
- roll-by-bits composes the same circular rolls (``pltpu.roll`` over the
  mod-S shift bits);
- tap j selects the rolled array at ``(floor(p) + j) mod S`` via a one-hot
  matmul — pure SELECTION, so exact in bf16 for 8-bit sources and exact via
  the hi/mid/lo 3-component bf16 decomposition for float sources (the same
  decomposition the XLA path uses, see ``shear_warp._resample_pass``);
- bilinear weights/validity use the same formulas in the same order.

The kernel is BIT-IDENTICAL to ``jax.jit(shear_warp_batch)`` on the CPU
backend (tests/test_pallas_shear.py asserts array equality) — the form
every real caller compares against, since ``augment_batch`` runs under jit —
AND on the real TPU chip (max |diff| 0.0 for uint8 and float sources at
640^2->256x192 across rotations/flips, measured 2026-08-19; note this
required fixing the XLA path's own TPU-side bf16 collapse first, see the
cast-site ``optimization_barrier`` note in ``ops/shear_warp.py``).
(The EAGER op-by-op ``shear_warp_batch`` differs from both by ~1e-3 on a
0-255 scale: per-op compilation denies XLA the `a*b+c` FMA contractions the
whole-graph compilations perform. That is a property of the eager baseline,
not of this kernel.)

Used by training augmentation when ``TRAIN.WARP == "pallas"``
(data/augment.py); the CPU backend auto-selects interpret mode, matching
the ops/pallas/dark_decode.py convention. The filtering-semantics contract
(exact map, two-pass sheared-lattice footprint at intermediate angles) is
inherited unchanged from ops/shear_warp.py — see its module docstring.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsgnet_tpu.ops.shear_warp import shear_prepare


def _roll_left_by_bits(x, k_mod, axis, size):
    """Circular-roll ``x`` LEFT along ``axis`` by per-line ``k_mod``
    (int32 in [0, size), shaped to broadcast against x). Static
    ``pltpu.roll`` + select per bit — no gather, no shifts (bitwise_and
    with a constant mask only, the safest Mosaic integer op set)."""
    b = 0
    while (1 << b) < size:
        amt = 1 << b
        # left-roll by amt == pltpu.roll (out[i] = x[i - shift]) by size-amt
        rolled = pltpu.roll(x, shift=(size - amt) % size, axis=axis)
        bit = jnp.bitwise_and(k_mod, amt) != 0
        x = jnp.where(bit, rolled, x)
        b += 1
    return x


def _bf16_components(xf):
    """hi/mid/lo bf16 decomposition reconstructing fp32 to ~2^-24 relative
    (identical to the XLA path's exact-selection trick)."""
    hi = xf.astype(jnp.bfloat16)
    r1 = xf - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _wrap_inc(idx_mod, j, size):
    """(idx_mod + j) mod size for idx_mod in [0, size), 0 <= j < size,
    without an integer remainder op."""
    v = idx_mod + j
    return jnp.where(v >= size, v - size, v)


def _kernel(x_ref, sia_m_ref, sia_r_ref, fsa_ref, pia_m_ref, pia_r_ref,
            fpa_ref, sib_m_ref, sib_r_ref, fsb_ref, pib_m_ref, pib_r_ref,
            fpb_ref, out_ref, *, size, out_w, out_h, int8_src):
    x = x_ref[0, 0]                                   # (S, S)

    # ---- pass A: sample along columns at pi_a[x] + si_a[r] + j ----------
    sia_m = sia_m_ref[0]                              # (S, 1) int32
    sia_r = sia_r_ref[0]                              # (S, 1) int32
    fsa = fsa_ref[0]                                  # (S, 1) f32
    pia_m = pia_m_ref[0]                              # (1, out_w) int32
    pia_r = pia_r_ref[0]                              # (1, out_w) int32
    fpa = fpa_ref[0]                                  # (1, out_w) f32

    # x arrives fp32 (Mosaic restrictions: no uint8->bf16 cast in-kernel,
    # and tpu.dynamic_rotate only handles 32-bit lanes — bf16 rolls fail to
    # compile). Roll in fp32, cast to bf16 only at the selection matmul:
    # for uint8 sources one bf16 component is exact (0..255), floats use
    # the hi/mid/lo decomposition.
    xr = _roll_left_by_bits(x, sia_m, axis=1, size=size)
    comps = (xr.astype(jnp.bfloat16),) if int8_src else _bf16_components(xr)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (size, out_w), 0)
    phi_a = fpa + fsa                                 # (S, out_w)
    wa = (jnp.maximum(0.0, 1.0 - phi_a), None, jnp.maximum(0.0, phi_a - 1.0))
    wa = (wa[0], 1.0 - wa[0] - wa[2], wa[2])
    inter = None
    for j in range(3):
        sel = (iota_c == _wrap_inc(pia_m, j, size)).astype(jnp.bfloat16)
        tap = None                                    # (S, out_w) f32
        for c in comps:
            t = jnp.dot(c, sel, preferred_element_type=jnp.float32)
            tap = t if tap is None else tap + t
        valid = ((pia_r + sia_r + j) >= 0) & ((pia_r + sia_r + j) < size)
        wj = jnp.where(valid, wa[j], 0.0)
        inter = tap * wj if inter is None else inter + tap * wj

    # ---- pass B: sample along rows at pi_b[y] + si_b[x] + j -------------
    sib_m = sib_m_ref[0]                              # (1, out_w) int32
    sib_r = sib_r_ref[0]                              # (1, out_w) int32
    fsb = fsb_ref[0]                                  # (1, out_w) f32
    pib_m = pib_m_ref[0]                              # (out_h, 1) int32
    pib_r = pib_r_ref[0]                              # (out_h, 1) int32
    fpb = fpb_ref[0]                                  # (out_h, 1) f32

    inter = _roll_left_by_bits(inter, sib_m, axis=0, size=size)
    comps_b = _bf16_components(inter)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (out_h, size), 1)
    phi_b = fpb + fsb                                 # (out_h, out_w)
    wb = (jnp.maximum(0.0, 1.0 - phi_b), None, jnp.maximum(0.0, phi_b - 1.0))
    wb = (wb[0], 1.0 - wb[0] - wb[2], wb[2])
    out = None
    for j in range(3):
        sel = (iota_r == _wrap_inc(pib_m, j, size)).astype(jnp.bfloat16)
        tap = None                                    # (out_h, out_w) f32
        for c in comps_b:
            t = jnp.dot(sel, c, preferred_element_type=jnp.float32)
            tap = t if tap is None else tap + t
        valid = ((pib_r + sib_r + j) >= 0) & ((pib_r + sib_r + j) < size)
        wj = jnp.where(valid, wb[j], 0.0)
        out = tap * wj if out is None else out + tap * wj
    out_ref[0, 0] = out


def _split(v, size=None):
    """floor/frac split; returns (raw int32, mod int32 or None, frac f32)."""
    fl = jnp.floor(v)
    raw = fl.astype(jnp.int32)
    mod = jnp.mod(raw, size) if size is not None else None
    return raw, mod, (v - fl).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def shear_warp_pallas(images, trans, out_size, interpret: bool | None = None):
    """Fused-kernel shear warp, drop-in for ``shear_warp_batch``.

    Args:
      images: (N, S, S, C) SQUARE source images (uint8 or float).
      trans: (N, 2, 3) src->dst affine matrices.
      out_size: static (out_w, out_h).
      interpret: force Pallas interpret mode; None = auto (CPU backend).

    Returns (N, out_h, out_w, C) float32, zeros outside the source.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    x, (p_a, s_a), (p_b, s_b) = shear_prepare(images, trans, out_size)
    n, size, _, ch = x.shape
    int8_src = (jnp.issubdtype(images.dtype, jnp.integer)
                and images.dtype.itemsize == 1)
    # the kernel wants fp32 lanes (32-bit rolls are the only ones Mosaic
    # implements; in-kernel uint8 casts are unsupported) — cast outside.
    x = x.astype(jnp.float32)
    xc = jnp.transpose(x, (0, 3, 1, 2))               # (N, C, S, S)

    sia_r, sia_m, fsa = _split(s_a, size)             # (N, S)
    pia_r, pia_m, fpa = _split(p_a, size)             # (N, out_w)
    sib_r, sib_m, fsb = _split(s_b, size)             # (N, out_w)
    pib_r, pib_m, fpb = _split(p_b, size)             # (N, out_h)

    kernel = functools.partial(_kernel, size=size, out_w=out_w,
                               out_h=out_h, int8_src=int8_src)

    def col(v):       # per-source-row vectors -> (N, S, 1) blocks
        return v[:, :, None]

    def row(v):       # per-output-column/row vectors -> (N, 1, L) blocks
        return v[:, None, :]

    b_img = pl.BlockSpec((1, 1, size, size), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)

    def b_col(L):
        return pl.BlockSpec((1, L, 1), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def b_row(L):
        return pl.BlockSpec((1, 1, L), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n, ch),
        in_specs=[
            b_img,
            b_col(size), b_col(size), b_col(size),          # si_a m/r, fs_a
            b_row(out_w), b_row(out_w), b_row(out_w),       # pi_a m/r, fp_a
            b_row(out_w), b_row(out_w), b_row(out_w),       # si_b m/r, fs_b
            b_col(out_h), b_col(out_h), b_col(out_h),       # pi_b m/r, fp_b
        ],
        out_specs=pl.BlockSpec((1, 1, out_h, out_w),
                               lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ch, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(xc,
      col(sia_m), col(sia_r), col(fsa),
      row(pia_m), row(pia_r), row(fpa),
      row(sib_m), row(sib_r), row(fsb),
      col(pib_m), col(pib_r), col(fpb))
    return jnp.transpose(out, (0, 2, 3, 1))           # (N, out_h, out_w, C)


@functools.lru_cache(maxsize=None)
def _partitioned_warp(out_size, interpret):
    """``shear_warp_pallas`` wrapped in ``custom_partitioning`` — the
    partitioner-aware form that needs NO caller-threaded mesh: the batch
    (and channel) dimensions are passthrough factors, every spatial/matrix
    dimension is replicated (each program needs its whole square source
    image). Under ``jit`` with batch-sharded operands the compiled program
    runs the kernel per shard with ZERO collectives, bit-identical to the
    explicit shard_map form (tests/test_eval_warp.py). Shared machinery:
    ops/pallas/partitioning.py."""
    from rsgnet_tpu.ops.pallas.partitioning import make_partitioned

    return make_partitioned(
        lambda images, trans: shear_warp_pallas(images, trans, out_size,
                                                interpret),
        rule="b i j c, b k l -> b m n c",
        need_replication=("i", "j", "k", "l", "m", "n"),
    )


def shear_warp_pallas_dp(images, trans, out_size, mesh=None, axis="data",
                         interpret: bool | None = None):
    """``shear_warp_pallas`` made safe under multi-device execution.

    A ``pallas_call`` is OPAQUE to the SPMD partitioner: under plain
    ``jit(..., in_shardings=...)`` on an 8-device mesh the compiled program
    ALL-GATHERS the full image batch to every device before the kernel
    (measured: 107 all-gather ops), silently destroying data parallelism.
    Two safe forms, both collective-free (tests/test_eval_warp.py):

    - ``mesh=`` given: ``jax.shard_map`` over the data axis maps the kernel
      per shard (the original, multi-host-proven form).
    - ``mesh=None`` on a multi-device host: the ``custom_partitioning``
      wrapper (``_partitioned_warp``) lets the partitioner itself shard the
      call — no caller cooperation needed, bit-identical to the shard_map
      form.

    Either sharded form's per-shard compilation may round the fp32 position
    math differently from the unsharded program (~2e-3 on a 0-255 scale —
    the same order as the separable warp's documented parity to the gather
    sampler). mesh=None on a single-device host (and 1-device meshes) falls
    through to the plain kernel — the exact program the single-chip bench
    measures.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if mesh is None or mesh.size == 1:
        if mesh is None and jax.device_count() > 1:
            return _partitioned_warp(
                tuple(int(v) for v in out_size), interpret)(images, trans)
        return shear_warp_pallas(images, trans, tuple(out_size), interpret)
    from jax.sharding import PartitionSpec as P
    fn = jax.shard_map(
        lambda im, t: shear_warp_pallas(im, t, tuple(out_size), interpret),
        mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis),
        check_vma=False)
    return fn(images, trans)
