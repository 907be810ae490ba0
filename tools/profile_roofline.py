"""Raw-compute roofline for THIS chip: decides whether the model-path
ceiling is the hardware/tunnel or the conv structure.

The round-2/3 dissections measured the HRNet forward at ~15-17 effective
TFLOP/s and parked layout restructuring as "re-profile on direct-attached
hardware" — but no raw MXU roofline was ever taken on this chip, so the
"tunnel ceiling" hypothesis was argued, not measured. This profiler pins it:

- big bf16 matmuls (square, and MXU-friendly shapes): the closest thing to
  the chip's practical peak. If these land near the v5e spec sheet
  (~197 bf16 TFLOP/s) the tunnel does NOT limit on-chip throughput and the
  conv number is genuinely structure-bound; if they also cap at a few tens,
  the parked conclusion is confirmed with hard evidence.
- single large 3x3 convs at the HRNet branch shapes (B=128): per-branch
  MXU efficiency without per-op overhead, separating "convs lower badly"
  from "the network has too many small ops".
- a deep conv CHAIN (30 sequential convs): adds per-op dispatch overhead
  back in, isolating overhead-per-op vs per-conv efficiency.

Protocol: tools/_profiling scalar-digest pipelined timing (BENCH_NOTES.md).
Run on the real TPU:  python tools/profile_roofline.py
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import digest, timeit

ITERS = 10


def flops_rate(name, dt, flops):
    print(f"{'':8s}-> {flops / dt / 1e12:8.1f} TFLOP/s   ({name})",
          flush=True)


def profile_matmul(n, m, k, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, k), dtype)
    b = jax.random.normal(jax.random.fold_in(key, 1), (k, m), dtype)

    @jax.jit
    def f(a, b):
        return digest(a @ b)

    name = f"matmul {n}x{k}x{m} {dtype.__name__}"
    dt = timeit(name, f, [(a, b)], iters=ITERS)
    flops_rate(name, dt, 2.0 * n * m * k)
    return dt


def profile_conv(b, h, w, cin, cout, name, chain=1, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (b, h, w, cin), dtype)
    # fan-in-scaled kernels keep deep chains variance-stable: unit-variance
    # N(0,1) kernels multiply the activation stddev by ~sqrt(9*cin) per
    # layer, overflowing bf16 (and the fp32 digest) around layer ~23
    ks = [jax.random.normal(jax.random.fold_in(key, i + 1),
                            (3, 3, cin if i == 0 else cout, cout), dtype)
          / float(np.sqrt(9.0 * (cin if i == 0 else cout)))  # weak: keeps dtype
          for i in range(chain)]

    @jax.jit
    def f(x, *ks):
        y = x
        for kern in ks:
            y = jax.lax.conv_general_dilated(
                y, kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return digest(y)

    dt = timeit(name, f, [(x, *ks)], iters=ITERS)
    fl = 2.0 * b * h * w * 9 * (cin * cout + (chain - 1) * cout * cout)
    flops_rate(name, dt, fl)
    return dt


def main():
    print(f"devices: {jax.devices()}\n", flush=True)

    print("== bf16 matmul roofline ==", flush=True)
    for n in (4096, 8192):
        profile_matmul(n, n, n)
    # MXU-friendly rectangular (activations x weights shape)
    profile_matmul(32768, 512, 512)

    print("\n== fp32 matmul (VPU/MXU fp32 path) ==", flush=True)
    profile_matmul(4096, 4096, 4096, jnp.float32)

    print("\n== single 3x3 convs at HRNet-W32 branch shapes (B=128) ==",
          flush=True)
    profile_conv(128, 64, 48, 32, 32, "conv 64x48xc32   (branch 0)")
    profile_conv(128, 32, 24, 64, 64, "conv 32x24xc64   (branch 1)")
    profile_conv(128, 16, 12, 128, 128, "conv 16x12xc128  (branch 2)")
    profile_conv(128, 8, 6, 256, 256, "conv 8x6xc256    (branch 3)")
    # a deliberately MXU-saturating conv for the conv-path practical peak
    profile_conv(128, 64, 48, 256, 256, "conv 64x48xc256  (saturating)")

    print("\n== 30-deep conv chains (adds per-op overhead back) ==",
          flush=True)
    profile_conv(128, 64, 48, 32, 32, "chain30 64x48xc32", chain=30)
    profile_conv(128, 8, 6, 256, 256, "chain30 8x6xc256", chain=30)


if __name__ == "__main__":
    main()
