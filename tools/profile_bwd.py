"""Backward-pass dissection: WHY is bwd ~4.3x fwd (expected ~2x)?

Probes (scalar-digest protocol from tools/profile_paths.py — see
BENCH_NOTES.md "Round 2" for the methodology):

  fwd            forward, train-mode BN (batch stats)
  vjp-input      backward wrt the INPUT image only — full backward chain,
                 but XLA can drop every weight-gradient conv (dW)
  vjp-params     the standard param grad (dI chain + dW convs)
  vjp-params-ema same, but BN uses running averages (no batch-stat
                 reductions forward or backward)
  fp32 variants  DTYPE=float32 — if ~the same speed as bf16 the convs are
                 not MXU-rate-bound but overhead/memory-bound
  +update        full BARE step (Adam) for reference vs round-2 table

Run on the real TPU:  python tools/profile_bwd.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import timeit as _timeit

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
from rsgnet_tpu.core.loss import make_loss
from rsgnet_tpu.core.train import create_train_state
from rsgnet_tpu.models import get_pose_net

B = 64
ITERS = 10


def timeit(name, fn, arg_sets, iters=ITERS):
    return _timeit(name, fn, arg_sets, iters=iters, batch=B)


def build(dtype):
    cfg = rsgnet_w32_256x192()
    cfg.DTYPE = dtype
    model = get_pose_net(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    loss_inner = make_loss(cfg)

    def loss_from(params, bstats, x, t, tw, train_bn):
        vs = {"params": params, "batch_stats": bstats}
        if train_bn:
            (final, aux), _ = model.apply(vs, x, train=True, return_aux=True,
                                          mutable=["batch_stats"])
        else:
            final, aux = model.apply(vs, x, train=False, return_aux=True)
        return loss_inner(final, t, tw) + 0.5 * loss_inner(aux, t, tw)

    return cfg, model, state, loss_from


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    h, w = 256, 192
    xs = [jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3)).astype(np.float32))
          for _ in range(3)]
    t = jnp.asarray(rng.uniform(0, 1, (B, 64, 48, 17)).astype(np.float32))
    tw = jnp.ones((B, 17), jnp.float32)

    for dtype in ("bfloat16", "float32"):
        cfg, model, state, loss_from = build(dtype)
        p, bs = state.params, state.batch_stats
        tag = "bf16" if dtype == "bfloat16" else "fp32"

        fwd = jax.jit(lambda p, x: loss_from(p, bs, x, t, tw, True))
        timeit(f"[{tag}] fwd train-BN (loss only)", fwd,
               [(p, x) for x in xs])

        gp = jax.jit(jax.grad(
            lambda p, x: loss_from(p, bs, x, t, tw, True)))
        gp_d = jax.jit(lambda p, x: sum(
            jnp.sum(l) for l in jax.tree_util.tree_leaves(gp(p, x))))
        timeit(f"[{tag}] vjp wrt PARAMS (train-BN)", gp_d,
               [(p, x) for x in xs])

        if dtype == "bfloat16":  # dissection probes on the flagship dtype only
            gin = jax.jit(jax.grad(
                lambda x, p: loss_from(p, bs, x, t, tw, True)))
            gin_d = jax.jit(lambda x, p: jnp.sum(gin(x, p)))
            timeit(f"[{tag}] vjp wrt INPUT only", gin_d,
                   [(x, p) for x in xs])

            gpe = jax.jit(jax.grad(
                lambda p, x: loss_from(p, bs, x, t, tw, False)))
            gpe_d = jax.jit(lambda p, x: sum(
                jnp.sum(l) for l in jax.tree_util.tree_leaves(gpe(p, x))))
            timeit(f"[{tag}] vjp wrt PARAMS (ema-BN)", gpe_d,
                   [(p, x) for x in xs])


if __name__ == "__main__":
    main()
