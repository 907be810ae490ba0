"""A/B the MODEL.S2D_STEM knob on the real chip (interleaved protocol).

Tunnel variance is +-15-35% across sessions but far smaller minute-to-minute,
so the arms are interleaved round-robin (off, on, off, on, ...) and the
per-round RATIO is what's reported — the honest within-session comparison
(BENCH_NOTES remote-timing rules). Measures:

- the stem conv alone (both model families' kernels) — the op the knob
  rewrites;
- W32 forward-only at B=128 (the headline eval path's compute);
- W32 FULL train step at B=128 (aug 640^2 + fwd+bwd+update);
- res50 forward-only at B=192 (the 7x7 stem).

Run on the real TPU:  python tools/profile_s2d.py
"""
from __future__ import annotations

import copy
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from _profiling import digest

from rsgnet_tpu.config.defaults import res50_256x192, rsgnet_w32_256x192
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.models.hrnet import _space_to_depth_conv

ROUNDS = 4
ITERS = 10


def timed(fn, arg_sets, iters=ITERS):
    """One timing sample: pipelined scalar-digest protocol."""
    outs = [fn(*arg_sets[i % len(arg_sets)]) for i in range(2)]
    [np.asarray(x) for x in outs]
    t0 = time.perf_counter()
    outs = [fn(*arg_sets[i % len(arg_sets)]) for i in range(iters)]
    sink = [np.asarray(x) for x in outs]
    assert all(np.isfinite(x) for x in sink)
    return (time.perf_counter() - t0) / iters


def ab(name, fn_off, fn_on, arg_sets, batch, rounds=ROUNDS):
    """Interleaved A/B; prints per-round pairs and the median speedup."""
    ratios, offs, ons = [], [], []
    for r in range(rounds):
        t_off = timed(fn_off, arg_sets)
        t_on = timed(fn_on, arg_sets)
        offs.append(t_off)
        ons.append(t_on)
        ratios.append(t_off / t_on)
        print(f"  round {r}: off {t_off * 1e3:7.2f} ms  "
              f"on {t_on * 1e3:7.2f} ms  ratio {t_off / t_on:5.3f}",
              flush=True)
    med = statistics.median(ratios)
    print(f"{name:46s} off {statistics.median(offs) * 1e3:7.2f} ms "
          f"({batch / statistics.median(offs):7.1f} img/s)  "
          f"on {statistics.median(ons) * 1e3:7.2f} ms "
          f"({batch / statistics.median(ons):7.1f} img/s)  "
          f"median speedup {med:5.3f}x", flush=True)
    return med


def ab_step(name, mk_step, state_factories, arg_sets, batch,
            rounds=ROUNDS, iters=6):
    """Interleaved A/B for stateful train steps (one loss fetch per arm).

    The steps are donation-jitted (matching production), so each sample
    rebuilds its state from a factory — the previous sample's state buffers
    were consumed by donation.
    """
    step_off, step_on = mk_step
    factory_off, factory_on = state_factories
    ratios = []

    def sample(step, factory):
        state, m = step(factory(), *arg_sets[0])
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, *arg_sets[i % len(arg_sets)])
        loss = np.asarray(m["loss"])
        assert np.isfinite(loss)
        return (time.perf_counter() - t0) / iters

    for r in range(rounds):
        t_off = sample(step_off, factory_off)
        t_on = sample(step_on, factory_on)
        ratios.append(t_off / t_on)
        print(f"  round {r}: off {t_off * 1e3:7.1f} ms "
              f"({batch / t_off:6.1f} img/s)  on {t_on * 1e3:7.1f} ms "
              f"({batch / t_on:6.1f} img/s)  ratio {t_off / t_on:5.3f}",
              flush=True)
    med = statistics.median(ratios)
    print(f"{name:46s} median speedup {med:5.3f}x", flush=True)
    return med


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--train-only", action="store_true",
                   help="skip the forward-only arms")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    # --- stem conv alone (bf16, the production compute dtype) ---------------
    # NOTE (first run): each stem-alone call sits on the ~23 ms tunnel
    # dispatch floor, so this arm can't resolve the op — the model-level
    # arms below are the meaningful comparison.
    for k, b, hw in (() if args.train_only
                     else ((3, 128, (256, 192)), (7, 192, (256, 192)))):
        x = jnp.asarray(rng.uniform(-2, 2, (b, *hw, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        kern = jnp.asarray(rng.uniform(-1, 1, (k, k, 3, 64))
                           .astype(np.float32))
        pad = (k - 1) // 2
        plain = jax.jit(lambda x, w: digest(jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (2, 2), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))))
        s2d = jax.jit(lambda x, w: digest(
            _space_to_depth_conv(x, w, jnp.bfloat16)))
        ab(f"stem conv {k}x{k}/s2 B={b} alone", plain, s2d, [(x, kern)], b)

    # --- W32 forward at B=128 ------------------------------------------------
    B = 128
    cfg = rsgnet_w32_256x192()
    cfg_on = copy.deepcopy(cfg)
    cfg_on.MODEL.S2D_STEM = True
    model = get_pose_net(cfg)
    model_on = get_pose_net(cfg_on)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    if not args.train_only:
        state = create_train_state(cfg, model, jax.random.PRNGKey(0))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        xs = [jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3))
                          .astype(np.float32)) for _ in range(3)]
        fwd_off = jax.jit(lambda v, x: digest(model.apply(v, x,
                                                          train=False)))
        fwd_on = jax.jit(lambda v, x: digest(model_on.apply(v, x,
                                                            train=False)))
        ab(f"W32 forward B={B}", fwd_off, fwd_on,
           [(variables, x) for x in xs], B)

    # --- W32 FULL train step at B=128 ---------------------------------------
    spec = get_spec("coco")
    step_off = jax.jit(make_train_step(cfg, model, spec, jit=False),
                       donate_argnums=(0,))
    step_on = jax.jit(make_train_step(cfg_on, model_on, spec, jit=False),
                      donate_argnums=(0,))
    imgs = [jnp.asarray(rng.randint(0, 255, (B, 640, 640, 3), np.uint8))
            for _ in range(2)]
    joints = jnp.asarray(rng.uniform(150, 450, (B, 17, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(B, 17)) > 0.2).astype(np.float32))
    centers = jnp.asarray(rng.uniform(200, 400, (B, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, B) * 0.75,
                                   rng.uniform(0.8, 1.5, B)],
                                  -1).astype(np.float32))
    key = jax.random.PRNGKey(0)
    batches = [({"image": x, "joints": joints, "joints_vis": vis,
                 "center": centers, "scale": scales}, key) for x in imgs]
    ab_step(f"W32 FULL train step B={B}", (step_off, step_on),
            (lambda: create_train_state(cfg, model, jax.random.PRNGKey(1)),
             lambda: create_train_state(cfg_on, model_on,
                                        jax.random.PRNGKey(1))),
            batches, B)

    # --- res50 forward at B=192 (7x7 stem) -----------------------------------
    if args.train_only:
        return
    B = 192
    rcfg = res50_256x192()
    rcfg_on = copy.deepcopy(rcfg)
    rcfg_on.MODEL.S2D_STEM = True
    rmodel = get_pose_net(rcfg)
    rmodel_on = get_pose_net(rcfg_on)
    rstate = create_train_state(rcfg, rmodel, jax.random.PRNGKey(0))
    rvars = {"params": rstate.params, "batch_stats": rstate.batch_stats}
    rxs = [jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3)).astype(np.float32))
           for _ in range(2)]
    rf_off = jax.jit(lambda v, x: digest(rmodel.apply(v, x, train=False)))
    rf_on = jax.jit(lambda v, x: digest(rmodel_on.apply(v, x, train=False)))
    ab(f"res50 forward B={B}", rf_off, rf_on, [(rvars, x) for x in rxs], B)


if __name__ == "__main__":
    main()
