"""Prove the TPU backend's all-reduce combiner on the REAL flagship step.

VERDICT round-4 item 1: the flagship's gradient sync compiles to ~513
per-tensor all-reduces on the XLA:CPU virtual mesh (MULTICHIP_r04 tail) —
the latency anti-pattern DDP gradient bucketing exists to avoid. The
question this tool answers: does the *TPU* compiler — the one that matters
— combine them?

Method: AOT-compile the W32+RSG flagship sharded train step against a real
``v5e:2x4`` TPU topology description (``jax.experimental.topologies`` —
no 8 physical chips needed; the TPU compiler runs host-side) and count the
all-reduce ops + element volume in the optimized HLO. The same count is
also taken for the XLA:CPU virtual mesh for contrast.

Result (2026-08-20 session, BENCH_NOTES "gradient all-reduce bucketing"):
the TPU pipeline's AllReduceCombiner folds the per-tensor gradient syncs
into a handful of large tuple all-reduces; the CPU pipeline has no such
pass, so the 513 ops were an artifact of the *proof backend*, not of the
program. Pinned by tests/test_tpu_allreduce_combine.py (marked tpu — needs
the axon chip's compiler).

Usage: python tools/profile_tpu_allreduce.py [--topology v5e:2x4]
"""
from __future__ import annotations

import argparse
import re

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net


def collective_summary(hlo_text):
    """(n_allreduce, elements, n_other) from optimized HLO text. Tuple
    all-reduces (the combiner's output) count ONCE with every element."""
    n_ar, elems = 0, 0
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(\([^)]*\)|\S+)\s+all-reduce(?:-start)?\(", line)
        if not m:
            continue
        n_ar += 1
        for _, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            k = 1
            for d in dims.split(","):
                if d:
                    k *= int(d)
            elems += k
    n_other = sum(1 for l in hlo_text.splitlines()
                  if "=" in l and any(c in l for c in
                                      ("all-gather", "all-to-all",
                                       "collective-permute",
                                       "reduce-scatter")))
    return n_ar, elems, n_other


def flagship_abstract_args(cfg, model, n_devices):
    """ShapeDtypeStruct pytrees for (state, batch, rng) — AOT lowering
    against a topology has no real devices to hold concrete arrays."""
    state_sds = jax.eval_shape(
        lambda: create_train_state(cfg, model, jax.random.PRNGKey(0)))
    n = n_devices
    batch_sds = {
        "image": jax.ShapeDtypeStruct((n, 256, 256, 3), jnp.uint8),
        "joints": jax.ShapeDtypeStruct((n, 17, 2), jnp.float32),
        "joints_vis": jax.ShapeDtypeStruct((n, 17), jnp.float32),
        "center": jax.ShapeDtypeStruct((n, 2), jnp.float32),
        "scale": jax.ShapeDtypeStruct((n, 2), jnp.float32),
    }
    key_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return state_sds, batch_sds, key_sds


def compile_flagship_for(mesh, warp="auto"):
    """Lower + compile the flagship sharded train step on ``mesh``;
    returns (optimized_hlo_text, n_params)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = rsgnet_w32_256x192()
    cfg.TRAIN.WARP = warp
    model = get_pose_net(cfg)
    step = make_train_step(cfg, model, get_spec("coco"), jit=False,
                           mesh=mesh)
    state_sds, batch_sds, key_sds = flagship_abstract_args(
        cfg, model, mesh.size)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(cfg.MESH_DATA_AXIS))
    txt = jax.jit(
        step,
        in_shardings=(repl, {k: shard for k in batch_sds}, repl)).lower(
            state_sds, batch_sds, key_sds).compile().as_text()
    n_params = sum(
        np.prod(x.shape) for x in jax.tree_util.tree_leaves(state_sds.params))
    return txt, int(n_params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4",
                    help="TPU topology name for get_topology_desc")
    ap.add_argument("--warp", default="auto")
    args = ap.parse_args()

    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    mesh = Mesh(np.array(topo.devices), ("data",))
    print(f"compiling flagship train step for TPU {args.topology} "
          f"({mesh.size} devices, warp={args.warp}) ...", flush=True)
    txt, n_params = compile_flagship_for(mesh, warp=args.warp)
    n_ar, elems, n_other = collective_summary(txt)
    print(f"TPU {args.topology}: {n_ar} all-reduce ops, {elems} elements "
          f"({elems / n_params:.3f}x param volume), "
          f"other collectives = {n_other}")


if __name__ == "__main__":
    main()
