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
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401

from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net


def _shape_elems(type_text):
    """Total element count across every shape literal in ``type_text``.
    TPU HLO layouts embed parens (``{1,0:T(8,128)S(1)}``), so parsing must
    key on the ``dtype[dims]`` brackets, never on paren matching."""
    n = 0
    for _, dims in re.findall(r"(\w+)\[([\d,]*)\]", type_text):
        k = 1
        for d in dims.split(","):
            if d:
                k *= int(d)
        n += k
    return n


def allreduce_sizes(hlo_text):
    """Element count per all-reduce op (tuple all-reduces — the combiner's
    output — count once with every operand element)."""
    sizes = []
    for line in hlo_text.splitlines():
        if " all-reduce(" not in line and " all-reduce-start(" not in line:
            continue
        lhs = re.split(r" all-reduce(?:-start)?\(", line)[0]
        if "=" not in lhs:
            continue
        sizes.append(_shape_elems(lhs.split("=", 1)[1]))
    return sizes


def collective_summary(hlo_text):
    """(n_allreduce, elements, other: {kind: total_elements})."""
    sizes = allreduce_sizes(hlo_text)
    other = {}
    for kind in ("all-gather", "all-to-all", "collective-permute",
                 "reduce-scatter"):
        tot = 0
        for line in hlo_text.splitlines():
            if f" {kind}(" not in line and f" {kind}-start(" not in line:
                continue
            lhs = re.split(rf" {kind}(?:-start)?\(", line)[0]
            if "=" in lhs:
                tot += _shape_elems(lhs.split("=", 1)[1])
        if tot:
            other[kind] = tot
    return len(sizes), sum(sizes), other


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


def summarize(txt, n_params):
    """The numbers the bucketing question turns on. ``grad_ops`` = the
    count of all-reduces carrying >= 1M elements — the gradient buckets;
    everything smaller is the per-layer BN-statistics forward sync, which
    is sequentially dependent (layer n+1 consumes layer n's normalized
    output) and therefore uncombinable by ANY implementation."""
    sizes = sorted(allreduce_sizes(txt))
    big = [s for s in sizes if s >= 2 ** 20]
    _, total, other = collective_summary(txt)
    return {
        "n_allreduce": len(sizes),
        "total_elements": int(total),
        "param_ratio": round(total / n_params, 4),
        "grad_ops": len(big),
        "grad_elements": int(sum(big)),
        "grad_volume_share": round(sum(big) / max(total, 1), 4),
        "grad_sizes": [int(s) for s in big],
        "small_ops": len(sizes) - len(big),
        "small_elements": int(total - sum(big)),
        "other_collectives": other,
        "n_params": int(n_params),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4",
                    help="TPU topology name for get_topology_desc")
    ap.add_argument("--warp", default="auto")
    ap.add_argument("--json", default="",
                    help="also write the summary dict to this path")
    args = ap.parse_args()

    from jax.experimental import topologies
    from jax.sharding import Mesh

    from rsgnet_tpu.utils.compile_cache import wire
    wire(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_compile_cache"))

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    mesh = Mesh(np.array(topo.devices), ("data",))
    print(f"compiling flagship train step for TPU {args.topology} "
          f"({mesh.size} devices, warp={args.warp}) ...", flush=True)
    txt, n_params = compile_flagship_for(mesh, warp=args.warp)
    s = summarize(txt, n_params)
    print(f"TPU {args.topology}: {s['n_allreduce']} all-reduce ops, "
          f"{s['total_elements']} elements ({s['param_ratio']:.3f}x param "
          f"volume); gradient sync = {s['grad_ops']} combined ops "
          f"{s['grad_sizes']} carrying {s['grad_volume_share']:.1%} of "
          f"volume; {s['small_ops']} small BN-stat ops; other collectives "
          f"= {s['other_collectives']}")
    if args.json:
        import datetime
        import json
        s["topology"] = args.topology
        s["date"] = datetime.date.today().isoformat()
        with open(args.json, "w") as f:
            json.dump(s, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
