"""Shared custom_partitioning factory for the Pallas kernels.

A ``pallas_call`` is opaque to the SPMD partitioner: under ``jit`` with
batch-sharded operands the compiled program would all-gather the whole
batch to every device before the kernel. Each kernel wraps itself with
``make_partitioned`` instead, which teaches the partitioner the op's data
layout from ONE declaration — an einsum-like sharding rule — used three
ways so the factor/dim bookkeeping cannot drift between them (the same
single-source-of-truth principle as ops/warp.py's resolvers):

- verbatim as the shardy ``sharding_rule`` (shardy is the default
  partitioner in this JAX) for sharding propagation;
- parsed into per-array dim->factor maps driving the GSPMD
  ``infer_sharding_from_operands`` callback;
- the same maps driving the ``partition`` callback.

``partition`` derives the kernel's shardings from the OPERAND shardings,
not the requested result sharding: if a caller requests a replicated (or
differently-sharded) result while the operands are batch-sharded, the
cheap lowering is per-shard compute followed by a reshard of the (small)
result — deriving from the result would instead all-gather the (large)
inputs and run the whole batch redundantly on every device. GSPMD inserts
the result reshard automatically when the returned result sharding
differs from the requested one (tests/test_eval_warp.py pins the
replicated-result case to exactly one small-output all-gather).
"""
from __future__ import annotations


def _parse_rule(rule):
    """'b i j c, b k l -> b m n c' -> (operand maps, result maps), each a
    tuple of per-array factor-name tuples."""
    ops, res = rule.split("->")

    def side(s):
        return tuple(tuple(part.split()) for part in s.split(","))

    return side(ops), side(res)


def make_partitioned(fn, rule, need_replication):
    """Wrap ``fn`` (a jittable function over array operands, returning one
    array or a tuple of arrays) in ``custom_partitioning``.

    Args:
      fn: the per-shard computation. Must be shape-polymorphic over every
        passthrough (shardable) dimension — each shard calls it on its
        slice.
      rule: einsum-like sharding rule naming each operand/result dim with
        a factor, e.g. ``"b i j c, b k l -> b m n c"``. Factors shared
        between operands and results propagate shardings (passthrough).
      need_replication: factor names that must stay replicated (the kernel
        needs those dims whole).

    Returns the wrapped callable (same signature as ``fn``).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    op_maps, res_maps = _parse_rule(rule)
    repl = frozenset(need_replication)
    known = {n for fmap in op_maps + res_maps for n in fmap}
    if not repl <= known:
        # a typo here would SILENTLY let a must-stay-whole dim be sharded
        # (the factor scan would map it to a mesh axis) — fail at factory
        # time instead
        raise ValueError(f"need_replication names {sorted(repl - known)} "
                         f"not present in rule {rule!r}")

    f = custom_partitioning(fn)

    def _factor_values(arg_shapes):
        """factor name -> mesh-axis component, scanned from the operands'
        specs in order (first non-None assignment wins)."""
        vals = {}
        for fmap, a in zip(op_maps, arg_shapes):
            spec = a.sharding.spec
            for d, name in enumerate(fmap):
                if name in repl or vals.get(name) is not None:
                    continue
                if d < len(spec) and spec[d] is not None:
                    vals[name] = spec[d]
        return vals

    def _shardings(mesh, vals, maps):
        return tuple(
            NamedSharding(mesh, PartitionSpec(*(vals.get(n) for n in fmap)))
            for fmap in maps)

    def _results(mesh, vals):
        out = _shardings(mesh, vals, res_maps)
        return out if len(out) > 1 else out[0]

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _results(mesh, _factor_values(arg_shapes))

    def partition(mesh, arg_shapes, result_shape):
        vals = _factor_values(arg_shapes)
        return (mesh, fn, _results(mesh, vals),
                _shardings(mesh, vals, op_maps))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=tuple(need_replication),
    )
    return f
