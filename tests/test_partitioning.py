"""Unit tests for the shared custom_partitioning factory
(``ops/pallas/partitioning.py``) — the rule parser and the
factor-to-mesh-axis scan, independent of any Pallas kernel.

The kernel-level contracts (zero collectives under batch-sharded jit,
bit-identity with the shard_map form, operand-derived lowering under a
replicated-result request) live in tests/test_eval_warp.py and
tests/test_pallas_dark.py; this file pins the factory's own bookkeeping so
a future kernel's rule string fails here, not as an opaque HLO diff.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rsgnet_tpu.ops.pallas.partitioning import _parse_rule, make_partitioned
from rsgnet_tpu.parallel.mesh import make_mesh


def test_parse_rule_shapes():
    ops, res = _parse_rule("b i j c, b k l -> b m n c")
    assert ops == (("b", "i", "j", "c"), ("b", "k", "l"))
    assert res == (("b", "m", "n", "c"),)

    ops, res = _parse_rule("b h w k -> b k i, b k j")
    assert ops == (("b", "h", "w", "k"),)
    assert res == (("b", "k", "i"), ("b", "k", "j"))


def test_factory_end_to_end_two_operands():
    """A plain jnp function (no Pallas) through the factory: batch-sharded
    operands stay per-shard (no all-gather of the inputs), the result
    inherits the batch sharding, and values match the unsharded call."""
    def fn(x, y):
        return x * 2.0 + y.sum(axis=(1, 2), keepdims=True)[..., None]

    wrapped = make_partitioned(fn, rule="b i j c, b k l -> b i j c",
                               need_replication=("i", "j", "k", "l"))
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 6, 5, 3)).astype(np.float32)
    y = rng.normal(size=(16, 4, 2)).astype(np.float32)
    ref = np.asarray(fn(jnp.asarray(x), jnp.asarray(y)))

    xd = jax.device_put(x, shard)
    yd = jax.device_put(y, shard)
    f = jax.jit(wrapped)
    hlo = f.lower(xd, yd).compile().as_text()
    assert "all-gather" not in hlo, hlo
    out = f(xd, yd)
    assert out.sharding.spec == P("data")      # trailing Nones normalized
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_factory_multi_result_and_second_factor():
    """Multi-result rule with a second passthrough factor (the DARK-decode
    shape): sharding the JOINT dim (not batch) still propagates to both
    results in the right positions."""
    def fn(hm):
        flat = hm.reshape(hm.shape[0], -1, hm.shape[3])
        am = jnp.argmax(flat, axis=1)
        return (am % hm.shape[2]).astype(jnp.float32), \
               (am // hm.shape[2]).astype(jnp.float32)

    wrapped = make_partitioned(fn, rule="b h w k -> b k, b k",
                               need_replication=("h", "w"))
    mesh = make_mesh(8)
    kshard = NamedSharding(mesh, P(None, None, None, "data"))
    rng = np.random.default_rng(1)
    hm = rng.uniform(size=(4, 6, 5, 16)).astype(np.float32)
    rx, ry = fn(jnp.asarray(hm))

    hmd = jax.device_put(hm, kshard)
    f = jax.jit(wrapped)
    ox, oy = f(hmd)
    assert ox.sharding.spec == P(None, "data")
    assert oy.sharding.spec == P(None, "data")
    np.testing.assert_array_equal(np.asarray(ox), np.asarray(rx))
    np.testing.assert_array_equal(np.asarray(oy), np.asarray(ry))


def test_factory_rejects_unknown_replication_factor():
    """A typo'd need_replication name fails at factory time instead of
    silently allowing a must-stay-whole dim to be sharded."""
    import pytest
    with pytest.raises(ValueError, match="'x'"):
        make_partitioned(lambda a: a, rule="b h w k -> b k",
                         need_replication=("h", "x"))


def test_factory_fuzz_random_rules():
    """Randomized factory semantics: for generated rules/shapes/shardings,
    the wrapped call must equal the plain fn and the compiled program must
    contain no all-gather of a batch-sharded operand's full batch dim.

    Generator: each case has 1-2 operands and 1-2 results; every array is
    (B, d1[, d2]) with the batch factor 'b' passthrough and all other
    factors need_replication. The per-shard fn is elementwise-plus-reduce
    so it is shape-polymorphic over b (the factory's contract)."""
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(42)
    B = 16

    for case in range(10):
        n_ops = int(rng.integers(1, 3))
        n_res = int(rng.integers(1, 3))
        op_shapes = [(B,) + tuple(int(d) for d in
                                  rng.integers(2, 6, int(rng.integers(1, 3))))
                     for _ in range(n_ops)]
        # factor names: batch 'b' shared; every trailing dim gets its own
        names = []
        repl = []
        k = 0
        for s in op_shapes:
            fmap = ["b"]
            for _ in s[1:]:
                fmap.append(f"f{k}")
                repl.append(f"f{k}")
                k += 1
            names.append(" ".join(fmap))
        res_dims = [int(rng.integers(1, 3)) for _ in range(n_res)]
        res_names = []
        for nd in res_dims:
            fmap = ["b"]
            for _ in range(nd):
                fmap.append(f"f{k}")
                repl.append(f"f{k}")
                k += 1
            res_names.append(" ".join(fmap))
        rule = ", ".join(names) + " -> " + ", ".join(res_names)

        def make_fn(rd, base):
            def fn(*ops):
                # reduce every operand to a per-batch scalar, combine, then
                # broadcast to each result's (static) trailing shape
                tot = sum(o.reshape(o.shape[0], -1).sum(axis=1)
                          for o in ops)
                outs = tuple(
                    jnp.broadcast_to(
                        tot.reshape((-1,) + (1,) * nd),
                        (tot.shape[0],) + tuple(range(base, base + nd)))
                    for nd in rd)
                return outs if len(outs) > 1 else outs[0]
            return fn

        fn = make_fn(tuple(res_dims), 2 + case % 2)

        wrapped = make_partitioned(fn, rule=rule, need_replication=repl)
        ops = [rng.normal(size=s).astype(np.float32) for s in op_shapes]
        ref = fn(*(jnp.asarray(o) for o in ops))
        ops_d = [jax.device_put(o, shard) for o in ops]
        f = jax.jit(wrapped)
        hlo = f.lower(*ops_d).compile().as_text()
        for line in hlo.splitlines():
            if "all-gather" in line:
                # no operand's full batch extent may be re-assembled
                assert f"f32[{B}," not in line, (rule, line)
        out = f(*ops_d)
        for o, r in zip(jax.tree_util.tree_leaves(out),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=rule)


def test_factory_replicated_operands_replicated_result():
    """Fully-replicated operands: factor scan finds no mesh axes; the call
    degenerates to the plain function on every device."""
    def fn(x):
        return x + 1.0

    wrapped = make_partitioned(fn, rule="b i -> b i", need_replication=("i",))
    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    x = jax.device_put(np.arange(12, dtype=np.float32).reshape(3, 4), repl)
    out = jax.jit(wrapped)(x)
    assert out.sharding.spec == P()            # trailing Nones normalized
    np.testing.assert_array_equal(np.asarray(out),
                                  np.arange(12, dtype=np.float32)
                                  .reshape(3, 4) + 1.0)
