"""TEST.WARP — the eval-crop sampler choice (separable/shear/pallas/auto).

Covers:
- rot=0 crop parity: all samplers implement the same exact bilinear map;
  shear/pallas are exact-footprint at rot=0 (the only case eval produces),
  so they agree with the separable MXU sampler to fp32-rounding order.
- the SPMD-partitioner hazard: a bare pallas_call inside plain
  ``jit(..., in_shardings=...)`` is opaque to the partitioner, which
  ALL-GATHERS the image batch to every device (measured 107 all-gathers on
  the 8-device mesh). ``shear_warp_pallas_dp`` has two safe forms — an
  explicit shard_map when ``mesh=`` is threaded, and a custom_partitioning
  wrapper when it is not — this file asserts BOTH compiled sharded
  programs have ZERO collectives, agree with each other bit-identically,
  and match the unsharded result.
- make_e2e_fn honors TEST.WARP end-to-end (incl. "auto" trace-time backend
  resolution and ValueError on unknown values), single-device and mesh.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.ops.affine import get_affine_transform_jax
from rsgnet_tpu.ops.warp import crop_and_normalize
from rsgnet_tpu.parallel.mesh import make_mesh

OUT = (48, 64)     # (w, h)


def _eval_batch(n=8, s=128, seed=0):
    rng = np.random.RandomState(seed)
    imgs = jnp.asarray(rng.randint(0, 256, (n, s, s, 3)).astype(np.uint8))
    centers = jnp.asarray(rng.uniform(30, 95, (n, 2)).astype(np.float32))
    scales = jnp.asarray(
        np.stack([rng.uniform(0.3, 0.7, n)] * 2, -1).astype(np.float32))
    trans = get_affine_transform_jax(centers, scales, jnp.zeros(n), OUT)
    return imgs, centers, scales, trans


def test_rot0_crop_parity_all_samplers():
    """separable / shear / pallas all sample the exact rot=0 bilinear map;
    agreement to fp32-rounding order (normalized units; inputs span ~[-3, 3])."""
    imgs, _, _, trans = _eval_batch()
    crops = {
        w: np.asarray(jax.jit(
            lambda im, t, w=w: crop_and_normalize(im, t, OUT, warp=w)
        )(imgs, trans))
        for w in ("gather", "separable", "shear", "pallas")
    }
    for w in ("separable", "shear", "pallas"):
        np.testing.assert_allclose(crops[w], crops["gather"], atol=5e-4,
                                   err_msg=w)
    # pallas is the fused form of shear: bit-identical under one jit context
    np.testing.assert_array_equal(crops["pallas"], crops["shear"])


def test_pallas_dp_sharded_no_collectives():
    """shard_map'd pallas warp on the 8-device mesh: ZERO collectives in the
    compiled HLO (the plain-jit form all-gathers), result matches unsharded
    to fp32-rounding order (per-shard compilation rounds position math
    independently)."""
    from rsgnet_tpu.ops.pallas.shear_warp import (shear_warp_pallas,
                                                  shear_warp_pallas_dp)
    imgs, _, _, trans = _eval_batch()
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    f = jax.jit(lambda im, t: shear_warp_pallas_dp(im, t, OUT, mesh=mesh),
                in_shardings=(shard, shard), out_shardings=shard)
    hlo = f.lower(imgs, trans).compile().as_text()
    for coll in ("all-gather", "all-reduce", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        assert hlo.count(coll) == 0, (coll, hlo.count(coll))
    out = np.asarray(f(imgs, trans))
    ref = np.asarray(jax.jit(
        lambda im, t: shear_warp_pallas(im, t, OUT))(imgs, trans))
    np.testing.assert_allclose(out, ref, atol=5e-3)   # 0-255 scale


def test_pallas_no_mesh_sharded_no_collectives():
    """The custom_partitioning form: calling ``shear_warp_pallas_dp`` with
    NO mesh under jit with batch-sharded operands must compile per-shard
    (zero collectives) and agree bit-identically with the explicit
    shard_map form — the round-3 'forgotten mesh=' hazard is gone."""
    from rsgnet_tpu.ops.pallas.shear_warp import shear_warp_pallas_dp
    imgs, _, _, trans = _eval_batch()
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    imgs_d = jax.device_put(imgs, shard)
    trans_d = jax.device_put(trans, shard)
    f = jax.jit(lambda im, t: shear_warp_pallas_dp(im, t, OUT))   # mesh=None
    hlo = f.lower(imgs_d, trans_d).compile().as_text()
    for coll in ("all-gather", "all-reduce", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        assert hlo.count(coll) == 0, (coll, hlo.count(coll))
    out = np.asarray(f(imgs_d, trans_d))
    ref = np.asarray(jax.jit(
        lambda im, t: shear_warp_pallas_dp(im, t, OUT, mesh=mesh),
        in_shardings=(shard, shard))(imgs, trans))
    np.testing.assert_array_equal(out, ref)

    # a REPLICATED result request over sharded inputs must still compute
    # per shard and all-gather only the small output — never the (N, S, S,
    # C) source images (partition() derives the kernel shardings from the
    # operands, not the requested result; ops/pallas/partitioning.py)
    g = jax.jit(lambda im, t: shear_warp_pallas_dp(im, t, OUT),
                out_shardings=NamedSharding(mesh, P()))
    hlo_r = g.lower(imgs_d, trans_d).compile().as_text()
    src = imgs.shape[1]
    for line in hlo_r.splitlines():
        if "all-gather" in line:
            assert f"{src},{src}" not in line, line
    out_r = np.asarray(g(imgs_d, trans_d))
    np.testing.assert_array_equal(out_r, ref)


def _tiny_eval_cfg():
    return tiny_rsgnet()      # native 64x96 input (divisible by 32)


def test_e2e_fn_honors_test_warp():
    from rsgnet_tpu.core.inference import make_e2e_fn
    from rsgnet_tpu.models import get_pose_net
    imgs, centers, scales, _ = _eval_batch()
    preds = {}
    for w in ("separable", "pallas", "auto"):
        cfg = _tiny_eval_cfg()
        cfg.TEST.WARP = w
        w_in, h_in = cfg.MODEL.IMAGE_SIZE
        model = get_pose_net(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               np.zeros((1, h_in, w_in, 3), np.float32),
                               train=False)
        fn = make_e2e_fn(cfg, model, (imgs.shape[1], imgs.shape[2]))
        p, mv = fn(variables, imgs, centers, scales)
        assert np.isfinite(np.asarray(p)).all()
        preds[w] = np.asarray(p)
    # "auto" resolves to separable on the CPU backend -> identical program
    np.testing.assert_array_equal(preds["auto"], preds["separable"])
    # NOTE: preds across samplers are NOT compared — a random-init model's
    # near-flat heatmaps amplify ~1e-4 crop differences into arbitrary
    # argmax jumps (measured 52% pred disagreement on chip while the crops
    # agreed to 2.3e-4). Crop-level parity above is the correctness check.

    cfg = _tiny_eval_cfg()
    cfg.TEST.WARP = "bogus"
    model = get_pose_net(cfg)
    with pytest.raises(ValueError, match="TEST.WARP"):
        make_e2e_fn(cfg, model, (imgs.shape[1], imgs.shape[2]))


def test_e2e_fn_pallas_on_mesh_zero_collectives():
    """The sharded eval forward must stay collective-free with the pallas
    warp (the DP contract test_dp_hlo pins for the separable path)."""
    from rsgnet_tpu.core.inference import make_e2e_fn
    from rsgnet_tpu.models import get_pose_net
    imgs, centers, scales, _ = _eval_batch()
    cfg = _tiny_eval_cfg()
    cfg.TEST.WARP = "pallas"
    w_in, h_in = cfg.MODEL.IMAGE_SIZE
    model = get_pose_net(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h_in, w_in, 3), np.float32),
                           train=False)
    mesh = make_mesh(8)
    fn = make_e2e_fn(cfg, model, (imgs.shape[1], imgs.shape[2]), mesh=mesh)
    hlo = fn.lower(variables, imgs, centers, scales).compile().as_text()
    for coll in ("all-reduce", "all-gather", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        assert hlo.count(coll) == 0, (coll, hlo.count(coll))
    p, _ = fn(variables, imgs, centers, scales)
    assert np.isfinite(np.asarray(p)).all()


def _pallas_step_harness():
    """Shared setup for the pallas-warp DP tests below (the step build is
    the expensive part — one full sharded train-step compile each)."""
    from rsgnet_tpu.core.train import create_train_state, make_train_step
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.models import get_pose_net
    cfg = _tiny_eval_cfg()
    cfg.TRAIN.WARP = "pallas"
    model = get_pose_net(cfg)
    spec = get_spec("coco")
    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    n, k, s = 8, cfg.MODEL.NUM_JOINTS, 128
    rng = np.random.RandomState(3)
    batch = {
        "image": jax.device_put(jnp.asarray(
            rng.randint(0, 256, (n, s, s, 3)).astype(np.uint8)), shard),
        "joints": jax.device_put(jnp.asarray(
            rng.uniform(30, 95, (n, k, 2)).astype(np.float32)), shard),
        "joints_vis": jax.device_put(jnp.asarray(
            (rng.uniform(size=(n, k)) > 0.2).astype(np.float32)), shard),
        "center": jax.device_put(jnp.asarray(
            rng.uniform(40, 85, (n, 2)).astype(np.float32)), shard),
        "scale": jax.device_put(jnp.asarray(np.stack(
            [rng.uniform(0.3, 0.5, n)] * 2, -1).astype(np.float32)), shard),
    }
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(0)), repl)

    def build(with_mesh):
        return jax.jit(
            make_train_step(cfg, model, spec, jit=False,
                            mesh=mesh if with_mesh else None),
            in_shardings=(repl, {kk: shard for kk in batch}, repl))

    return build, state, batch


def test_train_step_pallas_on_mesh_runs():
    """TRAIN.WARP='pallas' + mesh: the step runs sharded (shard_map'd warp)
    and produces a finite loss with ZERO all-gathers. (Collective volume
    for the DP contract is pinned by test_dp_hlo for the default warp.)"""
    build, state, batch = _pallas_step_harness()
    step = build(with_mesh=True)
    hlo = step.lower(state, batch, jax.random.PRNGKey(1)).compile().as_text()
    assert hlo.count("all-gather") == 0, hlo.count("all-gather")
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="a second full sharded train-step compile (~15s) for the "
           "no-mesh calling convention; the custom_partitioning property "
           "it pins is covered op-level in the default tier "
           "(test_partitioning.py, test_pallas_dark.py) — "
           "RSGNET_SLOW_TESTS=1 runs the full-step cross-check")
def test_train_step_pallas_no_mesh_partitioner_matches():
    """The round-3 'forgotten mesh=' hazard at full-step scope: the step
    built WITHOUT mesh= threaded through must keep the pallas warp
    per-shard (zero all-gathers) and produce the identical loss."""
    build, state, batch = _pallas_step_harness()
    metrics = build(with_mesh=True)(state, batch, jax.random.PRNGKey(1))[1]
    step_nm = build(with_mesh=False)
    hlo_nm = step_nm.lower(
        state, batch, jax.random.PRNGKey(1)).compile().as_text()
    assert hlo_nm.count("all-gather") == 0, hlo_nm.count("all-gather")
    _, metrics_nm = step_nm(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics_nm["loss"]),
                               float(metrics["loss"]), rtol=1e-5)


def test_resolve_warp_shared_helpers(monkeypatch):
    """ops/warp.py's resolvers are the single source of truth for the warp
    option sets (review finding: three call sites had drifted — e.g.
    crop_and_normalize rejected the documented TEST.WARP value "auto")."""
    from rsgnet_tpu.ops import warp as warp_mod

    # eval: "auto" -> separable everywhere; bad values raise with the
    # caller-supplied option name in the message.
    assert warp_mod.resolve_eval_warp("auto") == "separable"
    assert warp_mod.resolve_eval_warp("pallas") == "pallas"
    with pytest.raises(ValueError, match="TEST.WARP"):
        warp_mod.resolve_eval_warp("bogus", name="TEST.WARP")

    # crop_and_normalize accepts every TEST.WARP value, incl. "auto"
    # (regression: tools/profile_eval_warp.py --warps auto used to crash).
    imgs, _, _, trans = _eval_batch(n=2)
    a = np.asarray(crop_and_normalize(imgs, trans, OUT, warp="auto"))
    b = np.asarray(crop_and_normalize(imgs, trans, OUT, warp="separable"))
    np.testing.assert_array_equal(a, b)

    # train: "auto" picks pallas on the real TPU backend regardless of
    # mesh — the kernel is SPMD-safe in every calling convention now
    # (shard_map'd with mesh=, custom_partitioning-wrapped without), so
    # the old forgotten-mesh gate is gone.
    monkeypatch.setattr(warp_mod.jax, "default_backend", lambda: "tpu")
    assert warp_mod.resolve_train_warp("auto") == "pallas"
    assert warp_mod.resolve_train_warp("auto", mesh=object()) == "pallas"
    monkeypatch.setattr(warp_mod.jax, "default_backend", lambda: "cpu")
    assert warp_mod.resolve_train_warp("auto") == "shear"
    assert warp_mod.resolve_train_warp("auto", mesh=object()) == "shear"
    assert warp_mod.resolve_train_warp("gather") == "gather"
    with pytest.raises(ValueError, match="TRAIN.WARP"):
        warp_mod.resolve_train_warp("bogus")
