"""MODEL.FUSE_MERGED: merged-dispatch execution of the exchange-fusion units.

The knob is a pure execution strategy (VERDICT round-3 item 2): a source
branch's 1x1 up-edges run as ONE channel-concat conv, its down-chains
advance level-by-level as shared-input / block-diagonal merged convs, and
each merged conv gets one fused BatchNorm. Same math up to reduction-order
rounding (the per-output sum accumulates in a different order), same param
tree. These tests pin:

- param-tree identity + bit-identical init values (same paths -> same RNG)
- eval-forward equality on the tiny 4-branch topology AND the flagship
  tiny-rsgnet config
- train-mode equality: outputs, every BatchNorm running stat, and gradients
- the block-diagonal kernel identity itself
"""
import copy
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsgnet_tpu.config import defaults
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.models.hrnet import _block_diag_kernel


def _tiny_cfg(train=False):
    cfg = defaults.Config()
    cfg.DTYPE = "float32"
    cfg.MODEL.IMAGE_SIZE = (64, 96)
    cfg.MODEL.HEATMAP_SIZE = (16, 24)
    # eval covers the multi-module stage3 naming; the (costly) train-mode
    # grad/BN-stat test only needs one module of each branch count
    s3_modules = 1 if train else 2
    cfg.MODEL.EXTRA = defaults.ModelExtra(
        STAGE2=defaults.StageConfig(1, 2, (1, 1), (8, 16)),
        STAGE3=defaults.StageConfig(s3_modules, 3, (1, 1, 1), (8, 16, 32)),
        STAGE4=defaults.StageConfig(1, 4, (1, 1, 1, 1), (8, 16, 32, 64)),
    )
    return cfg


def _pair(cfg):
    cfg_m = copy.deepcopy(cfg)
    cfg_m.MODEL.FUSE_MERGED = True
    return get_pose_net(cfg), get_pose_net(cfg_m)


def test_block_diag_kernel_identity():
    rng = np.random.RandomState(0)
    ks = [jnp.asarray(rng.uniform(-1, 1, (3, 3, ci, co)).astype(np.float32))
          for ci, co in [(4, 6), (5, 3), (2, 2)]]
    xs = [jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, k.shape[2]))
                      .astype(np.float32)) for k in ks]

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    want = jnp.concatenate([conv(x, k) for x, k in zip(xs, ks)], -1)
    got = conv(jnp.concatenate(xs, -1), _block_diag_kernel(ks))
    # zero off-diagonal blocks contribute exact 0.0 products
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("flagship", [False, True])
def test_param_tree_identity_and_eval_forward(flagship):
    cfg = defaults.tiny_rsgnet() if flagship else _tiny_cfg()
    model, model_m = _pair(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-2, 2, (2, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    vs = model_m.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vs))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(vs)):
        assert p1 == p2 and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = model.apply(variables, x, train=False)
    got = model_m.apply(variables, x, train=False)
    want, got = jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)
    for wv, gv in zip(want, got):
        wv, gv = np.asarray(wv), np.asarray(gv)
        scale = max(np.abs(wv).max(), 1.0)
        np.testing.assert_allclose(gv, wv, atol=2e-5 * scale)


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="~28s train-mode parity for a DEFAULT-OFF execution strategy "
           "(FUSE_MERGED measured negative on chip, BENCH_NOTES round 4); "
           "eval parity + init identity stay default-tier — "
           "RSGNET_SLOW_TESTS=1 runs the grads/BN-stats pass")
def test_train_mode_outputs_stats_and_grads_match():
    cfg = _tiny_cfg(train=True)
    model, model_m = _pair(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-2, 2, (2, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tgt = jnp.asarray(rng.uniform(0, 1, (2, cfg.MODEL.HEATMAP_SIZE[1],
                                         cfg.MODEL.HEATMAP_SIZE[0],
                                         cfg.MODEL.NUM_JOINTS))
                      .astype(np.float32))

    def loss_fn(m):
        def f(params):
            out, upd = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.mean((out - tgt) ** 2), upd
        return f

    (l1, upd1), g1 = jax.value_and_grad(loss_fn(model), has_aux=True)(
        variables["params"])
    (l2, upd2), g2 = jax.value_and_grad(loss_fn(model_m), has_aux=True)(
        variables["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)

    # every running stat (incl. the merged-BN write-backs) matches
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(upd1),
            jax.tree_util.tree_leaves_with_path(upd2)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=str(p1))
    # gradients flow identically through the merged dispatches
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        assert p1 == p2
        sc = max(np.abs(np.asarray(a)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5 * sc, err_msg=str(p1))
