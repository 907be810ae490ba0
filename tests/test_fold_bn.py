"""Eval-time BN folding (models/fold_bn.py, TEST.FOLD_BN): exactness.

The fold is variable surgery only — the module graph is untouched — so
parity is the whole correctness story: folded variables through the SAME
eval program must reproduce the unfolded outputs to fp32-rounding
tolerance, for every model family's ConvBN pattern."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsgnet_tpu.models import get_pose_net, init_variables
from rsgnet_tpu.models.fold_bn import count_convbn, fold_bn_variables

from test_train_step import _tiny_cfg


def _trained_ish_variables(cfg, model, key=0):
    """Init + a burst of noise on BN leaves so the fold is non-trivial
    (fresh init has scale=1/mean=0/var=1 — folding that is the identity)."""
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(key),
                               jnp.zeros((1, h, w, 3), jnp.float32))
    rng = np.random.RandomState(key)

    def perturb(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        x = np.asarray(x)
        if name in ("scale",):
            return x * rng.uniform(0.5, 1.5, x.shape).astype(x.dtype)
        if name in ("bias", "mean"):
            return x + rng.uniform(-0.5, 0.5, x.shape).astype(x.dtype)
        if name == "var":
            return x * rng.uniform(0.5, 2.0, x.shape).astype(x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(perturb, variables)


@pytest.mark.parametrize("kind", ["hrnet", "rsgnet", "resnet"])
def test_fold_bn_forward_parity(kind):
    if kind == "resnet":
        from rsgnet_tpu.config.defaults import tiny_resnet
        cfg = tiny_resnet()
    else:
        cfg = _tiny_cfg(rsg=(kind == "rsgnet"))
    cfg.DTYPE = "float32"               # fp32 conv: tight tolerance
    model = get_pose_net(cfg)
    variables = _trained_ish_variables(cfg, model)
    n = count_convbn(variables)
    assert n > 3, f"{kind}: expected many ConvBN pairs, found {n}"
    folded = fold_bn_variables(variables)

    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    x = jnp.asarray(np.random.RandomState(1)
                    .uniform(-2, 2, (2, h, w, 3)).astype(np.float32))
    fwd = jax.jit(lambda v: model.apply(v, x, train=False))
    want = np.asarray(fwd(variables))
    got = np.asarray(fwd(folded))
    # fp32 rounding through ~10 folded convs; heatmap scale is O(1)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_fold_is_idempotent_and_pure():
    cfg = _tiny_cfg()
    model = get_pose_net(cfg)
    variables = _trained_ish_variables(cfg, model)
    before = jax.tree_util.tree_map(np.copy, variables)
    folded = fold_bn_variables(variables)
    # input untouched
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           before, variables)
    twice = fold_bn_variables(folded)
    for a, b in zip(jax.tree_util.tree_leaves(folded),
                    jax.tree_util.tree_leaves(twice)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-7, rtol=1e-6)


def test_validate_honors_fold_bn_flag(tmp_path):
    """TEST.FOLD_BN=true through the eval pipeline: the collected
    image-space predictions (not just the AP, which is 0 for random
    weights either way) must match the unfolded run to sub-pixel fp32
    tolerance — proving collect_predictions actually applies the fold and
    the fold changes nothing downstream."""
    from rsgnet_tpu.core.validate import collect_predictions
    from rsgnet_tpu.data import get_dataset
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture

    root = str(tmp_path)
    write_fixture(root, make_dataset())
    cfg = _tiny_cfg()
    cfg.DTYPE = "float32"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    model = get_pose_net(cfg)
    variables = _trained_ish_variables(cfg, model)
    preds0, boxes0, ids0 = collect_predictions(cfg, ds, model, variables,
                                               num_workers=2)
    cfg.TEST.FOLD_BN = True
    preds1, boxes1, ids1 = collect_predictions(cfg, ds, model, variables,
                                               num_workers=2)
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_array_equal(boxes0, boxes1)
    np.testing.assert_allclose(preds1, preds0, atol=5e-3)   # sub-pixel


def test_skipped_convbn_keeps_batch_stats():
    """Review finding (round 5): a conv/bn pair the fold SKIPS (conv has
    its own bias — e.g. pose_resnet EXTRA.DECONV_WITH_BIAS=True) must keep
    its running stats intact; an early version of the walk dropped every
    stats leaf whose key had no params sibling."""
    variables = {
        "params": {
            "deconv0": {"conv": {"kernel": np.ones((3, 3, 4, 4), np.float32),
                                 "bias": np.zeros((4,), np.float32)},
                        "bn": {"scale": np.full((4,), 2.0, np.float32),
                               "bias": np.zeros((4,), np.float32)}},
            "cb": {"conv": {"kernel": np.ones((1, 1, 4, 4), np.float32)},
                   "bn": {"scale": np.full((4,), 2.0, np.float32),
                          "bias": np.zeros((4,), np.float32)}},
        },
        "batch_stats": {
            "deconv0": {"bn": {"mean": np.full((4,), 0.5, np.float32),
                               "var": np.full((4,), 2.0, np.float32)}},
            "cb": {"bn": {"mean": np.full((4,), 0.5, np.float32),
                          "var": np.full((4,), 2.0, np.float32)}},
        },
    }
    folded = fold_bn_variables(variables)
    # the biased pair is untouched — params AND stats
    np.testing.assert_array_equal(
        folded["params"]["deconv0"]["conv"]["kernel"],
        variables["params"]["deconv0"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        folded["batch_stats"]["deconv0"]["bn"]["mean"],
        variables["batch_stats"]["deconv0"]["bn"]["mean"])
    np.testing.assert_array_equal(
        folded["batch_stats"]["deconv0"]["bn"]["var"],
        variables["batch_stats"]["deconv0"]["bn"]["var"])
    # the unbiased pair IS folded
    assert float(folded["params"]["cb"]["conv"]["kernel"][0, 0, 0, 0]) != 1.0
    assert float(folded["batch_stats"]["cb"]["bn"]["mean"][0]) == 0.0
    assert count_convbn(variables) == 1
