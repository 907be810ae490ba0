"""MODEL.S2D_STEM: space-to-depth execution of the C_in=3 stem convs.

The knob is a pure execution strategy — same math (every output is the same
sum of products, zero-padded taps added), same param tree (checkpoints and
the torch converter are untouched). These tests pin:

- forward equality vs the plain conv for BOTH stems (HRNet 3x3, resnet 7x7)
- param-tree identity (a flag-off init restores into a flag-on model)
- gradient equality through the rearrangement
- the even-dims / odd-kernel guards
"""
import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsgnet_tpu.config import defaults
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.models.hrnet import ConvBN, _space_to_depth_conv


def _tiny_cfg(name="pose_hrnet"):
    if name == "pose_resnet":
        return defaults.tiny_resnet()
    cfg = defaults.Config()
    cfg.DTYPE = "float32"
    cfg.MODEL.IMAGE_SIZE = (64, 96)
    cfg.MODEL.HEATMAP_SIZE = (16, 24)
    cfg.MODEL.EXTRA = defaults.ModelExtra(
        STAGE2=defaults.StageConfig(1, 2, (1, 1), (8, 16)),
        STAGE3=defaults.StageConfig(1, 3, (1, 1, 1), (8, 16, 32)),
        STAGE4=defaults.StageConfig(1, 4, (1, 1, 1, 1), (8, 16, 32, 64)),
    )
    return cfg


@pytest.mark.parametrize("kernel", [3, 7])
def test_s2d_conv_matches_plain_conv(kernel):
    """The rearranged conv is the plain conv, for both stem kernel sizes."""
    rng = np.random.RandomState(kernel)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 24, 3)).astype(np.float32))
    k = jnp.asarray(rng.uniform(-1, 1, (kernel, kernel, 3, 16))
                    .astype(np.float32))
    pad = (kernel - 1) // 2
    want = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = _space_to_depth_conv(x, k, jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("name", ["pose_hrnet", "pose_resnet"])
def test_s2d_stem_forward_equality_and_param_tree(name):
    cfg = _tiny_cfg(name)
    cfg_s2d = copy.deepcopy(cfg)
    cfg_s2d.MODEL.S2D_STEM = True

    model = get_pose_net(cfg)
    model_s2d = get_pose_net(cfg_s2d)
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-2, 2, (2, 96, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # identical param tree: the flag-off init drives the flag-on model as-is
    vs = model_s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vs))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(vs)):
        assert p1 == p2 and a.shape == b.shape
        # same path -> same param RNG fold -> bit-identical init values
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(model_s2d.apply(variables, x, train=False))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)


def test_s2d_gradients_match():
    """d(loss)/d(kernel) flows through the rearrangement unchanged."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    k = jnp.asarray(rng.uniform(-1, 1, (3, 3, 3, 8)).astype(np.float32))

    def loss_plain(k):
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    def loss_s2d(k):
        return jnp.sum(_space_to_depth_conv(x, k, jnp.float32) ** 2)

    g1 = np.asarray(jax.grad(loss_plain)(k))
    g2 = np.asarray(jax.grad(loss_s2d)(k))
    np.testing.assert_allclose(g2, g1, atol=1e-4, rtol=1e-5)


def test_s2d_guards():
    x = jnp.zeros((1, 15, 16, 3))       # odd height
    k = jnp.zeros((3, 3, 3, 8))
    with pytest.raises(ValueError, match="even input dims"):
        _space_to_depth_conv(x, k, jnp.float32)

    conv = ConvBN(8, kernel=4, stride=2, s2d=True)
    with pytest.raises(ValueError, match="odd-kernel"):
        conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
