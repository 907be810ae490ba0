"""Model construction / forward-shape / dtype tests (SURVEY.md §2.7-2.8)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsgnet_tpu.config import defaults
from rsgnet_tpu.models import get_pose_net


def _tiny_cfg(rsg=False):
    """A shrunken topology so CPU tests are fast (same schema as W32)."""
    cfg = defaults.Config()
    cfg.DTYPE = "float32"
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.HEATMAP_SIZE = (16, 16)
    cfg.MODEL.EXTRA = defaults.ModelExtra(
        STAGE2=defaults.StageConfig(1, 2, (1, 1), (8, 16)),
        STAGE3=defaults.StageConfig(1, 3, (1, 1, 1), (8, 16, 32)),
        STAGE4=defaults.StageConfig(1, 4, (1, 1, 1, 1), (8, 16, 32, 64)),
    )
    if rsg:
        cfg.MODEL.NAME = "pose_rsgnet"
        cfg.MODEL.RSG.ENABLED = True
        cfg.MODEL.RSG.NODE_CHANNELS = 16
        cfg.MODEL.RSG.RELATION_CHANNELS = 16
    return cfg


def test_hrnet_forward_shapes():
    cfg = _tiny_cfg()
    model = get_pose_net(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 16, 16, 17)
    assert out.dtype == jnp.float32


def test_hrnet_heatmap_is_quarter_resolution():
    """input 64x64 -> stem /4 -> highest-res branch 16x16."""
    cfg = _tiny_cfg()
    model = get_pose_net(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    hm, feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (1, 16, 16, 8)   # W=8 highest-res channels


def test_rsgnet_forward_and_aux():
    cfg = _tiny_cfg(rsg=True)
    model = get_pose_net(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    final = model.apply(variables, x)
    assert final.shape == (2, 16, 16, 17)
    final2, aux = model.apply(variables, x, return_aux=True)
    assert aux.shape == (2, 16, 16, 17)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(final2))


def test_rsgnet_head_changes_output():
    """The refinement delta must actually do something (non-degenerate)."""
    cfg = _tiny_cfg(rsg=True)
    model = get_pose_net(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    final, aux = model.apply(variables, x, return_aux=True)
    assert float(jnp.abs(final - aux).max()) > 0.0


def test_train_mode_updates_batch_stats():
    cfg = _tiny_cfg()
    model = get_pose_net(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    # running stats must move away from init after a train-mode step
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(leaves_before, leaves_after)]
    assert max(diffs) > 0.0


def test_bf16_compute_fp32_output():
    cfg = _tiny_cfg()
    cfg.DTYPE = "bfloat16"
    model = get_pose_net(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.dtype == jnp.float32
    # params stay fp32 (master weights)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32


def test_bf16_forward_close_to_fp32():
    """bf16 MXU compute must track the fp32 forward closely on the SAME
    params — guards against accidental precision leaks (e.g. a bf16 BN or a
    dtype-dependent code path diverging)."""
    cfg = _tiny_cfg()
    cfg.DTYPE = "float32"
    model32 = get_pose_net(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-2, 2, (2, 64, 64, 3)).astype(np.float32))
    variables = model32.init(jax.random.PRNGKey(3), x)
    out32 = model32.apply(variables, x)

    import copy
    cfg16 = copy.deepcopy(cfg)
    cfg16.DTYPE = "bfloat16"
    model16 = get_pose_net(cfg16)
    out16 = model16.apply(variables, x)          # same fp32 params
    scale = float(jnp.abs(out32).max()) + 1e-6
    rel = float(jnp.abs(out16 - out32).max()) / scale
    # bf16 has ~2-3 decimal digits; through ~30 tiny layers expect <10% rel
    assert rel < 0.10, rel


def test_w32_config_param_count():
    """Full W32 body ~28.5M params (HRNet paper Table 4 reports 28.5M)."""
    cfg = defaults.w32_256x192()
    cfg.DTYPE = "float32"
    model = get_pose_net(cfg)
    x = jnp.zeros((1, 256, 192, 3))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    n = sum(np.prod(l.shape) for l in
            jax.tree_util.tree_leaves(variables["params"]))
    assert 27e6 < n < 30e6, n


def test_registry_unknown_name():
    cfg = _tiny_cfg()
    cfg.MODEL.NAME = "nonexistent"
    with pytest.raises(KeyError):
        get_pose_net(cfg)
