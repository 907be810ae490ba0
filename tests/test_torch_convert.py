"""Weight-converter tests: the torch<->flax mapping must be a bijection over
every backbone tensor (SURVEY.md §5.4 — parity against released checkpoints
depends on this mapping being exact)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsgnet_tpu.config.defaults import Config, rsgnet_w32_256x192, w48_384x288
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.utils.torch_convert import (convert_state_dict,
                                            export_state_dict, hrnet_key_map)


def _leaves(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


@pytest.mark.parametrize("make_cfg", [Config, w48_384x288])
def test_roundtrip_and_coverage(make_cfg):
    cfg = make_cfg()
    cfg.DTYPE = "float32"
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
                   train=False)
    params, stats = v["params"], v["batch_stats"]

    sd = export_state_dict(cfg, params, stats)
    # every exported tensor converts back to the identical tree
    p2, s2 = convert_state_dict(cfg, sd)
    orig = dict(_leaves(params))
    for path, val in _leaves(p2):
        np.testing.assert_array_equal(np.asarray(orig[path]), val), path
    orig_s = dict(_leaves(stats))
    for path, val in _leaves(s2):
        np.testing.assert_array_equal(np.asarray(orig_s[path]), val), path

    # coverage: the mapping touches EVERY backbone param leaf
    mapped = {path for path, _ in _leaves(p2)}
    actual = {path for path, _ in _leaves(params)}
    assert mapped == actual, (actual - mapped, mapped - actual)
    mapped_s = {path for path, _ in _leaves(s2)}
    actual_s = {path for path, _ in _leaves(stats)}
    assert mapped_s == actual_s


def test_rsgnet_nesting_leaves_head_alone():
    cfg = rsgnet_w32_256x192()
    cfg.DTYPE = "float32"
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
                   train=False)
    sd = export_state_dict(cfg, v["params"], v["batch_stats"],
                           nested_under="backbone")
    p2, s2 = convert_state_dict(cfg, sd, nest_under="backbone")
    assert set(p2.keys()) == {"backbone"}
    backbone = {path for path, _ in _leaves(v["params"]["backbone"])}
    assert {path for path, _ in _leaves(p2["backbone"])} == backbone


def test_conv_layout_transpose():
    cfg = Config()
    kmap = hrnet_key_map(cfg)
    stem = [e for e in kmap if e[0] == "conv1.weight"][0]
    sd = {t: np.zeros((1,)) for t, _, _ in kmap}
    w = np.arange(64 * 3 * 3 * 3, dtype=np.float32).reshape(64, 3, 3, 3)
    sd["conv1.weight"] = w
    # fill remaining with correctly-shaped dummies by exporting a real model
    model = get_pose_net(cfg)
    cfg.DTYPE = "float32"
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3)),
                   train=False)
    full = export_state_dict(cfg, v["params"], v["batch_stats"])
    full["conv1.weight"] = w
    p2, _ = convert_state_dict(cfg, full)
    assert p2["stem1"]["conv"]["kernel"].shape == (3, 3, 3, 64)
    np.testing.assert_array_equal(
        p2["stem1"]["conv"]["kernel"], np.transpose(w, (2, 3, 1, 0)))


def test_missing_tensor_raises():
    cfg = Config()
    with pytest.raises(KeyError):
        convert_state_dict(cfg, {})
