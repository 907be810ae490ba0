"""Pretrained-backbone init (reference init_weights): partial torch
checkpoints load what exists, honor PRETRAINED_LAYERS, reject bad shapes."""
import jax
import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.utils.torch_convert import (export_state_dict,
                                            load_pretrained_backbone)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_rsgnet()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, h, w, 3), np.float32),
                   train=False)
    sd = export_state_dict(cfg, v["params"], v["batch_stats"],
                           nested_under="backbone")
    return cfg, v, sd


def test_full_load(setup):
    cfg, v, sd = setup
    # perturb the source so we can see it land
    sd = {k: val + 1.0 for k, val in sd.items()}
    v2, n = load_pretrained_backbone(cfg, v, sd, nest_under="backbone")
    assert n == len(sd)
    got = np.asarray(v2["params"]["backbone"]["stem1"]["conv"]["kernel"])
    want = np.asarray(v["params"]["backbone"]["stem1"]["conv"]["kernel"]) + 1
    np.testing.assert_allclose(got, np.transpose(
        np.transpose(want, (3, 2, 0, 1)), (2, 3, 1, 0)))


def test_partial_checkpoint_skips_missing(setup):
    """Classification checkpoints lack final_layer — fresh init kept."""
    cfg, v, sd = setup
    sd = {k: val for k, val in sd.items() if not k.startswith("final_layer")}
    v2, n = load_pretrained_backbone(cfg, v, sd, nest_under="backbone")
    assert n == len(sd)
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["backbone"]["final_layer"]["kernel"]),
        np.asarray(v["params"]["backbone"]["final_layer"]["kernel"]))


def test_pretrained_layers_filter(setup):
    cfg, v, sd = setup
    cfg2 = tiny_rsgnet()
    cfg2.MODEL.EXTRA.PRETRAINED_LAYERS = ("conv1", "bn1")
    sd = {k: val + 2.0 for k, val in sd.items()}
    v2, n = load_pretrained_backbone(cfg2, v, sd, nest_under="backbone")
    assert 0 < n < len(sd)
    # stem1 (conv1/bn1) loaded, stem2 untouched
    assert not np.allclose(
        np.asarray(v2["params"]["backbone"]["stem1"]["conv"]["kernel"]),
        np.asarray(v["params"]["backbone"]["stem1"]["conv"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["backbone"]["stem2"]["conv"]["kernel"]),
        np.asarray(v["params"]["backbone"]["stem2"]["conv"]["kernel"]))


def test_shape_mismatch_raises(setup):
    cfg, v, sd = setup
    bad = dict(sd)
    bad["conv1.weight"] = np.zeros((7, 3, 3, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained_backbone(cfg, v, bad, nest_under="backbone")


def test_original_variables_unmodified(setup):
    cfg, v, sd = setup
    before = np.asarray(
        v["params"]["backbone"]["stem1"]["conv"]["kernel"]).copy()
    sd2 = {k: val + 5.0 for k, val in sd.items()}
    load_pretrained_backbone(cfg, v, sd2, nest_under="backbone")
    np.testing.assert_array_equal(
        np.asarray(v["params"]["backbone"]["stem1"]["conv"]["kernel"]),
        before)
