"""Regression tests: images larger than the 640x640 source canvas are
downscaled on load (dataset.load_sample), and validate() must map predictions
BACK to original-image space before dataset.evaluate — otherwise CrowdPose
(images commonly >640px) evaluates downscaled coords against original-space
GT and AP collapses (ADVICE.md round-1 high-severity finding).
"""
import json
import os

import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.data import get_dataset
from tests.fixtures.synthetic_coco import make_dataset, write_fixture


@pytest.fixture(scope="module")
def big_fixture_root(tmp_path_factory):
    """CrowdPose-layout fixture whose images exceed the 640px canvas."""
    root = tmp_path_factory.mktemp("crowdpose_big")
    ds_dict = make_dataset(num_joints=14, img_size=(1000, 800),
                           crowd_index=True)
    os.makedirs(os.path.join(str(root), "json"))
    with open(os.path.join(str(root), "json", "crowdpose_test.json"),
              "w") as f:
        json.dump(ds_dict, f)
    write_fixture(str(root), ds_dict)
    return str(root)


def make_cfg():
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 14
    cfg.DATASET.DATASET = "crowdpose"
    return cfg


def test_load_sample_reports_downscale_factor(big_fixture_root):
    cfg = make_cfg()
    ds = get_dataset(cfg, root=big_fixture_root, image_set="test")
    s = ds.load_sample(0)
    assert s["image"].shape == (640, 640, 3)
    assert s["factor"] == pytest.approx(640.0 / 1000.0)
    # geometry scaled consistently with the image
    rec = ds.db[0]
    np.testing.assert_allclose(s["center"], rec["center"] * s["factor"],
                               rtol=1e-6)
    np.testing.assert_allclose(s["joints"],
                               rec["joints"][:, :2] * s["factor"], rtol=1e-6)


def test_validate_maps_predictions_back_to_original_space(big_fixture_root):
    """Drive validate() with an oracle infer fn that returns perfect
    predictions in DOWNSCALED space (what a perfect model would decode from
    the downscaled canvas). AP must be 1.0 — i.e. validate un-downscales."""
    from rsgnet_tpu.core.validate import validate

    cfg = make_cfg()
    ds = get_dataset(cfg, root=big_fixture_root, image_set="test")
    k = ds.num_joints

    # downscaled-space GT for each record, in dataset order
    oracle = [ds.load_sample(i) for i in range(len(ds))]
    cursor = {"i": 0}

    def fake_infer(variables, images, centers, scales):
        b = int(np.asarray(centers).shape[0])
        preds = np.zeros((b, k, 2), np.float32)
        maxvals = np.ones((b, k, 1), np.float32)
        for j in range(b):
            idx = min(cursor["i"] + j, len(oracle) - 1)   # pad repeats last
            preds[j] = oracle[idx]["joints"]
            # score by gt visibility so the zero-keypoint instance rescored
            # to 0 (mirrors test_crowdpose_dataset's perfect-preds setup)
            maxvals[j, :, 0] = oracle[idx]["joints_vis"]
        cursor["i"] += b
        return preds, maxvals

    name_value, ap = validate(cfg, ds, model=None, variables=None,
                              batch_size=4, infer_fn=(fake_infer, "image"))
    assert ap == pytest.approx(1.0), (
        "predictions were not mapped back to original-image space")


def test_device_prefetch_propagates_producer_errors():
    from rsgnet_tpu.data.loader import device_prefetch

    def bad_iterator():
        yield {"x": np.zeros((2,), np.float32)}
        raise RuntimeError("decode failed")

    it = device_prefetch(bad_iterator())
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)
