"""WHOLE-eval-pipeline torch-mirror parity (composition-level evidence).

Every stage of the eval path has its own oracle test (torch forward, cv2
warp, numpy decode, numpy inverse affine) — this test checks the
COMPOSITION: a second, independently assembled pipeline in torch/numpy
conventions (normalize -> NCHW torch flagship forward -> reference-style
flip_back + SHIFT_HEATMAP -> numpy argmax/quarter-offset decode -> numpy
transform_preds) must produce the same image-space keypoints and the same
AP table as ``collect_predictions`` + ``dataset.evaluate`` over the
synthetic COCO fixture. This catches stage-boundary bugs (normalization
order, flip-permutation application point, decode input layout, inverse
affine argument order) that per-stage oracles cannot.

Both sides consume the SAME host crops (``collate(..., cropped=True)``) —
the crop itself is pinned to cv2 by tests/test_cv2_parity.py; here the
subject is everything after it. Reference: SURVEY.md §3.2 validate().
"""
import numpy as np

import pytest

from rsgnet_tpu.core.validate import collect_predictions
from rsgnet_tpu.data import get_dataset
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.ops.affine import transform_preds

from test_decode import _get_max_preds_oracle, _quarter_oracle
from test_torch_rsg_oracle import _randomized, _tiny_rsg_cfg
from torch_rsgnet import torch_rsgnet_forward


def _make_fixture(tmp_path_factory, dataset):
    import json
    import os
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture
    root = str(tmp_path_factory.mktemp(f"{dataset}_e2e_parity"))
    if dataset == "coco":
        write_fixture(root, make_dataset())
        return root, "val"
    ds_dict = make_dataset(num_joints=14, crowd_index=True)
    os.makedirs(os.path.join(root, "json"))
    with open(os.path.join(root, "json", "crowdpose_test.json"), "w") as f:
        json.dump(ds_dict, f)
    write_fixture(root, ds_dict)
    return root, "test"


def _torch_pipeline(cfg, forward, spec, batch):
    """The reference validate() body, assembled INDEPENDENTLY in
    torch/numpy conventions. batch: host-cropped uint8 inputs + metadata;
    forward: NCHW numpy -> NCHW heatmaps (a torch-mirror model)."""
    # ToTensor + Normalize(imagenet) — torchvision convention
    x = batch["input"].astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (x - mean) / std
    x_nchw = np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))

    out = forward(x_nchw)
    assert cfg.TEST.FLIP_TEST
    out_f = forward(np.ascontiguousarray(x_nchw[:, :, :, ::-1]))
    # reference flip_back: mirror x, swap L/R channels, SHIFT_HEATMAP
    out_f = out_f[:, :, :, ::-1].copy()
    for a, b in spec.flip_pairs:
        out_f[:, [a, b]] = out_f[:, [b, a]]
    assert cfg.TEST.SHIFT_HEATMAP
    out_f[:, :, :, 1:] = out_f[:, :, :, 0:-1].copy()
    avg = (out + out_f) * 0.5

    coords, maxvals = _get_max_preds_oracle(avg)
    assert cfg.TEST.POST_PROCESS and cfg.TEST.DECODE == "default"
    coords = _quarter_oracle(avg, coords)
    hm_w, hm_h = cfg.MODEL.HEATMAP_SIZE
    preds = np.stack([
        transform_preds(coords[i], batch["center"][i], batch["scale"][i],
                        (hm_w, hm_h))
        for i in range(coords.shape[0])])
    return (np.concatenate([preds, maxvals], -1).astype(np.float32),
            maxvals)


@pytest.mark.parametrize("dataset,seed", [("coco", 3), ("crowdpose", 4)])
def test_eval_pipeline_matches_torch_mirror(tmp_path_factory, dataset, seed):
    root, image_set = _make_fixture(tmp_path_factory, dataset)
    cfg = _tiny_rsg_cfg(dataset)
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = image_set
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    spec = get_spec(dataset)
    model = get_pose_net(cfg)
    variables = _randomized(model, cfg, seed=seed)

    ds = get_dataset(cfg, root=root, image_set=image_set, is_train=False)
    n = len(ds)

    ours_preds, ours_boxes, ours_ids = collect_predictions(
        cfg, ds, model, variables, num_workers=2, pipeline="host")

    batch = ds.collate(np.arange(n), cropped=True)
    adjacency = spec.adjacency()

    def forward(x_nchw):
        return torch_rsgnet_forward(cfg, variables, adjacency, x_nchw)[0]

    theirs_preds, _ = _torch_pipeline(cfg, forward, spec, batch)

    # coordinates in ORIGINAL-image space; fp32 two-framework noise is
    # ~1e-4 heatmap units, far below a quarter-offset step — sub-1e-2 px
    np.testing.assert_allclose(ours_preds[:, :, :2],
                               theirs_preds[:, :, :2], atol=1e-2)
    np.testing.assert_allclose(ours_preds[:, :, 2],
                               theirs_preds[:, :, 2], atol=1e-4)
    np.testing.assert_array_equal(ours_ids, batch["image_id"].reshape(-1))

    # identical AP tables through the same evaluator
    nv_ours, ap_ours = ds.evaluate(ours_preds, ours_boxes, ours_ids)
    nv_theirs, ap_theirs = ds.evaluate(theirs_preds, ours_boxes, ours_ids)
    assert ap_ours == pytest.approx(ap_theirs, abs=1e-9)
    for k in nv_ours:
        assert nv_ours[k] == pytest.approx(nv_theirs[k], abs=1e-9), k


def test_mpii_resnet_pipeline_matches_torch_mirror(tmp_path_factory):
    """Same composition check through the OTHER family and the OTHER eval
    contract: pose_resnet (SimpleBaseline, torch mirror from
    tests/torch_resnet.py via export_state_dict) on the MPII fixture —
    MPII's 16-kpt flip pairs and the no-NMS PCKh@0.5 evaluate path."""
    from rsgnet_tpu.config.defaults import tiny_resnet
    from rsgnet_tpu.utils.torch_convert import export_state_dict
    from tests.fixtures.synthetic_mpii import (NUM_JOINTS, make_entries,
                                               write_fixture)
    from test_torch_resnet_oracle import _randomized_variables
    from torch_resnet import torch_forward

    root = str(tmp_path_factory.mktemp("mpii_e2e_parity"))
    write_fixture(root, make_entries())

    cfg = tiny_resnet()
    cfg.MODEL.NUM_JOINTS = NUM_JOINTS
    cfg.DATASET.DATASET = "mpii"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "valid"
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    spec = get_spec("mpii")
    model, variables = _randomized_variables(cfg, seed=5)
    sd = export_state_dict(cfg, variables["params"],
                           variables["batch_stats"])

    ds = get_dataset(cfg, root=root, image_set="valid", is_train=False)
    n = len(ds)
    ours_preds, _, ours_ids = collect_predictions(
        cfg, ds, model, variables, num_workers=2, pipeline="host")

    batch = ds.collate(np.arange(n), cropped=True)
    theirs_preds, _ = _torch_pipeline(
        cfg, lambda x: torch_forward(cfg, sd, x), spec, batch)

    np.testing.assert_allclose(ours_preds[:, :, :2],
                               theirs_preds[:, :, :2], atol=1e-2)
    nv_ours, m_ours = ds.evaluate(ours_preds, None, ours_ids)
    nv_theirs, m_theirs = ds.evaluate(theirs_preds, None, ours_ids)
    assert m_ours == pytest.approx(m_theirs, abs=1e-9)
    for k in nv_ours:
        assert nv_ours[k] == pytest.approx(nv_theirs[k], abs=1e-9), k
