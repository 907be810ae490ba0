"""Detector-bbox eval path (reference TEST.USE_GT_BBOX=false +
COCO_BBOX_FILE): detection loading, IMAGE_THRE filtering, and the soft-NMS
variant of evaluate()."""
import json
import os

import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.data import get_dataset
from tests.fixtures.synthetic_coco import (detection_results, make_dataset,
                                           write_fixture)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("det_fixture"))
    ds_dict = make_dataset()
    write_fixture(root, ds_dict)
    det_file = os.path.join(root, "detections.json")
    with open(det_file, "w") as f:
        json.dump(detection_results(ds_dict), f)
    return root, ds_dict, det_file


def make_cfg(det_file, image_thre=0.0):
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.TEST.USE_GT_BBOX = False
    cfg.TEST.COCO_BBOX_FILE = det_file
    cfg.TEST.IMAGE_THRE = image_thre
    return cfg


def test_detection_db_loads(env):
    root, ds_dict, det_file = env
    cfg = make_cfg(det_file)
    ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    n_dets = len(detection_results(ds_dict))
    assert len(ds) == n_dets
    rec = ds.db[0]
    assert rec["joints"].max() == 0.0          # no gt joints in det mode
    assert 0.0 < rec["score"] <= 1.0


def test_image_thre_filters(env):
    root, ds_dict, det_file = env
    cfg = make_cfg(det_file, image_thre=0.5)
    ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    # the 0.02-score spurious boxes are dropped
    n_good = sum(1 for d in detection_results(ds_dict) if d["score"] >= 0.5)
    assert len(ds) == n_good
    assert all(r["score"] >= 0.5 for r in ds.db)


def test_detection_eval_with_gt_keypoints(env):
    """Feed gt keypoints as predictions for the jittered detector boxes:
    AP stays high (boxes only set the rescoring, not the coordinates)."""
    root, ds_dict, det_file = env
    cfg = make_cfg(det_file, image_thre=0.5)
    ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    gt_by_img = {}
    for a in ds_dict["annotations"]:
        if not a["iscrowd"] and a["num_keypoints"] > 0:
            gt_by_img.setdefault(a["image_id"], []).append(
                np.asarray(a["keypoints"], np.float32).reshape(-1, 3))
    n, k = len(ds), ds.num_joints
    preds = np.zeros((n, k, 3), np.float32)
    boxes = np.zeros((n, 6), np.float32)
    ids = np.zeros((n,), np.int64)
    for i, rec in enumerate(ds.db):
        # nearest gt person to this detector box
        cands = gt_by_img[rec["image_id"]]
        centers = [c[:, :2].mean(0) for c in cands]
        j = int(np.argmin([np.linalg.norm(c - rec["center"])
                           for c in centers]))
        preds[i, :, :2] = cands[j][:, :2]
        preds[i, :, 2] = 1.0
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(rec["scale"] * 200.0)
        boxes[i, 5] = rec["score"]
        ids[i] = rec["image_id"]
    name_value, ap = ds.evaluate(preds, boxes, ids)
    assert ap == pytest.approx(1.0)           # duplicates removed by OKS-NMS


def test_soft_nms_eval(env):
    root, ds_dict, det_file = env
    cfg = make_cfg(det_file, image_thre=0.5)
    cfg.TEST.SOFT_NMS = True
    ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    n, k = len(ds), ds.num_joints
    gt = {a["id"]: a for a in ds_dict["annotations"]}
    preds = np.zeros((n, k, 3), np.float32)
    boxes = np.zeros((n, 6), np.float32)
    ids = np.zeros((n,), np.int64)
    kp_by_img = {}
    for a in ds_dict["annotations"]:
        if not a["iscrowd"] and a["num_keypoints"] > 0:
            kp_by_img.setdefault(a["image_id"], []).append(
                np.asarray(a["keypoints"], np.float32).reshape(-1, 3))
    for i, rec in enumerate(ds.db):
        cands = kp_by_img[rec["image_id"]]
        j = int(np.argmin([np.linalg.norm(c[:, :2].mean(0) - rec["center"])
                           for c in cands]))
        preds[i, :, :2] = cands[j][:, :2]
        preds[i, :, 2] = 1.0
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(rec["scale"] * 200.0)
        boxes[i, 5] = rec["score"]
        ids[i] = rec["image_id"]
    name_value, ap = ds.evaluate(preds, boxes, ids)
    assert np.isfinite(ap) and ap > 0.5
