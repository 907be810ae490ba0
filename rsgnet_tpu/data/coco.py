"""COCO keypoint dataset (reference ``lib/dataset/coco.py``, SURVEY.md §2.10).

Capabilities reproduced:
- gt-bbox or detector-bbox instance lists (``TEST.USE_GT_BBOX`` /
  ``TEST.COCO_BBOX_FILE`` with ``TEST.IMAGE_THRE`` score filter),
- box -> center/scale with pixel_std 200, aspect-ratio fix, 1.25x padding,
- ``evaluate()``: rescoring (mean kpt score over joints above
  ``TEST.IN_VIS_THRE``, times box score), per-image OKS-NMS
  (``TEST.OKS_THRE``, soft variant behind ``TEST.SOFT_NMS``), keypoint
  results json, and the in-repo COCOeval (AP/AP50/AP75/APM/APL/AR).
"""
from __future__ import annotations

import json
import os
from collections import OrderedDict, defaultdict

import numpy as np

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.dataset import TopDownDataset
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.eval import COCOAnnotations, KeypointEval
from rsgnet_tpu.ops.affine import box_to_center_scale
from rsgnet_tpu.ops.nms_native import (oks_nms_cpp as oks_nms_np,
                                       soft_oks_nms_cpp as soft_oks_nms_np)


class COCODataset(TopDownDataset):
    dataset_name = "coco"

    def __init__(self, cfg: Config, root: str, image_set: str, is_train: bool,
                 ann_file: str | None = None, image_dir: str | None = None):
        # dataset_name is a class attr so CrowdPoseDataset gets its own spec
        super().__init__(cfg, root, image_set, is_train,
                         get_spec(self.dataset_name))
        self.ann_file = ann_file or os.path.join(
            root, "annotations", f"person_keypoints_{image_set}.json")
        self.image_dir = image_dir or self._default_image_dir()
        self.coco = COCOAnnotations(self.ann_file)
        self.image_set_index = self.coco.get_img_ids()
        if is_train or cfg.TEST.USE_GT_BBOX:
            self.db = self._load_gt_db()
        else:
            self.db = self._load_detection_db(cfg.TEST.COCO_BBOX_FILE)
        if is_train and cfg.DATASET.SELECT_DATA:
            self.db = self.select_data(self.db)

    def _default_image_dir(self):
        cand = os.path.join(self.root, "images", self.image_set)
        if os.path.isdir(cand):
            return cand
        return os.path.join(self.root, "images")

    def _image_path(self, file_name):
        return os.path.join(self.image_dir, file_name)

    # -- instance lists -----------------------------------------------------

    def _load_gt_db(self):
        db = []
        for img_id in self.image_set_index:
            im = self.coco.imgs[img_id]
            width, height = im["width"], im["height"]
            for ann in self.coco.get_anns(img_id):
                if ann.get("iscrowd", 0):
                    continue
                # reference kernal filters to the person category before
                # touching keypoints — a merged/instances-style json must
                # not crash (missing 'keypoints') or pollute the db
                if ann.get("category_id", 1) != 1:
                    continue
                # clean bbox (reference kernal): clip to image, require area
                x, y, w, h = ann["bbox"]
                x1, y1 = max(0, x), max(0, y)
                x2 = min(width - 1, x1 + max(0, w - 1))
                y2 = min(height - 1, y1 + max(0, h - 1))
                if ann.get("area", w * h) <= 0 or x2 < x1 or y2 < y1:
                    continue
                clean = [x1, y1, x2 - x1, y2 - y1]
                kp = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
                # the reference skips zero-keypoint instances
                # UNCONDITIONALLY (train AND the USE_GT_BBOX eval db): COCO
                # val has thousands of them, and keeping them at eval adds
                # spurious rescored predictions that can OKS-suppress real
                # ones — AP would silently diverge from the reference
                if float(kp.max()) == 0:
                    continue
                joints = np.zeros((self.num_joints, 3), np.float32)
                joints[:, :2] = kp[:, :2]
                vis = np.zeros((self.num_joints, 3), np.float32)
                vis[:, 0] = vis[:, 1] = np.minimum(1.0, kp[:, 2])
                center, scale = box_to_center_scale(clean, self.aspect_ratio)
                db.append({
                    "image_path": self._image_path(im["file_name"]),
                    "image_id": img_id,
                    "center": center, "scale": scale,
                    "joints": joints, "joints_vis": vis,
                    "score": 1.0,
                })
        return db

    def _load_detection_db(self, bbox_file):
        with open(bbox_file) as f:
            boxes = json.load(f)
        db = []
        img_files = {i: self.coco.imgs[i]["file_name"]
                     for i in self.image_set_index}
        for det in boxes:
            if det.get("category_id", 1) != 1:
                continue
            score = det["score"]
            if score < self.cfg.TEST.IMAGE_THRE:
                continue
            img_id = det["image_id"]
            if img_id not in img_files:
                continue
            center, scale = box_to_center_scale(det["bbox"], self.aspect_ratio)
            blank = np.zeros((self.num_joints, 3), np.float32)
            ones = np.ones((self.num_joints, 3), np.float32)
            db.append({
                "image_path": self._image_path(img_files[img_id]),
                "image_id": img_id,
                "center": center, "scale": scale,
                "joints": blank, "joints_vis": ones,
                "score": float(score),
            })
        return db

    # -- evaluation (reference `evaluate`) ----------------------------------

    STAT_KEYS = ["AP", "AP .5", "AP .75", "AP (M)", "AP (L)",
                 "AR", "AR .5", "AR .75", "AR (M)", "AR (L)"]

    def _run_keypoint_eval(self, results) -> dict:
        """Hook: dataset-specific KeypointEval construction/summary."""
        dt = self.coco.load_results(results)
        return KeypointEval(self.coco, dt, self.spec.sigmas).summarize()

    def evaluate(self, preds, all_boxes, image_ids, output_dir=None):
        """preds (N, K, 3); all_boxes (N, 6) [cx, cy, sx, sy, area, score].

        Shared pipeline (COCO + CrowdPose): per-image grouping, rescoring
        (mean keypoint score above IN_VIS_THRE times box score), OKS-NMS
        (soft behind TEST.SOFT_NMS), results json, then the dataset's
        ``_run_keypoint_eval`` hook.
        """
        preds = np.asarray(preds)
        all_boxes = np.asarray(all_boxes)
        per_image = defaultdict(list)
        for i, img_id in enumerate(image_ids):
            per_image[int(img_id)].append({
                "keypoints": preds[i],
                "center": all_boxes[i, 0:2],
                "scale": all_boxes[i, 2:4],
                "area": all_boxes[i, 4],
                "score": all_boxes[i, 5],
                "image": int(img_id),
            })

        in_vis_thre = self.cfg.TEST.IN_VIS_THRE
        oks_thre = self.cfg.TEST.OKS_THRE
        image_groups = list(per_image.values())
        for img_kpts in image_groups:
            for p in img_kpts:
                box_score = p["score"]
                kscores = p["keypoints"][:, 2]
                valid = kscores > in_vis_thre
                kpt_score = (float(kscores[valid].sum() / valid.sum())
                             if valid.any() else 0.0)
                p["score"] = kpt_score * box_score

        kept = []
        if self.cfg.TEST.DEVICE_NMS:
            # vectorized device kernel: every image's suppression in ONE call
            from rsgnet_tpu.ops.nms import (batched_oks_nms_jax,
                                            batched_soft_oks_nms_jax)
            kp_l = [np.stack([p["keypoints"] for p in g])
                    for g in image_groups]
            sc_l = [np.asarray([p["score"] for p in g]) for g in image_groups]
            ar_l = [np.asarray([p["area"] for p in g]) for g in image_groups]
            if self.cfg.TEST.SOFT_NMS:
                # reference parity: soft-NMS selects instances but the
                # results json keeps the pre-decay scores (lib/nms/nms.py
                # soft_oks_nms used only for its keep list)
                keeps = [idx for idx, _ in batched_soft_oks_nms_jax(
                    kp_l, sc_l, ar_l, self.spec.sigmas, oks_thre)]
            else:
                keeps = batched_oks_nms_jax(kp_l, sc_l, ar_l,
                                            self.spec.sigmas, oks_thre)
            for g, keep in zip(image_groups, keeps):
                kept.append(g if len(keep) == 0 else [g[k] for k in keep])
        else:
            for img_kpts in image_groups:
                if self.cfg.TEST.SOFT_NMS:
                    keep, _ = soft_oks_nms_np(img_kpts, oks_thre,
                                              self.spec.sigmas)
                else:
                    keep = oks_nms_np(img_kpts, oks_thre, self.spec.sigmas)
                kept.append(img_kpts if len(keep) == 0
                            else [img_kpts[k] for k in keep])

        results = self._results_json(kept)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            res_file = os.path.join(
                output_dir, f"keypoints_{self.image_set}_results.json")
            with open(res_file, "w") as f:
                json.dump(results, f)

        stats = self._run_keypoint_eval(results)
        name_value = OrderedDict(
            (k, stats[k]) for k in self.STAT_KEYS if k in stats)
        return name_value, name_value["AP"]

    def _results_json(self, kept_per_image):
        out = []
        for img_kpts in kept_per_image:
            for p in img_kpts:
                kp = np.asarray(p["keypoints"], np.float64)
                out.append({
                    "image_id": int(p["image"]),
                    "category_id": 1,
                    "keypoints": [round(float(v), 3)
                                  for v in kp.reshape(-1)],
                    "score": float(p["score"]),
                    "center": [float(c) for c in p["center"]],
                    "scale": [float(s) for s in p["scale"]],
                })
        return out
