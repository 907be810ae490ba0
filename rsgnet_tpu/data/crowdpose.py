"""CrowdPose dataset (reference ``lib/dataset/crowdpose.py``, SURVEY.md §2.11).

Same pattern as COCO with 14 keypoints, the crowdpose annotation layout
(``{root}/json/crowdpose_{set}.json``, flat ``{root}/images/`` dir), OKS with
CrowdPose sigmas normalized by the gt *bbox* area (the crowdpose-api fork's
convention — annotations carry no segmentation area), and AP reported with
the crowd-index splits AP(easy)/AP(medium)/AP(hard) per BASELINE.json:10.
"""
from __future__ import annotations

import json
import os
from collections import OrderedDict, defaultdict

import numpy as np

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.coco import COCODataset
from rsgnet_tpu.eval import KeypointEval
from rsgnet_tpu.eval.cocoeval import CROWDPOSE_INDEX_RANGES
from rsgnet_tpu.ops.nms_native import (oks_nms_cpp as oks_nms_np,
                                       soft_oks_nms_cpp as soft_oks_nms_np)


class CrowdPoseDataset(COCODataset):
    dataset_name = "crowdpose"

    def __init__(self, cfg: Config, root: str, image_set: str, is_train: bool,
                 ann_file: str | None = None, image_dir: str | None = None):
        ann_file = ann_file or os.path.join(
            root, "json", f"crowdpose_{image_set}.json")
        if not os.path.exists(ann_file):
            ann_file = os.path.join(
                root, "annotations", f"crowdpose_{image_set}.json")
        image_dir = image_dir or os.path.join(root, "images")
        super().__init__(cfg, root, image_set, is_train,
                         ann_file=ann_file, image_dir=image_dir)

    def evaluate(self, preds, all_boxes, image_ids, output_dir=None):
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
        kept = []
        for img_id, img_kpts in per_image.items():
            for p in img_kpts:
                kscores = p["keypoints"][:, 2]
                valid = kscores > in_vis_thre
                kpt_score = (float(kscores[valid].sum() / valid.sum())
                             if valid.any() else 0.0)
                p["score"] = kpt_score * p["score"]
            if self.cfg.TEST.SOFT_NMS:
                keep, _ = soft_oks_nms_np(img_kpts, oks_thre, self.spec.sigmas)
            else:
                keep = oks_nms_np(img_kpts, oks_thre, self.spec.sigmas)
            kept.append(img_kpts if len(keep) == 0
                        else [img_kpts[k] for k in keep])

        results = self._results_json(kept)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(
                    output_dir,
                    f"keypoints_{self.image_set}_results.json"), "w") as f:
                json.dump(results, f)

        dt = self.coco.load_results(results)
        stats = KeypointEval(
            self.coco, dt, self.spec.sigmas, use_area=False,
            area_rngs=[(0.0, 1e10)], area_lbls=["all"],
        ).summarize(crowd_index_ranges=CROWDPOSE_INDEX_RANGES)
        name_value = OrderedDict(
            (k, stats[k]) for k in
            ["AP", "AP .5", "AP .75", "AR", "AR .5", "AR .75",
             "AP (easy)", "AP (medium)", "AP (hard)"] if k in stats)
        return name_value, name_value["AP"]
