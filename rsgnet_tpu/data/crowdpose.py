"""CrowdPose dataset (reference ``lib/dataset/crowdpose.py``, SURVEY.md §2.11).

Same pattern as COCO with 14 keypoints, the crowdpose annotation layout
(``{root}/json/crowdpose_{set}.json``, flat ``{root}/images/`` dir), OKS with
CrowdPose sigmas normalized by the gt *bbox* area (the crowdpose-api fork's
convention — annotations carry no segmentation area), and AP reported with
the crowd-index splits AP(easy)/AP(medium)/AP(hard) per BASELINE.json:10.

The rescoring/OKS-NMS/results pipeline is the shared
``COCODataset.evaluate``; only the evaluator construction differs
(``_run_keypoint_eval`` hook).
"""
from __future__ import annotations

import os

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.coco import COCODataset
from rsgnet_tpu.eval import KeypointEval
from rsgnet_tpu.eval.cocoeval import CROWDPOSE_INDEX_RANGES


class CrowdPoseDataset(COCODataset):
    dataset_name = "crowdpose"

    STAT_KEYS = ["AP", "AP .5", "AP .75", "AR", "AR .5", "AR .75",
                 "AP (easy)", "AP (medium)", "AP (hard)"]

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

    def _run_keypoint_eval(self, results) -> dict:
        dt = self.coco.load_results(results)
        return KeypointEval(
            self.coco, dt, self.spec.sigmas, use_area=False,
            area_rngs=[(0.0, 1e10)], area_lbls=["all"],
        ).summarize(crowd_index_ranges=CROWDPOSE_INDEX_RANGES)
