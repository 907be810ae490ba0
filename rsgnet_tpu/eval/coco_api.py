"""Minimal COCO-format annotation container (pycocotools.coco.COCO subset).

The environment ships no pycocotools (SURVEY.md §2.22), and the north star
requires an in-repo eval stack anyway, so this is a clean-room reimplementation
of the slice of the COCO API the keypoint pipeline uses:

- load an annotation json ({"images", "annotations", "categories"}),
- index annotations by image,
- ``load_results``: turn a keypoint results list (the json the reference's
  ``dataset.evaluate`` writes: image_id, category_id, keypoints, score) into
  an indexed annotation set, deriving per-detection bbox/area from the
  keypoint extent exactly as ``COCO.loadRes`` does for keypoint results.

CrowdPose jsons use the same schema (the crowdpose-api is a cocoapi fork),
with an extra per-image ``crowdIndex`` field this container preserves.
"""
from __future__ import annotations

import copy
import json
from collections import defaultdict
from typing import Any, Dict, List


class COCOAnnotations:
    def __init__(self, annotation_file: str | None = None,
                 dataset: Dict[str, Any] | None = None):
        if annotation_file is not None:
            with open(annotation_file) as f:
                dataset = json.load(f)
        self.dataset = dataset or {"images": [], "annotations": [],
                                   "categories": []}
        self._index()

    def _index(self):
        self.imgs = {im["id"]: im for im in self.dataset.get("images", [])}
        self.anns = {a["id"]: a for a in self.dataset.get("annotations", [])}
        self.cats = {c["id"]: c for c in self.dataset.get("categories", [])}
        self.img_to_anns: Dict[int, List[dict]] = defaultdict(list)
        for a in self.dataset.get("annotations", []):
            self.img_to_anns[a["image_id"]].append(a)

    def get_img_ids(self) -> List[int]:
        return sorted(self.imgs.keys())

    def get_cat_ids(self, cat_names=None) -> List[int]:
        if cat_names is None:
            return sorted(self.cats.keys())
        return sorted(c["id"] for c in self.cats.values()
                      if c.get("name") in cat_names)

    def get_anns(self, img_id: int, cat_id: int | None = None) -> List[dict]:
        anns = self.img_to_anns.get(img_id, [])
        if cat_id is not None:
            anns = [a for a in anns if a["category_id"] == cat_id]
        return anns

    def load_results(self, results: List[dict] | str) -> "COCOAnnotations":
        """Results list/json -> indexed annotation set (COCO.loadRes for
        keypoint results: bbox/area from the keypoint hull)."""
        if isinstance(results, str):
            with open(results) as f:
                results = json.load(f)
        res = {"images": copy.deepcopy(self.dataset.get("images", [])),
               "categories": copy.deepcopy(self.dataset.get("categories", [])),
               "annotations": []}
        for i, r in enumerate(results):
            a = dict(r)
            kp = a["keypoints"]
            xs = kp[0::3]
            ys = kp[1::3]
            x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
            a.setdefault("area", (x1 - x0) * (y1 - y0))
            a.setdefault("bbox", [x0, y0, x1 - x0, y1 - y0])
            a["id"] = i + 1
            a.setdefault("iscrowd", 0)
            res["annotations"].append(a)
        return COCOAnnotations(dataset=res)
