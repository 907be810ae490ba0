"""MPII single-person dataset + PCKh@0.5 evaluation (reference
``lib/dataset/mpii.py`` — the HRNet-family layout's third dataset; the
reference mount has been empty all rounds, so semantics are pinned to the
public HRNet-family code [K] and the MPII benchmark protocol).

Differences from COCO/CrowdPose that shape this file:

- **Single-person**: one annotated person per record, no detector boxes, no
  rescoring, and no OKS-NMS — ``evaluate`` compares prediction *i* directly
  against db record *i*.
- **Annotation format**: ``{root}/annot/{image_set}.json`` is a flat list of
  ``{"image", "center", "scale", "joints", "joints_vis"}`` dicts (the
  matlab-converted format the HRNet family ships). Coordinates are 1-based
  (matlab); ``scale`` is an isotropic scalar in units of 200 px.
- **Reference load-time adjustments** (reproduced exactly):
  ``center[1] += 15 * scale`` then ``scale *= 1.25`` (avoid cropping limbs,
  applied when the center is valid), then ``center -= 1`` and
  ``joints -= 1`` (matlab -> 0-based).
- **Metric**: PCKh — a joint is correct when its error is within
  ``0.5 * SC_BIAS * headsize`` where ``headsize`` is the annotated head-box
  diagonal and SC_BIAS = 0.6. Reported per joint group plus a visible-count
  -weighted Mean that EXCLUDES pelvis (6) and thorax (7).

Ground-truth head boxes come from either
- the reference's ``{root}/annot/gt_{image_set}.mat`` (``headboxes_src``/
  ``pos_gt_src``/``jnt_missing``, loaded via scipy.io) when present — this
  is the file the official eval uses, so numbers are comparable — or
- a ``"headbox"`` field ``[x1, y1, x2, y2]`` (1-based, like everything else
  in the json) on each annotation entry (our fixture format; also easy to
  emit when converting MPII's original .mat release).
Both paths are differentially tested against each other
(``tests/test_mpii.py``).
"""
from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.dataset import TopDownDataset
from rsgnet_tpu.data.skeletons import get_spec

SC_BIAS = 0.6

# MPII joint order (data/skeletons.py MPII spec): groups for the standard
# PCKh table. Head uses the head-TOP joint (index 9), matching the name
# lookup the reference does against the gt mat's ``dataset_joints``.
_GROUPS = (("Head", (9,)), ("Shoulder", (13, 12)), ("Elbow", (14, 11)),
           ("Wrist", (15, 10)), ("Hip", (3, 2)), ("Knee", (4, 1)),
           ("Ankle", (5, 0)))
_MEAN_EXCLUDED = (6, 7)          # pelvis, thorax: masked out of Mean


class MPIIDataset(TopDownDataset):
    dataset_name = "mpii"

    def __init__(self, cfg: Config, root: str, image_set: str, is_train: bool,
                 ann_file: str | None = None, image_dir: str | None = None):
        super().__init__(cfg, root, image_set, is_train, get_spec("mpii"))
        self.ann_file = ann_file or os.path.join(
            root, "annot", f"{image_set}.json")
        self.image_dir = image_dir or os.path.join(root, "images")
        self.db = self._load_db()
        if is_train and cfg.DATASET.SELECT_DATA:
            self.db = self.select_data(self.db)

    def _load_db(self):
        with open(self.ann_file) as f:
            anns = json.load(f)
        k = self.num_joints
        has_gt = "test" not in self.image_set
        db = []
        for idx, a in enumerate(anns):
            c = np.asarray(a["center"], np.float32)
            s = np.asarray([a["scale"], a["scale"]], np.float32)
            if c[0] != -1:
                # reference: lift the crop to avoid cutting limbs, pad 1.25x
                c[1] = c[1] + 15 * s[1]
                s = s * 1.25
            c = c - 1                              # matlab 1-based -> 0-based
            joints = np.zeros((k, 3), np.float32)
            vis = np.zeros((k, 3), np.float32)
            if has_gt:
                j = np.asarray(a["joints"], np.float32).reshape(k, -1)
                joints[:, :2] = j[:, :2] - 1
                v = np.asarray(a["joints_vis"], np.float32).reshape(k)
                vis[:, 0] = vis[:, 1] = v
            rec = {
                "image_path": os.path.join(self.image_dir, a["image"]),
                # MPII jsons carry no image ids; the db index doubles as the
                # instance id evaluate() realigns predictions by
                "image_id": idx,
                "center": c, "scale": s,
                "joints": joints, "joints_vis": vis,
                "score": 1.0,
            }
            if "headbox" in a:
                rec["headbox"] = np.asarray(a["headbox"], np.float32) - 1
            db.append(rec)
        return db

    # -- PCKh ground truth ---------------------------------------------------

    def _gt_arrays(self):
        """(pos_gt (N, K, 2) 0-based, visible (N, K), headsizes (N,)).

        Prefers the reference's ``gt_{image_set}.mat`` (scipy.io) so results
        are computed from the very file the official eval reads; falls back
        to per-record json head boxes.
        """
        mat_path = os.path.join(self.root, "annot",
                                f"gt_{self.image_set}.mat")
        if os.path.exists(mat_path):
            from scipy.io import loadmat
            gt = loadmat(mat_path)
            # (K, 2, N) 1-based -> (N, K, 2) 0-based
            pos_gt = np.transpose(gt["pos_gt_src"], (2, 0, 1)) - 1.0
            visible = 1.0 - np.transpose(gt["jnt_missing"], (1, 0))
            hb = gt["headboxes_src"]               # (2 corners, 2 xy, N)
            headsizes = np.linalg.norm(hb[1] - hb[0], axis=0)
            return pos_gt, visible, headsizes
        if not all("headbox" in r for r in self.db):
            raise FileNotFoundError(
                f"PCKh needs head boxes: provide {mat_path} (reference "
                f"gt mat) or a 'headbox' field on every entry of "
                f"{self.ann_file}")
        pos_gt = np.stack([r["joints"][:, :2] for r in self.db])
        visible = np.stack([r["joints_vis"][:, 0] for r in self.db])
        hb = np.stack([r["headbox"] for r in self.db])     # (N, 4)
        headsizes = np.linalg.norm(hb[:, 2:] - hb[:, :2], axis=1)
        return pos_gt, visible, headsizes

    # -- evaluation ----------------------------------------------------------

    def evaluate(self, preds, all_boxes, image_ids, output_dir=None):
        """PCKh@0.5 table. ``all_boxes`` is unused (single-person, no
        rescoring/NMS); ``image_ids`` are db indices and realign ``preds``
        with the annotation order."""
        preds = np.asarray(preds, np.float64)[:, :, :2]
        order = np.argsort(np.asarray(image_ids))
        preds = preds[order]

        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            # the reference writes pred.mat (matlab 1-based) for the official
            # eval scripts; keep that exact artifact
            from scipy.io import savemat
            savemat(os.path.join(output_dir, "pred.mat"),
                    mdict={"preds": preds + 1.0})

        if "test" in self.image_set:               # no public test gt
            return OrderedDict([("Null", 0.0)]), 0.0

        pos_gt, visible, headsizes = self._gt_arrays()
        assert preds.shape[0] == pos_gt.shape[0], \
            (preds.shape, pos_gt.shape)

        err = np.linalg.norm(preds - pos_gt, axis=2)       # (N, K)
        scale = np.maximum(headsizes, 1e-12)[:, None] * SC_BIAS
        scaled_err = err / scale
        jnt_count = np.maximum(visible.sum(axis=0), 1e-12)  # per joint

        def pckh(thr):
            hit = (scaled_err <= thr) & (visible > 0)
            return 100.0 * hit.sum(axis=0) / jnt_count      # (K,)

        pckh_05 = pckh(0.5)
        # the reference's "Mean@0.1" indexes row 11 of a 0:0.01:0.5 threshold
        # sweep — i.e. threshold 0.11, not 0.10 (a known quirk of the public
        # code); reproduced verbatim so the number is comparable
        pckh_01 = pckh(0.11)

        included = np.ones(self.num_joints, bool)
        included[list(_MEAN_EXCLUDED)] = False
        ratio = np.where(included, visible.sum(axis=0), 0.0)
        ratio = ratio / ratio.sum()

        name_value = OrderedDict()
        for name, idxs in _GROUPS:
            name_value[name] = float(np.mean([pckh_05[i] for i in idxs]))
        name_value["Mean"] = float((pckh_05 * ratio).sum())
        name_value["Mean@0.1"] = float((pckh_01 * ratio).sum())
        if output_dir:
            with open(os.path.join(output_dir, "pckh.json"), "w") as f:
                json.dump({k: v for k, v in name_value.items()}, f)
        return name_value, name_value["Mean"]
