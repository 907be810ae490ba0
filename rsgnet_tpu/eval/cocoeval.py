"""COCO keypoint AP evaluation — clean-room COCOeval(iouType='keypoints').

Reimplements the pycocotools evaluation semantics the reference relies on
(SURVEY.md §2.10/§2.22, hard-part 3): OKS matrix per image, greedy matching
per IoU threshold honoring ignore regions and crowd gts, precision/recall
accumulation over 101 recall thresholds, and the standard keypoint summary
(AP, AP50, AP75, APM, APL, AR; maxDets=20; area ranges all/32^2-96^2/96^2-1e10).

Semantics matched to pycocotools:
- gts ignored when ``iscrowd`` or ``num_keypoints == 0`` or outside the area
  range; ignored gts sort after real ones and can match (without counting).
- OKS: e = (dx^2 + dy^2) / (2 * area * (2 sigma)^2), averaged over visible
  gt keypoints; when a gt has no visible keypoints its OKS uses distances to
  the 3x-expanded gt box (pycocotools computeOks fallback).
- detections sorted by -score (stable mergesort), capped at maxDets;
  unmatched detections outside the area range are ignored, not false
  positives.
- precision envelope (monotone non-increasing) sampled at recThrs via
  searchsorted; AP = mean over sampled precisions, -1 where no gt.

CrowdPose extension (SURVEY.md §2.11): ``crowd_index_ranges`` computes
AP(easy)/AP(medium)/AP(hard) by restricting accumulation to images whose
``crowdIndex`` falls in [0, 0.1), [0.1, 0.8), [0.8, 1.0] — the crowdpose-api
fork's extra stats.
"""
from __future__ import annotations

import numpy as np

from rsgnet_tpu.eval.coco_api import COCOAnnotations


class KeypointEval:
    def __init__(self, gt: COCOAnnotations, dt: COCOAnnotations, sigmas,
                 iou_thrs=None, rec_thrs=None, max_dets=20,
                 area_rngs=None, area_lbls=None, use_area=True):
        self.gt = gt
        self.dt = dt
        self.sigmas = np.asarray(sigmas, np.float64)
        self.iou_thrs = (np.linspace(0.5, 0.95, 10) if iou_thrs is None
                         else np.asarray(iou_thrs))
        self.rec_thrs = (np.linspace(0.0, 1.0, 101) if rec_thrs is None
                         else np.asarray(rec_thrs))
        self.max_dets = max_dets
        self.area_rngs = area_rngs or [(0.0, 1e10), (32.0 ** 2, 96.0 ** 2),
                                       (96.0 ** 2, 1e10)]
        self.area_lbls = area_lbls or ["all", "medium", "large"]
        self.use_area = use_area
        self.img_ids = gt.get_img_ids()
        self.stats: dict = {}
        self._eval_imgs = None

    def _area(self, ann):
        """OKS normalization area. With ``use_area`` (COCO) the segmentation
        area; otherwise (CrowdPose — annotations carry no segmentation) the
        crowdpose-api convention 0.53 * bbox_w * bbox_h. Omitting the 0.53
        shrinks OKS and breaks parity with published CrowdPose numbers."""
        if self.use_area:
            return ann["area"]
        return 0.53 * ann["bbox"][2] * ann["bbox"][3]

    # -- per-image OKS ------------------------------------------------------

    def _compute_oks(self, dts, gts):
        """(D, G) OKS matrix. dts/gts: annotation dict lists."""
        vars_ = (self.sigmas * 2.0) ** 2
        k = len(self.sigmas)
        ious = np.zeros((len(dts), len(gts)))
        dkp = np.array([d["keypoints"] for d in dts], np.float64)
        xd, yd = dkp[:, 0::3], dkp[:, 1::3]                     # (D, K)
        for j, gt in enumerate(gts):
            g = np.asarray(gt["keypoints"], np.float64)
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = np.count_nonzero(vg > 0)
            area = self._area(gt)
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                bb = gt["bbox"]
                x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
                y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
                z = np.zeros((k,))
                dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
            e = (dx ** 2 + dy ** 2) / vars_ / (area + np.spacing(1)) / 2.0
            if k1 > 0:
                e = e[:, vg > 0]
            ious[:, j] = np.sum(np.exp(-e), axis=1) / e.shape[1]
        return ious

    # -- per-image matching -------------------------------------------------

    def _evaluate_img(self, img_id, area_rng):
        gts = [dict(g) for g in self.gt.get_anns(img_id)]
        dts = list(self.dt.get_anns(img_id))
        if len(gts) == 0 and len(dts) == 0:
            return None
        for g in gts:
            ignore = (g.get("iscrowd", 0) == 1
                      or g.get("num_keypoints",
                               int(np.count_nonzero(
                                   np.asarray(g["keypoints"][2::3]) > 0))) == 0
                      or g.get("ignore", 0))
            area = self._area(g)
            g["_ignore"] = 1 if (ignore or area < area_rng[0]
                                 or area > area_rng[1]) else 0

        gt_order = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
        dt_order = np.argsort([-d["score"] for d in dts],
                              kind="mergesort")[:self.max_dets]
        # OKS is independent of the area range; compute it ONCE per image
        # and reuse across the 3 COCO area ranges (pycocotools computes
        # IoUs once too). dt_order is identical on every call (same
        # scores, stable mergesort), so the matrix only needs the
        # TOP-max_dets detections — a detector emitting 100+ per image
        # would otherwise pay ~5x the necessary OKS work
        base = self._oks_cache.get(img_id)
        if base is None:
            top_dts = [dts[i] for i in dt_order]
            base = (self._compute_oks(top_dts, gts) if (top_dts and gts)
                    else np.zeros((len(top_dts), len(gts))))
            self._oks_cache[img_id] = base
        gts = [gts[i] for i in gt_order]
        dts = [dts[i] for i in dt_order]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gts]

        # base rows are already in dt_order order; only gts re-sort per range
        ious = (base[:, gt_order] if base.size
                else np.zeros((len(dts), len(gts))))

        t_n, g_n, d_n = len(self.iou_thrs), len(gts), len(dts)
        gtm = np.zeros((t_n, g_n))
        dtm = np.zeros((t_n, d_n))
        gt_ig = np.array([g["_ignore"] for g in gts])
        dt_ig = np.zeros((t_n, d_n))
        if ious.size:
            for ti, t in enumerate(self.iou_thrs):
                for di in range(d_n):
                    iou = min(t, 1.0 - 1e-10)
                    m = -1
                    for gi in range(g_n):
                        if gtm[ti, gi] > 0 and not iscrowd[gi]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gi] == 1:
                            break
                        if ious[di, gi] < iou:
                            continue
                        iou = ious[di, gi]
                        m = gi
                    if m == -1:
                        continue
                    dt_ig[ti, di] = gt_ig[m]
                    dtm[ti, di] = gts[m]["id"]
                    gtm[ti, m] = dts[di]["id"]
        # unmatched detections outside the area range are ignored
        a = np.array([self._area(d) < area_rng[0]
                      or self._area(d) > area_rng[1]
                      for d in dts]).reshape((1, d_n))
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0,
                                                    np.repeat(a, t_n, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": np.array([d["score"] for d in dts]),
            "gtIgnore": gt_ig,
            "dtIgnore": dt_ig,
        }

    # -- accumulation -------------------------------------------------------

    def evaluate(self):
        """Match every image under every area range; cache per-image results."""
        self._oks_cache = {}
        self._eval_imgs = {
            (ai, img_id): self._evaluate_img(img_id, rng)
            for ai, rng in enumerate(self.area_rngs)
            for img_id in self.img_ids
        }
        return self

    def _accumulate_subset(self, area_idx, img_ids):
        """(precision (T, R), recall (T,)) over an image subset."""
        t_n, r_n = len(self.iou_thrs), len(self.rec_thrs)
        evals = [self._eval_imgs[(area_idx, i)] for i in img_ids]
        evals = [e for e in evals if e is not None]
        precision = -np.ones((t_n, r_n))
        recall = -np.ones((t_n,))
        if not evals:
            return precision, recall
        dt_scores = np.concatenate([e["dtScores"] for e in evals])
        order = np.argsort(-dt_scores, kind="mergesort")
        dtm = np.concatenate([e["dtMatches"] for e in evals], axis=1)[:, order]
        dt_ig = np.concatenate([e["dtIgnore"] for e in evals], axis=1)[:, order]
        gt_ig = np.concatenate([e["gtIgnore"] for e in evals])
        npig = np.count_nonzero(gt_ig == 0)
        if npig == 0:
            return precision, recall
        tps = np.logical_and(dtm > 0, np.logical_not(dt_ig))
        fps = np.logical_and(dtm == 0, np.logical_not(dt_ig))
        tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
        for ti in range(t_n):
            tp, fp = tp_sum[ti], fp_sum[ti]
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            recall[ti] = rc[-1] if len(rc) else 0.0
            pr = pr.tolist()
            # precision envelope: monotone non-increasing from the right
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds = np.searchsorted(rc, self.rec_thrs, side="left")
            q = np.zeros((r_n,))
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            precision[ti] = q
        return precision, recall

    @staticmethod
    def _mean_valid(x):
        x = x[x > -1]
        return float(np.mean(x)) if x.size else -1.0

    def accumulate(self):
        if self._eval_imgs is None:
            self.evaluate()
        self._precision = {}
        self._recall = {}
        for ai in range(len(self.area_rngs)):
            p, r = self._accumulate_subset(ai, self.img_ids)
            self._precision[ai] = p
            self._recall[ai] = r
        return self

    def summarize(self, crowd_index_ranges=None):
        """Returns the stats dict. Standard COCO keypoint stats, plus
        AP(E)/AP(M)/AP(H) when ``crowd_index_ranges`` is given (CrowdPose)."""
        if not hasattr(self, "_precision"):
            self.accumulate()
        thr = self.iou_thrs

        def ap(area_idx, iou=None):
            p = self._precision[area_idx]
            if iou is not None:
                p = p[np.where(np.isclose(thr, iou))[0]]
            return self._mean_valid(p)

        def ar(area_idx, iou=None):
            r = self._recall[area_idx]
            if iou is not None:
                r = r[np.where(np.isclose(thr, iou))[0]]
            return self._mean_valid(r)

        stats = {
            "AP": ap(0), "AP .5": ap(0, 0.5), "AP .75": ap(0, 0.75),
            "AR": ar(0), "AR .5": ar(0, 0.5), "AR .75": ar(0, 0.75),
        }
        for ai, lbl in enumerate(self.area_lbls):
            if lbl != "all":
                stats[f"AP ({lbl[0].upper()})"] = ap(ai)
                stats[f"AR ({lbl[0].upper()})"] = ar(ai)
        if crowd_index_ranges:
            for lbl, (lo, hi) in crowd_index_ranges.items():
                # half-open [lo, hi) so the splits PARTITION the images —
                # boundary crowdIndex values must not be double-counted;
                # the final bin closes at 1.0 inclusively
                def in_range(ci, lo=lo, hi=hi):
                    return lo <= ci < hi or (hi >= 1.0 and ci == hi)
                ids = [i for i in self.img_ids if in_range(
                    self.gt.imgs[i].get("crowdIndex", 0.0))]
                p, _ = self._accumulate_subset(0, ids)
                stats[f"AP ({lbl})"] = self._mean_valid(p)
        self.stats = stats
        return stats


CROWDPOSE_INDEX_RANGES = {
    "easy": (0.0, 0.1),
    "medium": (0.1, 0.8),
    "hard": (0.8, 1.0),
}
