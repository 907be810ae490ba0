"""Differential fuzz for the clean-room COCOeval (VERDICT.md round-1 item 3).

pycocotools cannot be installed in this image, so the defense for the
0.1-AP parity budget is a SECOND, independently-structured matcher — naive
O(n^3) pure-Python loops, no numpy vectorization, no helpers shared with
``rsgnet_tpu.eval.cocoeval`` — checked stat-for-stat (and precision-array-
for-precision-array) against ``KeypointEval`` over hundreds of randomized
datasets covering crowd gts, zero-keypoint gts, area-range ignores,
detections beyond maxDets, score ties, and empty images.
"""
from __future__ import annotations

import math
import random

import numpy as np
import pytest

from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.eval import COCOAnnotations, KeypointEval

SIGMAS = get_spec("coco").sigmas.tolist()
K = len(SIGMAS)


# ---------------------------------------------------------------------------
# naive reference matcher — deliberately different structure: plain dicts,
# plain lists, per-pair scalar loops, no shared code with the implementation
# ---------------------------------------------------------------------------

def naive_oks(det_kp, gt, use_area):
    """Scalar-loop OKS between one detection and one gt annotation."""
    if use_area:
        area = gt["area"]
    else:
        area = 0.53 * gt["bbox"][2] * gt["bbox"][3]
    area = area + np.spacing(1)
    gx = gt["keypoints"][0::3]
    gy = gt["keypoints"][1::3]
    gv = gt["keypoints"][2::3]
    dx_ = det_kp[0::3]
    dy_ = det_kp[1::3]
    visible = [i for i in range(K) if gv[i] > 0]
    total = 0.0
    if visible:
        idxs = visible
        for i in idxs:
            dxx = dx_[i] - gx[i]
            dyy = dy_[i] - gy[i]
            e = (dxx * dxx + dyy * dyy) / ((2.0 * SIGMAS[i]) ** 2) / area / 2.0
            total += math.exp(-e)
        return total / len(idxs)
    # no visible gt keypoints: distance to the 3x-expanded gt box
    bx, by, bw, bh = gt["bbox"]
    x0, x1 = bx - bw, bx + 2.0 * bw
    y0, y1 = by - bh, by + 2.0 * bh
    for i in range(K):
        ddx = max(0.0, x0 - dx_[i]) + max(0.0, dx_[i] - x1)
        ddy = max(0.0, y0 - dy_[i]) + max(0.0, dy_[i] - y1)
        e = (ddx * ddx + ddy * ddy) / ((2.0 * SIGMAS[i]) ** 2) / area / 2.0
        total += math.exp(-e)
    return total / K


def naive_eval_image(gts_in, dts_in, iou_thrs, area_rng, max_dets, use_area):
    """One image, one area range -> per-threshold match records."""
    if not gts_in and not dts_in:
        return None
    gts = []
    for g in gts_in:
        area = g["area"] if use_area else 0.53 * g["bbox"][2] * g["bbox"][3]
        base_ignore = bool(g.get("iscrowd", 0)) or g["num_keypoints"] == 0 \
            or bool(g.get("ignore", 0))
        ignore = base_ignore or area < area_rng[0] or area > area_rng[1]
        gts.append({"id": g["id"], "ann": g, "ignore": ignore,
                    "crowd": bool(g.get("iscrowd", 0))})
    # stable: non-ignored first
    gts = [g for g in gts if not g["ignore"]] + [g for g in gts if g["ignore"]]
    # stable score-descending, capped
    dts = sorted(dts_in, key=lambda d: -d["score"])[:max_dets]

    records = {"scores": [d["score"] for d in dts], "matched": [],
               "dt_ignore": [], "gt_ignore": [g["ignore"] for g in gts]}
    for t in iou_thrs:
        gt_used = [False] * len(gts)
        dt_match = [0] * len(dts)
        dt_ig = [False] * len(dts)
        for di, d in enumerate(dts):
            best = -1
            best_oks = min(t, 1.0 - 1e-10)
            for gi, g in enumerate(gts):
                if gt_used[gi] and not g["crowd"]:
                    continue
                # once matched to a real gt, never switch to an ignored one
                if best > -1 and not gts[best]["ignore"] and g["ignore"]:
                    break
                oks = naive_oks(d["keypoints"], g["ann"], use_area)
                if oks < best_oks:
                    continue
                best_oks = oks
                best = gi
            if best == -1:
                darea = (d["area"] if use_area
                         else 0.53 * d["bbox"][2] * d["bbox"][3])
                if darea < area_rng[0] or darea > area_rng[1]:
                    dt_ig[di] = True
                continue
            gt_used[best] = True
            dt_match[di] = gts[best]["id"]
            dt_ig[di] = gts[best]["ignore"]
        records["matched"].append(dt_match)
        records["dt_ignore"].append(dt_ig)
    return records


def naive_accumulate(per_image, iou_thrs, rec_thrs):
    """records list -> (precision (T, R), recall (T,)); -1 where no gt."""
    per_image = [r for r in per_image if r is not None]
    t_n, r_n = len(iou_thrs), len(rec_thrs)
    precision = [[-1.0] * r_n for _ in range(t_n)]
    recall = [-1.0] * t_n
    if not per_image:
        return precision, recall
    npig = sum(1 for r in per_image for ig in r["gt_ignore"] if not ig)
    if npig == 0:
        return precision, recall
    # flatten detections with (score, image order) and stable-sort by score
    flat = []
    for img_i, r in enumerate(per_image):
        for di, s in enumerate(r["scores"]):
            flat.append((s, img_i, di))
    flat.sort(key=lambda x: -x[0])          # python sort is stable
    for ti in range(t_n):
        tp, fp = 0, 0
        rc_list, pr_list = [], []
        for s, img_i, di in flat:
            r = per_image[img_i]
            if r["dt_ignore"][ti][di]:
                continue                     # ignored dets count nowhere
            if r["matched"][ti][di] > 0:
                tp += 1
            else:
                fp += 1
            rc_list.append(tp / npig)
            pr_list.append(tp / (fp + tp + np.spacing(1)))
        recall[ti] = rc_list[-1] if rc_list else 0.0
        # monotone envelope from the right
        for i in range(len(pr_list) - 1, 0, -1):
            if pr_list[i] > pr_list[i - 1]:
                pr_list[i - 1] = pr_list[i]
        # sample at recall thresholds (first index with rc >= thr)
        for ri, thr in enumerate(rec_thrs):
            pi = None
            for i, rc in enumerate(rc_list):
                if rc >= thr:
                    pi = i
                    break
            precision[ti][ri] = pr_list[pi] if pi is not None else 0.0
    return precision, recall


def naive_full_eval(gt_api, dt_api, iou_thrs, rec_thrs, area_rngs, max_dets,
                    use_area):
    """(precision, recall) per area-range index, matching KeypointEval's
    internal _precision/_recall contract."""
    out_p, out_r = {}, {}
    for ai, rng in enumerate(area_rngs):
        per_image = []
        for img_id in gt_api.get_img_ids():
            gts = list(gt_api.get_anns(img_id))
            dts = list(dt_api.get_anns(img_id))
            per_image.append(naive_eval_image(
                gts, dts, iou_thrs, rng, max_dets, use_area))
        p, r = naive_accumulate(per_image, iou_thrs, rec_thrs)
        out_p[ai] = np.asarray(p)
        out_r[ai] = np.asarray(r)
    return out_p, out_r


# ---------------------------------------------------------------------------
# randomized dataset generation
# ---------------------------------------------------------------------------

def random_dataset(rng: random.Random):
    n_imgs = rng.randint(1, 4)
    images, anns = [], []
    aid = 1
    for img_id in range(1, n_imgs + 1):
        w_img, h_img = rng.randint(200, 640), rng.randint(200, 640)
        images.append({"id": img_id, "width": w_img, "height": h_img,
                       "file_name": f"{img_id}.jpg"})
        for _ in range(rng.randint(0, 5)):
            bw = rng.uniform(20, 300)
            bh = rng.uniform(20, 300)
            bx = rng.uniform(0, max(1.0, w_img - bw))
            by = rng.uniform(0, max(1.0, h_img - bh))
            kps = []
            n_vis = 0
            zero_kp = rng.random() < 0.15
            for _ in range(K):
                v = 0 if zero_kp else rng.choice([0, 1, 2])
                x = rng.uniform(bx, bx + bw) if v else 0.0
                y = rng.uniform(by, by + bh) if v else 0.0
                kps += [round(x, 2), round(y, 2), v]
                n_vis += v > 0
            anns.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": n_vis,
                "bbox": [round(bx, 2), round(by, 2),
                         round(bw, 2), round(bh, 2)],
                "area": round(bw * bh * rng.uniform(0.3, 0.95), 2),
                "iscrowd": 1 if rng.random() < 0.2 else 0,
            })
            aid += 1
    cats = [{"id": 1, "name": "person",
             "keypoints": [f"k{i}" for i in range(K)]}]
    return {"images": images, "annotations": anns, "categories": cats}


def random_results(ds, rng: random.Random):
    res = []
    for a in ds["annotations"]:
        for _ in range(rng.choice([0, 1, 1, 2])):        # dups sometimes
            kp = list(a["keypoints"])
            for i in range(K):
                kp[3 * i] = kp[3 * i] + rng.uniform(-25, 25)
                kp[3 * i + 1] = kp[3 * i + 1] + rng.uniform(-25, 25)
                kp[3 * i + 2] = rng.uniform(0.1, 1.0)
            # quantized scores force ties; exercises stable sort order
            res.append({"image_id": a["image_id"], "category_id": 1,
                        "keypoints": kp,
                        "score": round(rng.uniform(0.05, 1.0), 1)})
    for im in ds["images"]:
        for _ in range(rng.randint(0, 3)):               # pure false positives
            kp = []
            for _ in range(K):
                kp += [rng.uniform(0, im["width"]),
                       rng.uniform(0, im["height"]), rng.uniform(0.1, 1.0)]
            res.append({"image_id": im["id"], "category_id": 1,
                        "keypoints": kp,
                        "score": round(rng.uniform(0.05, 1.0), 1)})
    return res


# ---------------------------------------------------------------------------

AREA_RNGS = [(0.0, 1e10), (32.0 ** 2, 96.0 ** 2), (96.0 ** 2, 1e10)]


def run_one_seed(seed, use_area=True, max_dets=20):
    rng = random.Random(seed)
    ds = random_dataset(rng)
    res = random_results(ds, rng)
    gt = COCOAnnotations(dataset=ds)
    if not res:
        return   # nothing to compare
    dt = gt.load_results(res)

    ev = KeypointEval(gt, dt, SIGMAS, max_dets=max_dets, use_area=use_area,
                      area_rngs=AREA_RNGS)
    ev.accumulate()
    iou_thrs = ev.iou_thrs.tolist()
    rec_thrs = ev.rec_thrs.tolist()
    np_, nr_ = naive_full_eval(gt, dt, iou_thrs, rec_thrs, AREA_RNGS,
                               max_dets, use_area)
    for ai in range(len(AREA_RNGS)):
        np.testing.assert_allclose(
            ev._precision[ai], np_[ai], atol=1e-12,
            err_msg=f"seed={seed} area_rng={ai} precision mismatch")
        np.testing.assert_allclose(
            ev._recall[ai], nr_[ai], atol=1e-12,
            err_msg=f"seed={seed} area_rng={ai} recall mismatch")


_SLOW_CHUNK = pytest.mark.skipif(
    not __import__("os").environ.get("RSGNET_SLOW_TESTS"),
    reason="full 240-dataset fuzz is slow-suite; 90 deterministic seeds "
           "run by default (VERDICT round-2 item 9 wall-time budget)")


@pytest.mark.parametrize(
    "chunk", [0, 1, 2] + [pytest.param(c, marks=_SLOW_CHUNK)
                          for c in range(3, 8)])
def test_fuzz_vs_naive_matcher(chunk):
    """200+ random datasets, precision/recall arrays must agree exactly
    (seeds deterministic, so the default 90-seed subset is a stable
    regression net; RSGNET_SLOW_TESTS=1 runs all 240)."""
    for seed in range(chunk * 30, (chunk + 1) * 30):
        run_one_seed(seed)


@pytest.mark.parametrize("chunk", range(2))
def test_fuzz_crowdpose_convention(chunk):
    """use_area=False (CrowdPose 0.53*bbox) over random datasets."""
    for seed in range(1000 + chunk * 20, 1000 + (chunk + 1) * 20):
        run_one_seed(seed, use_area=False)


def test_fuzz_small_maxdets():
    """maxDets cap stress: more detections than the cap, score ties."""
    for seed in range(2000, 2040):
        run_one_seed(seed, max_dets=3)
