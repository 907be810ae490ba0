"""KeypointEval tests against hand-computed OKS and known-AP scenarios
(SURVEY.md §4(2,4): the COCOeval reimplementation is subtle — tiny fixture +
hand-computed cases)."""
import numpy as np
import pytest

from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.eval import COCOAnnotations, KeypointEval
from rsgnet_tpu.eval.cocoeval import CROWDPOSE_INDEX_RANGES
from tests.fixtures.synthetic_coco import (make_dataset, make_person,
                                           perfect_results)

SIGMAS = get_spec("coco").sigmas


def run_eval(dataset, results, **kw):
    gt = COCOAnnotations(dataset=dataset)
    dt = gt.load_results(results)
    return KeypointEval(gt, dt, SIGMAS, **kw).summarize()


def test_perfect_predictions_ap1():
    ds = make_dataset()
    stats = run_eval(ds, perfect_results(ds))
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP .5"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_shifted_predictions_degrade():
    ds = make_dataset()
    res = perfect_results(ds)
    aps = []
    for shift in (0.0, 5.0, 30.0):
        shifted = []
        for r in res:
            kp = list(r["keypoints"])
            kp[0::3] = [x + shift for x in kp[0::3]]
            shifted.append(dict(r, keypoints=kp))
        aps.append(run_eval(ds, shifted)["AP"])
    assert aps[0] == pytest.approx(1.0)
    assert aps[0] > aps[1] > aps[2]


def test_missing_detection_lowers_recall():
    ds = make_dataset()
    res = perfect_results(ds)[:-1]            # drop one person
    stats = run_eval(ds, res)
    assert stats["AR"] < 1.0
    assert stats["AP"] < 1.0


def test_false_positive_lowers_ap_not_recall():
    ds = make_dataset()
    res = perfect_results(ds)
    fp = dict(res[0])
    kp = list(fp["keypoints"])
    kp[0::3] = [x + 400 for x in kp[0::3]]     # far from any gt
    res.append(dict(fp, keypoints=kp, score=0.99))
    stats = run_eval(ds, res)
    assert stats["AR"] == pytest.approx(1.0)
    assert stats["AP"] < 1.0


def test_crowd_and_zero_kp_gts_ignored():
    """Crowd/0-kp gts must not create false negatives."""
    ds = make_dataset()
    n_real = sum(1 for a in ds["annotations"]
                 if not a["iscrowd"] and a["num_keypoints"] > 0)
    res = perfect_results(ds)
    assert len(res) == n_real
    stats = run_eval(ds, res)
    assert stats["AP"] == pytest.approx(1.0)


def test_single_pair_oks_matches_hand_formula():
    """One gt/dt pair, known offset: AP@t flips where hand-OKS crosses t."""
    person = make_person(1, 1, 200, 200, 100, 200)
    ds = {"images": [{"id": 1, "width": 640, "height": 480,
                      "file_name": "x.jpg"}],
          "annotations": [person],
          "categories": [{"id": 1, "name": "person"}]}
    kp = np.asarray(person["keypoints"], np.float64).reshape(-1, 3)
    off = 6.0
    dt_kp = kp.copy()
    dt_kp[:, 0] += off
    # hand OKS
    vars_ = (SIGMAS.astype(np.float64) * 2) ** 2
    e = (off ** 2) / vars_ / (person["area"] + np.spacing(1)) / 2
    oks = float(np.mean(np.exp(-e)))
    res = [{"image_id": 1, "category_id": 1,
            "keypoints": [float(v) for v in dt_kp.reshape(-1)], "score": 0.9}]
    for t in (0.5, 0.75, 0.95):
        stats = run_eval(ds, res, iou_thrs=[t])
        expect = 1.0 if oks >= t else 0.0
        assert stats["AP"] == pytest.approx(expect), (t, oks)


def test_area_range_split():
    """Medium person counts in APM only, large people in APL only."""
    ds = make_dataset()
    stats = run_eval(ds, perfect_results(ds))
    assert stats["AP (M)"] == pytest.approx(1.0)
    assert stats["AP (L)"] == pytest.approx(1.0)
    med = [a for a in ds["annotations"]
           if not a["iscrowd"] and a["num_keypoints"]
           and 32 ** 2 <= a["area"] < 96 ** 2]
    assert len(med) == 1                      # fixture sanity


def test_score_ordering_matters():
    """A high-scored far-off dt steals precision at low recall."""
    ds = make_dataset()
    res = perfect_results(ds)
    for r in res:
        r["score"] = 0.5
    bad = dict(res[0])
    kp = list(bad["keypoints"])
    kp[0::3] = [x + 300 for x in kp[0::3]]
    res.append(dict(bad, keypoints=kp, score=0.99))
    stats = run_eval(ds, res)
    assert 0.5 < stats["AP"] < 1.0


def test_crowdpose_index_ranges():
    ds = make_dataset(crowd_index=True)
    stats = run_eval(ds, perfect_results(ds))
    gt = COCOAnnotations(dataset=ds)
    dt = gt.load_results(perfect_results(ds))
    stats = KeypointEval(gt, dt, SIGMAS).summarize(
        crowd_index_ranges=CROWDPOSE_INDEX_RANGES)
    assert stats["AP (easy)"] == pytest.approx(1.0)
    assert stats["AP (medium)"] == pytest.approx(1.0)
    assert stats["AP (hard)"] == pytest.approx(1.0)


def test_detection_matching_crowd_gt_is_ignored_not_fp():
    """A detection overlapping only an ignored (crowd) gt must be ignored,
    not counted as a false positive (pycocotools ignore semantics)."""
    crowd = make_person(1, 1, 200, 200, 100, 200, iscrowd=1)
    real = make_person(2, 1, 450, 250, 100, 200)
    ds = {"images": [{"id": 1, "width": 640, "height": 480,
                      "file_name": "x.jpg"}],
          "annotations": [crowd, real],
          "categories": [{"id": 1, "name": "person"}]}
    res = perfect_results(ds)                  # only the real person
    # add a detection sitting exactly on the crowd region, high score
    kp = list(crowd["keypoints"])
    kp[2::3] = [1.0] * (len(kp) // 3)
    res.append({"image_id": 1, "category_id": 1, "keypoints": kp,
                "score": 0.99})
    stats = run_eval(ds, res)
    # crowd-matched det ignored -> precision/recall unaffected
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_crowd_gt_allows_multiple_detections():
    """iscrowd gts may absorb multiple detections (gtm check skipped)."""
    crowd = make_person(1, 1, 200, 200, 120, 240, iscrowd=1)
    real = make_person(2, 1, 460, 250, 100, 200)
    ds = {"images": [{"id": 1, "width": 640, "height": 480,
                      "file_name": "x.jpg"}],
          "annotations": [crowd, real],
          "categories": [{"id": 1, "name": "person"}]}
    res = perfect_results(ds)
    kp = list(crowd["keypoints"])
    kp[2::3] = [1.0] * (len(kp) // 3)
    for ds_score in (0.98, 0.97):              # two dets on the crowd
        res.append({"image_id": 1, "category_id": 1,
                    "keypoints": list(kp), "score": ds_score})
    stats = run_eval(ds, res)
    assert stats["AP"] == pytest.approx(1.0)


def test_maxdets_cap():
    """Detections beyond maxDets are dropped (worst-scored first)."""
    ds = make_dataset()
    res = perfect_results(ds)
    clutter = []
    for i in range(25):
        c = dict(res[0])
        kp = list(c["keypoints"])
        kp[0::3] = [x + 500 + i for x in kp[0::3]]
        clutter.append(dict(c, keypoints=kp, score=0.01))
    stats = run_eval(ds, res + clutter)
    # perfect dets score higher -> survive the cap -> AP unaffected at AR end
    assert stats["AR"] == pytest.approx(1.0)


def test_crowdpose_bbox_area_uses_053_factor():
    """With use_area=False (CrowdPose), OKS normalizes by 0.53*w*h — the
    crowdpose-api convention. A detection offset sized to straddle the two
    normalizations must match only when the 0.53 factor is applied."""
    sig = get_spec("crowdpose").sigmas
    k = len(sig)
    person = make_person(1, 1, 300, 240, 100, 200, num_joints=k)
    ds = {"images": [{"id": 1, "width": 640, "height": 480,
                      "file_name": "x.jpg"}],
          "annotations": [person],
          "categories": [{"id": 1, "name": "person",
                          "keypoints": [f"kp{i}" for i in range(k)]}]}
    kp = np.asarray(person["keypoints"], np.float64).reshape(-1, 3)
    area_bbox = 100.0 * 200.0

    # offset chosen so OKS(0.53*area) > 0.5 > OKS(area-without-factor)
    def oks_for(offset, area):
        # detection shifts each coord by offset/sqrt(2): dx^2+dy^2 = offset^2
        e = offset ** 2 / ((2 * sig) ** 2) / (2 * area)
        return float(np.mean(np.exp(-e)))

    # 0.53*area < area, so the factor makes OKS stricter: find an offset
    # where OKS(0.53*area) < 0.5 < OKS(area) — a detection that would match
    # at OKS 0.5 under the buggy no-factor normalization but must NOT match
    # under the crowdpose-api convention.
    lo, hi = 1.0, 120.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if oks_for(mid, 0.53 * area_bbox) > 0.45:
            lo = mid
        else:
            hi = mid
    offset = hi   # OKS with 0.53 factor just below 0.45
    assert oks_for(offset, 0.53 * area_bbox) < 0.5 < oks_for(offset, area_bbox)

    res_kp = kp.copy()
    res_kp[:, 0] += offset / np.sqrt(2)
    res_kp[:, 1] += offset / np.sqrt(2)
    res_kp[:, 2] = 1.0
    res = [{"image_id": 1, "category_id": 1,
            "keypoints": [float(v) for v in res_kp.reshape(-1)],
            "score": 0.9}]
    gt = COCOAnnotations(dataset=ds)
    dt = gt.load_results(res)
    stats = KeypointEval(gt, dt, sig, use_area=False,
                         area_rngs=[(0.0, 1e10)], area_lbls=["all"],
                         ).summarize()
    # under the 0.53-area convention the detection is BELOW the 0.5 OKS
    # threshold; the buggy full-bbox-area normalization would match it
    assert stats["AP .5"] == pytest.approx(0.0)
