"""Synthetic tiny COCO keypoint fixture (SURVEY.md §4(4)).

Builds a small, deterministic COCO-format dataset in memory (and can write
it + matching images to disk) for driving the eval and dataset paths without
real COCO data: a handful of images, people with known keypoints, one crowd
annotation, one zero-keypoint annotation, spread across area ranges.
"""
from __future__ import annotations

import json
import os

import numpy as np

from rsgnet_tpu.data.skeletons import get_spec


def make_person(ann_id, img_id, cx, cy, w, h, num_joints=17, vis=2,
                iscrowd=0, seed=0):
    """A person annotation with keypoints on a deterministic ellipse."""
    rng = np.random.RandomState(seed + ann_id)
    ang = np.linspace(0, 2 * np.pi, num_joints, endpoint=False)
    xs = cx + 0.35 * w * np.cos(ang) + rng.uniform(-2, 2, num_joints)
    ys = cy + 0.35 * h * np.sin(ang) + rng.uniform(-2, 2, num_joints)
    vs = np.full(num_joints, vis)
    kp = np.stack([xs, ys, vs], 1)
    if vis == 0:
        kp[:] = 0.0            # COCO convention: unlabeled joints are (0,0,0)
    kp = kp.reshape(-1)
    return {
        "id": ann_id,
        "image_id": img_id,
        "category_id": 1,
        "keypoints": [round(float(v), 2) for v in kp],
        "num_keypoints": int(np.count_nonzero(vs > 0)),
        "bbox": [round(cx - w / 2, 2), round(cy - h / 2, 2), w, h],
        "area": round(w * h * 0.7, 2),
        "iscrowd": iscrowd,
    }


def make_dataset(num_joints=17, img_size=(640, 480), crowd_index=False):
    w_img, h_img = img_size
    images = []
    annotations = []
    aid = 1
    # img 1: two large people
    images.append({"id": 1, "width": w_img, "height": h_img,
                   "file_name": "000001.jpg"})
    annotations.append(make_person(aid, 1, 180, 240, 140, 300, num_joints)); aid += 1
    annotations.append(make_person(aid, 1, 430, 240, 150, 320, num_joints)); aid += 1
    # img 2: one medium person + one zero-keypoint (ignored) annotation
    images.append({"id": 2, "width": w_img, "height": h_img,
                   "file_name": "000002.jpg"})
    annotations.append(make_person(aid, 2, 300, 200, 60, 90, num_joints)); aid += 1
    a = make_person(aid, 2, 500, 300, 80, 120, num_joints, vis=0); aid += 1
    a["num_keypoints"] = 0
    annotations.append(a)
    # img 3: crowd annotation + normal person
    images.append({"id": 3, "width": w_img, "height": h_img,
                   "file_name": "000003.jpg"})
    annotations.append(make_person(aid, 3, 320, 260, 130, 280, num_joints)); aid += 1
    c = make_person(aid, 3, 150, 150, 120, 200, num_joints, iscrowd=1); aid += 1
    annotations.append(c)
    if crowd_index:
        for im, ci in zip(images, (0.05, 0.5, 0.9)):
            im["crowdIndex"] = ci
    spec = get_spec("coco" if num_joints == 17 else "crowdpose")
    cats = [{"id": 1, "name": "person", "supercategory": "person",
             "keypoints": [f"kp{i}" for i in range(num_joints)],
             "skeleton": [[a + 1, b + 1] for a, b in spec.skeleton]}]
    return {"images": images, "annotations": annotations, "categories": cats}


def perfect_results(dataset, score=0.95):
    """Detections = the gt keypoints (visibility slot kept as confidence)."""
    out = []
    for a in dataset["annotations"]:
        if a["iscrowd"] or a["num_keypoints"] == 0:
            continue
        kp = list(a["keypoints"])
        kp[2::3] = [1.0] * (len(kp) // 3)
        out.append({"image_id": a["image_id"], "category_id": 1,
                    "keypoints": kp, "score": score})
    return out


def detection_results(dataset, jitter=4.0, extra_low_score=True, seed=0):
    """Synthetic person-detector output (the COCO_val2017_detections analogue):
    gt boxes jittered, plus a low-scoring spurious box per image."""
    rng = np.random.RandomState(seed)
    dets = []
    for a in dataset["annotations"]:
        if a["iscrowd"]:
            continue
        x, y, w, h = a["bbox"]
        dets.append({
            "image_id": a["image_id"], "category_id": 1,
            "bbox": [x + rng.uniform(-jitter, jitter),
                     y + rng.uniform(-jitter, jitter), w, h],
            "score": float(rng.uniform(0.7, 0.99)),
        })
    if extra_low_score:
        for im in dataset["images"]:
            dets.append({"image_id": im["id"], "category_id": 1,
                         "bbox": [5.0, 5.0, 40.0, 60.0], "score": 0.02})
    return dets


def write_fixture(root, dataset, with_images=True):
    """Write annotations json + deterministic images under ``root``."""
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    ann_path = os.path.join(root, "annotations", "person_keypoints_val.json")
    with open(ann_path, "w") as f:
        json.dump(dataset, f)
    img_dir = os.path.join(root, "images")
    if with_images:
        os.makedirs(img_dir, exist_ok=True)
        num_joints = len(dataset["categories"][0]["keypoints"])
        # one distinct saturated color per joint index so tiny models can
        # actually learn joint identity from appearance (overfit tests)
        hues = np.linspace(0, 1, num_joints, endpoint=False)
        colors = np.stack([
            (np.sin(2 * np.pi * (hues + o)) * 0.5 + 0.5) * 255
            for o in (0.0, 1 / 3, 2 / 3)], -1).astype(np.uint8)
        for im in dataset["images"]:
            rng = np.random.RandomState(im["id"])
            arr = rng.randint(0, 60, (im["height"], im["width"], 3),
                              dtype=np.uint8)          # dim noise background
            for a in dataset["annotations"]:
                if a["image_id"] != im["id"]:
                    continue
                kp = np.asarray(a["keypoints"]).reshape(-1, 3)
                for j, (x, y, v) in enumerate(kp):
                    if v > 0:
                        yy, xx = int(y), int(x)
                        arr[max(0, yy - 4):yy + 5,
                            max(0, xx - 4):xx + 5] = colors[j]
            from PIL import Image
            Image.fromarray(arr).save(
                os.path.join(img_dir, im["file_name"]), quality=95)
    return ann_path, img_dir
