"""Synthetic tiny MPII fixture (single-person, HRNet-family annot format).

Entries mirror the matlab-converted json the reference reads
(``lib/dataset/mpii.py`` [K]): 1-based coordinates, isotropic ``scale`` in
units of 200 px, per-entry ``joints``/``joints_vis``; our fixture adds a
1-based ``headbox`` per entry so PCKh runs without the gt mat (the mat path
is differentially tested against this in tests/test_mpii.py).
"""
from __future__ import annotations

import json
import os

import numpy as np

NUM_JOINTS = 16


def make_entries(n_images=3, people_per_image=2, img_size=(640, 480), seed=0):
    w_img, h_img = img_size
    rng = np.random.RandomState(seed)
    entries = []
    for im in range(n_images):
        for p in range(people_per_image):
            cx = 160.0 + 320.0 * p + rng.uniform(-20, 20)
            cy = 240.0 + rng.uniform(-30, 30)
            height = rng.uniform(180, 320)          # person extent in px
            scale = height / 200.0
            ang = np.linspace(0, 2 * np.pi, NUM_JOINTS, endpoint=False)
            xs = cx + 0.30 * height * 0.6 * np.cos(ang) \
                + rng.uniform(-2, 2, NUM_JOINTS)
            ys = cy + 0.30 * height * np.sin(ang) \
                + rng.uniform(-2, 2, NUM_JOINTS)
            xs = np.clip(xs, 2, w_img - 3)
            ys = np.clip(ys, 2, h_img - 3)
            vis = np.ones(NUM_JOINTS)
            vis[rng.randint(0, NUM_JOINTS)] = 0.0   # one unannotated joint
            # head box around the head-top joint (index 9), 1-based coords
            hx, hy = xs[9], ys[9]
            hb = height * 0.15
            entries.append({
                "image": f"{im:06d}.jpg",
                "center": [round(float(cx), 2), round(float(cy), 2)],
                "scale": round(float(scale), 4),
                "joints": [[round(float(x), 2), round(float(y), 2)]
                           for x, y in zip(xs, ys)],
                "joints_vis": [int(v) for v in vis],
                "headbox": [round(float(hx - hb / 2), 2),
                            round(float(hy - hb), 2),
                            round(float(hx + hb / 2), 2),
                            round(float(hy + hb * 0.2), 2)],
            })
    return entries


def write_fixture(root, entries, image_set="valid", img_size=(640, 480),
                  with_images=True):
    """Write ``{root}/annot/{image_set}.json`` + deterministic images."""
    os.makedirs(os.path.join(root, "annot"), exist_ok=True)
    with open(os.path.join(root, "annot", f"{image_set}.json"), "w") as f:
        json.dump(entries, f)
    if not with_images:
        return
    from PIL import Image
    w_img, h_img = img_size
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    hues = np.linspace(0, 1, NUM_JOINTS, endpoint=False)
    colors = np.stack([
        (np.sin(2 * np.pi * (hues + o)) * 0.5 + 0.5) * 255
        for o in (0.0, 1 / 3, 2 / 3)], -1).astype(np.uint8)
    by_image: dict = {}
    for e in entries:
        by_image.setdefault(e["image"], []).append(e)
    for name, ents in by_image.items():
        rng = np.random.RandomState(hash(name) % (2 ** 31))
        arr = rng.randint(0, 60, (h_img, w_img, 3), dtype=np.uint8)
        for e in ents:
            for j, ((x, y), v) in enumerate(zip(e["joints"],
                                                e["joints_vis"])):
                if v > 0:
                    # -1: fixture coords are 1-based like real MPII annots
                    yy, xx = int(y) - 1, int(x) - 1
                    arr[max(0, yy - 4):yy + 5,
                        max(0, xx - 4):xx + 5] = colors[j]
        Image.fromarray(arr).save(os.path.join(img_dir, name))


def write_gt_mat(root, entries, image_set="valid"):
    """Emit the reference's ``gt_{set}.mat`` from the same entries (matlab
    1-based layout: pos_gt_src (K, 2, N), jnt_missing (K, N),
    headboxes_src (2, 2, N))."""
    from scipy.io import savemat
    n = len(entries)
    pos = np.zeros((NUM_JOINTS, 2, n))
    missing = np.zeros((NUM_JOINTS, n))
    hb = np.zeros((2, 2, n))
    for i, e in enumerate(entries):
        pos[:, :, i] = np.asarray(e["joints"])
        missing[:, i] = 1.0 - np.asarray(e["joints_vis"])
        x1, y1, x2, y2 = e["headbox"]
        hb[0, :, i] = (x1, y1)
        hb[1, :, i] = (x2, y2)
    savemat(os.path.join(root, "annot", f"gt_{image_set}.mat"),
            mdict={"pos_gt_src": pos, "jnt_missing": missing,
                   "headboxes_src": hb})
