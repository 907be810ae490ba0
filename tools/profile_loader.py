"""Input-pipeline throughput: threaded BatchLoader vs grain (VERDICT r2 #7).

Host-side only — measures samples/sec of decode+pad+collate for the two
loader backends at several worker counts, on a generated JPEG fixture large
enough that image decode dominates (the real bottleneck shape). Device
transfer/compute is excluded on purpose: both loaders feed the identical
``device_prefetch``, so the pipelines differ only on the host side.

    python tools/profile_loader.py [--images 200] [--instances 600]
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

import _init_paths  # noqa: F401


def build_fixture(root: str, n_images: int, n_instances: int):
    """COCO-format fixture with ``n_images`` 640x480 JPEGs and boxes."""
    from PIL import Image

    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(1, n_images + 1):
        images.append({"id": i, "width": 640, "height": 480,
                       "file_name": f"{i:06d}.jpg"})
        arr = rng.randint(0, 255, (480, 640, 3), np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "images", f"{i:06d}.jpg"), quality=90)
    for _ in range(n_instances):
        img_id = int(rng.randint(1, n_images + 1))
        cx, cy = rng.uniform(150, 500), rng.uniform(120, 360)
        w, h = rng.uniform(60, 160), rng.uniform(120, 300)
        kp = np.zeros((17, 3))
        kp[:, 0] = cx + rng.uniform(-w / 2, w / 2, 17)
        kp[:, 1] = cy + rng.uniform(-h / 2, h / 2, 17)
        kp[:, 2] = 2
        annotations.append({
            "id": aid, "image_id": img_id, "category_id": 1,
            "keypoints": [round(float(v), 2) for v in kp.reshape(-1)],
            "num_keypoints": 17,
            "bbox": [cx - w / 2, cy - h / 2, w, h],
            "area": w * h * 0.7, "iscrowd": 0})
        aid += 1
    cats = [{"id": 1, "name": "person", "supercategory": "person",
             "keypoints": [f"kp{j}" for j in range(17)], "skeleton": []}]
    with open(os.path.join(root, "annotations",
                           "person_keypoints_val.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)


def drain(loader):
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        first = batch["image"] if "image" in batch else batch["input"]
        n += int(batch.get("num_valid", first.shape[0]))
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--instances", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--threads-only", action="store_true",
                    help="skip the grain rows (decode-backend A/Bs)")
    ap.add_argument("--cfg", default=None,
                    help="experiment yaml (default: built-in W32@256x192); "
                         "host canvas work is config-independent, but the "
                         "host-CROP pipeline scales with MODEL.IMAGE_SIZE")
    ap.add_argument("--host-crop", action="store_true",
                    help="also measure the reference-style host-crop "
                         "pipeline (what tools/test.py --pipeline host "
                         "feeds) — the one config-size-dependent host path")
    args = ap.parse_args()

    from rsgnet_tpu.config.defaults import load_config, rsgnet_w32_256x192
    from rsgnet_tpu.data import get_dataset
    from rsgnet_tpu.data.grain_pipeline import GrainBatchLoader
    from rsgnet_tpu.data.loader import BatchLoader

    print(f"host cores: {os.cpu_count()}")
    with tempfile.TemporaryDirectory() as root:
        build_fixture(root, args.images, args.instances)
        cfg = load_config(args.cfg) if args.cfg else rsgnet_w32_256x192()
        ds = get_dataset(cfg, root=root, image_set="val", is_train=True)
        print(f"{len(ds)} instances over {args.images} JPEGs, "
              f"batch {args.batch}")
        from rsgnet_tpu.utils import native_jpeg
        print(f"native jpeg decoder: "
              f"{'on' if native_jpeg.available() else 'off'}")
        for workers in (1, 2, 4, 8):
            bl = BatchLoader(ds, args.batch, shuffle=True, drop_last=True,
                             num_workers=workers)
            r1 = drain(bl)          # warm (page cache)
            r2 = drain(bl)
            print(f"threads workers={workers}: {max(r1, r2):7.1f} samples/s")
        # eval order (db order, instances of an image adjacent) — the decode
        # cache's best case, and the order validate() actually uses
        bl = BatchLoader(ds, args.batch, shuffle=False, num_workers=1)
        r = max(drain(bl), drain(bl))
        print(f"threads workers=1 eval-order: {r:7.1f} samples/s")
        if args.host_crop:
            wh = tuple(cfg.MODEL.IMAGE_SIZE)          # IMAGE_SIZE is (w, h)
            eds = get_dataset(cfg, root=root, image_set="val",
                              is_train=False)
            bl = BatchLoader(eds, args.batch, shuffle=False, num_workers=1,
                             cropped=True)
            r = max(drain(bl), drain(bl))
            print(f"host-crop workers=1 eval-order ({wh[1]}x{wh[0]} HxW): "
                  f"{r:7.1f} samples/s")
        if args.threads_only:
            return
        for workers in (0, 2, 4, 8):
            gl = GrainBatchLoader(ds, args.batch, shuffle=True,
                                  num_workers=workers)
            r1 = drain(gl)
            r2 = drain(gl)
            print(f"grain   workers={workers}: {max(r1, r2):7.1f} samples/s")


if __name__ == "__main__":
    main()
