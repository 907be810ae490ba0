"""Top-down keypoint dataset base (reference ``lib/dataset/JointsDataset.py``,
SURVEY.md §2.9 — redesigned for the fused on-device pipeline).

The reference's ``__getitem__`` does all augmentation + warping + target
generation per sample on host CPU. Here the host side only *loads* — decode
the image, pad it to a static source canvas, and emit the raw geometry — and
every compute step (random affine/flip/half-body, warp, normalize, Gaussian
targets) runs fused on device (``rsgnet_tpu.data.augment``), per
BASELINE.json:5 "fused on-device to feed the model at line rate".

A record is one person instance:
  image_path, image_id, center (2,), scale (2,), joints (K, 3),
  joints_vis (K, 3), score (detector confidence; 1 for gt boxes).

``load_sample`` decodes + pads to ``src_size`` and shifts geometry by the
(0,0) pad origin (top-left padding keeps coordinates unchanged). For images
larger than the canvas (CrowdPose routinely exceeds 640px) the loader slices
an integer-aligned window around the instance — a zero-resample crop, so the
model sees FULL-RESOLUTION pixels exactly like the reference's host
``cv2.warpAffine`` from the original image (VERDICT round-2 item 2); the
window origin is carried as ``offset`` and undone by ``validate``. Only when
the instance's own warp read-region exceeds the canvas (person box larger
than the canvas) is the image downscaled, with the factor carried so
coordinates stay correct.
"""
from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.skeletons import KeypointSpec
from rsgnet_tpu.utils.imageio import decode_image, read_bytes


class _DecodeCache:
    """Tiny thread-safe LRU of decoded images, keyed by path.

    Top-down datasets hold one record per person INSTANCE, so images with
    several people would otherwise be decoded once per instance (COCO val
    averages >2 instances/image, and eval iterates in db order where they
    are adjacent). Entries are treated as read-only by all consumers —
    ``collate``'s ``np.stack`` copies before anything touches device or
    augmentation.

    Bounded by BYTES, not entry count: "full" entries hold full-resolution
    decodes (a 2000x3000 CrowdPose image is ~18 MB, 15x a 640^2 canvas), so
    a count bound would let worst-case memory balloon ~15x — and the cache
    is duplicated per dataset object and per grain worker process. 64 MB
    covers ~52 canvases (the adjacent-instance access pattern needs ~1)."""

    def __init__(self, max_bytes: int = 64 * 1024 * 1024):
        self.max_bytes = max_bytes
        self._d: OrderedDict = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()

    def __reduce__(self):
        # holds a Lock: pickle (grain/mp workers) as an empty fresh cache
        return (_DecodeCache, (self.max_bytes,))

    @staticmethod
    def _nbytes(val) -> int:
        return sum(int(v.nbytes) for v in val if isinstance(v, np.ndarray))

    def get(self, key):
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                self._d.move_to_end(key)
            return v

    def put(self, key, val):
        nb = self._nbytes(val)
        if nb > self.max_bytes:
            return                        # larger than the whole budget
        with self._lock:
            old = self._d.pop(key, None)
            if old is not None:
                self._bytes -= self._nbytes(old)
            self._d[key] = val
            self._bytes += nb
            while self._bytes > self.max_bytes and self._d:
                _, ev = self._d.popitem(last=False)
                self._bytes -= self._nbytes(ev)


class TopDownDataset:
    """Base class: subclasses fill ``self.db`` (list of record dicts)."""

    def __init__(self, cfg: Config, root: str, image_set: str,
                 is_train: bool, spec: KeypointSpec):
        self.cfg = cfg
        self.root = root
        self.image_set = image_set
        self.is_train = is_train
        self.spec = spec
        self.num_joints = spec.num_joints
        self.aspect_ratio = cfg.aspect_ratio
        self.color_rgb = cfg.DATASET.COLOR_RGB
        self.db: List[dict] = []
        # static source canvas for the on-device warp (H, W)
        self.src_size: Tuple[int, int] = (640, 640)
        self._decode_cache = _DecodeCache()

    def __len__(self):
        return len(self.db)

    def select_data(self, db):
        """The reference's training-sample filter (DATASET.SELECT_DATA,
        reference ``lib/dataset/JointsDataset.py::select_data``): keep a
        sample when the centroid of its VISIBLE joints sits close to the
        box center, scored by a Gaussian of the squared distance over the
        box area (ks = exp(-d² / (2·0.2²·area))) against a visibility-count
        threshold (metric = (0.2/16)·num_vis + 0.45 − 0.2/16); samples with
        zero visible joints are dropped. Filters out boxes whose annotation
        is concentrated off-center (truncation/mislabels)."""
        selected = []
        for rec in db:
            vis = rec["joints_vis"][:, 0] > 0
            num_vis = int(vis.sum())
            if num_vis == 0:
                continue
            joints_center = rec["joints"][vis, :2].mean(axis=0)
            area = float(rec["scale"][0]) * float(rec["scale"][1]) * 200.0**2
            d2 = float(((joints_center - rec["center"]) ** 2).sum())
            ks = np.exp(-d2 / (2.0 * 0.2**2 * area))
            metric = (0.2 / 16) * num_vis + 0.45 - 0.2 / 16
            if ks > metric:
                selected.append(rec)
        return selected

    def shard(self, process_id: int, num_processes: int):
        """Shallow view holding this process's contiguous db slice
        (multi-host eval: each host collects predictions for its slice,
        results are gathered before ``evaluate`` — core/validate.py).
        Slices are contiguous so concatenating them in process order
        restores the original db order."""
        import copy
        from rsgnet_tpu.parallel.distributed import shard_bounds
        lo, hi = shard_bounds(len(self.db), process_id, num_processes)
        sub = copy.copy(self)
        sub.db = self.db[lo:hi]
        return sub

    # -- host-side loading --------------------------------------------------

    def _needed_extent(self, scale: np.ndarray) -> np.ndarray:
        """(w, h) source-pixel extent the device warp can read for an
        instance with this box scale (pixel_std 200), measured around the
        detection-box center the >canvas window is placed on. Training
        inflates by the worst-case augmentation: scale jitter up to
        (1+SCALE_FACTOR), half-body re-boxing (<=1.2x), the rotated rect's
        bounding box (|cos|+|sin| <= sqrt(2)), and — when half-body can
        fire — the re-CENTERING onto the selected joints' mean, which can
        sit up to ~box/2 from the detection center (joints lie inside the
        box), widening the worst-case read region by a full box."""
        box = scale * 200.0
        if self.is_train:
            d = self.cfg.DATASET
            margin = (1.0 + d.SCALE_FACTOR) * 1.25
            if d.ROT_FACTOR > 0:
                margin *= np.sqrt(2.0)
            extent = box * margin
            if d.PROB_HALF_BODY > 0:
                extent = extent + box
            return extent + 4.0
        return box + 4.0

    def _decoded(self, path: str):
        """Decode ``path`` once per image (LRU-shared across its instances).

        Returns ``("canvas", canvas, h, w)`` for images that fit the source
        canvas — decoded by the native libjpeg path DIRECTLY into the padded
        canvas (zero intermediate copies; csrc/jpeg_loader.cpp), or pasted
        from a PIL decode when native is unavailable — else ``("full", img)``
        and the caller runs the window/downscale logic. Cached values are
        read-only (``collate``'s ``np.stack`` copies)."""
        cached = self._decode_cache.get(path)
        if cached is not None:
            return cached
        sh, sw = self.src_size
        data = read_bytes(path)
        img = None
        if self.color_rgb:
            from rsgnet_tpu.utils import native_jpeg
            if native_jpeg.is_jpeg(data) and native_jpeg.available():
                canvas = np.zeros((sh, sw, 3), np.uint8)
                try:
                    r = native_jpeg.decode_into(data, canvas)
                except ValueError:        # exceeds the canvas
                    r = None
                    img = native_jpeg.decode(data)
                if r is not None:
                    canvas.setflags(write=False)
                    entry = ("canvas", canvas, r[0], r[1])
                    self._decode_cache.put(path, entry)
                    return entry
        if img is None:
            img = decode_image(data, color_rgb=self.color_rgb)
        h, w = img.shape[:2]
        if h <= sh and w <= sw:
            canvas = np.zeros((sh, sw, 3), np.uint8)
            canvas[:h, :w] = img
            canvas.setflags(write=False)
            entry = ("canvas", canvas, h, w)
        else:
            img.setflags(write=False)
            entry = ("full", img)
        self._decode_cache.put(path, entry)
        return entry

    def load_sample(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.db[idx]
        sh, sw = self.src_size
        center = rec["center"].astype(np.float32).copy()
        scale = rec["scale"].astype(np.float32).copy()
        joints = rec["joints"].astype(np.float32).copy()
        factor = 1.0
        offset = np.zeros((2,), np.float32)
        decoded = self._decoded(rec["image_path"])
        if decoded[0] == "canvas":
            # pre-padded cached canvas: factor/offset stay identity; fall
            # through to the ONE shared return (a second dict literal here
            # invited schema drift between the branches — round-4 review)
            canvas = decoded[1]
            return self._sample_dict(rec, canvas, joints, center, scale,
                                     factor, offset)
        img = decoded[1]
        h, w = img.shape[:2]
        if h > sh or w > sw:
            # downscale ONLY if this instance's warp read-region cannot fit
            # the canvas at full resolution (person box ~ canvas-sized)
            need = self._needed_extent(scale)
            f = min(1.0, sw / float(need[0]), sh / float(need[1]))
            if f < 1.0:
                factor = f
                # scale by EXACTLY f via an affine warp: cv2.resize's
                # pixel-center convention realizes nw/w (int-floored, per
                # axis) plus a ~0.5*(1-f) px shift, so the recorded factor
                # would not match the content and the eval un-mapping
                # (p_canvas + offset)/factor would drift up to ~5 px in
                # original space (round-4 review). warpAffine's integer-
                # center map IS p -> p*f, both axes, no bias.
                nh, nw = int(np.ceil(h * f)), int(np.ceil(w * f))
                from rsgnet_tpu.ops.warp import host_affine_crop
                m = np.array([[f, 0.0, 0.0], [0.0, f, 0.0]], np.float64)
                img = host_affine_crop(img, m, (nw, nh))
                center *= f
                scale *= f
                joints[:, :2] *= f
                h, w = nh, nw
        if h > sh or w > sw:
            # zero-resample window around the instance: full-resolution
            # pixels, integer coordinate shift only
            x0 = int(np.clip(round(center[0] - sw / 2.0), 0, max(0, w - sw)))
            y0 = int(np.clip(round(center[1] - sh / 2.0), 0, max(0, h - sh)))
            img = img[y0:y0 + sh, x0:x0 + sw]
            offset[:] = (x0, y0)
            center -= offset
            joints[:, :2] -= offset
            h, w = img.shape[:2]
        canvas = np.zeros((sh, sw, 3), np.uint8)
        canvas[:h, :w] = img
        return self._sample_dict(rec, canvas, joints, center, scale,
                                 factor, offset)

    def _sample_dict(self, rec, canvas, joints, center, scale, factor,
                     offset):
        """The one sample schema both load_sample branches return."""
        return {
            "image": canvas,
            "joints": joints[:, :2],
            "joints_vis": rec["joints_vis"][:, 0].astype(np.float32),
            "center": center,
            "scale": scale,
            "score": np.float32(rec.get("score", 1.0)),
            "image_id": np.int64(rec["image_id"]),
            # canvas->original mapping: p_orig = (p_canvas + offset) / factor;
            # eval must undo both (core/validate.py drain path)
            "factor": np.float32(factor),
            "offset": offset,
        }

    def load_sample_cropped(self, idx: int) -> Dict[str, np.ndarray]:
        """Reference-style host pipeline: crop/warp to MODEL.IMAGE_SIZE on
        the host (cv2.warpAffine when available, else the NumPy-oracle
        sampler) and ship only the (H, W, 3) uint8 crop — 8x less transfer
        than the padded canvas. Normalization stays fused on device.
        """
        rec = self.db[idx]
        # share the per-image decode (and the native libjpeg path) with
        # load_sample: multi-person images decode once, not once per crop
        decoded = self._decoded(rec["image_path"])
        if decoded[0] == "canvas":
            _, canvas, h, w = decoded
            img = canvas[:h, :w]
        else:
            img = decoded[1]
        center = rec["center"].astype(np.float32)
        scale = rec["scale"].astype(np.float32)
        from rsgnet_tpu.ops.affine import get_affine_transform
        from rsgnet_tpu.ops.warp import host_affine_crop
        size = tuple(self.cfg.MODEL.IMAGE_SIZE)              # (w, h)
        trans = get_affine_transform(center, scale, 0.0, size)
        # cv2 when importable, else the vectorized NumPy sampler — never a
        # per-sample device dispatch from inside a loader worker thread
        crop = host_affine_crop(img, trans, size)
        return {
            "input": np.ascontiguousarray(crop, dtype=np.uint8),
            "center": center,
            "scale": scale,
            "score": np.float32(rec.get("score", 1.0)),
            "image_id": np.int64(rec["image_id"]),
            "factor": np.float32(1.0),   # host crop never downscales
            "offset": np.zeros((2,), np.float32),
        }

    def collate(self, indices, cropped: bool = False) -> Dict[str, np.ndarray]:
        load = self.load_sample_cropped if cropped else self.load_sample
        samples = [load(i) for i in indices]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    # -- evaluation contract ------------------------------------------------

    def evaluate(self, preds, all_boxes, image_ids, output_dir=None):
        """preds (N, K, 3) image-space keypoints+score; all_boxes (N, 6)
        [center x, y, scale x, y, area, score]. Subclass implements."""
        raise NotImplementedError


