"""Server-side preprocessing for raw-frame requests.

``/v1/predict`` requires the client to affine-crop each person box to
MODEL.IMAGE_SIZE itself — fine for another pipeline stage, wrong for an
end application. ``crops_from_boxes`` is the server half of the reference's
demo path (SURVEY.md §3.5, tools/infer.py): detector boxes on an arbitrary
frame -> reference ``_box2cs`` center/scale (pixel_std 200, aspect fix,
1.25x padding) -> host affine crops at the model input size. The crops then
ride the normal engine/batcher path, so raw-frame and pre-cropped requests
share every compiled program.

Host-side on purpose: frames arrive in arbitrary sizes, and a device crop
would recompile per distinct (H, W) — ``host_affine_crop`` is cv2 when
importable, else the vectorized NumPy sampler (same INTER_LINEAR math).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from rsgnet_tpu.ops.affine import box_to_center_scale, get_affine_transform
from rsgnet_tpu.ops.warp import host_affine_crop


def crops_from_boxes(image, boxes, out_size, scale_padding: float = 1.25
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One frame + N person boxes -> model-ready crops and their mapping.

    Args:
      image: (H, W, 3) uint8 frame (any H, W).
      boxes: (N, 4) float [x, y, w, h] person boxes (detector output).
      out_size: (out_w, out_h) — the model input size the engine serves.
      scale_padding: box padding factor (reference: 1.25 for gt boxes).

    Returns:
      (crops (N, out_h, out_w, 3) uint8, centers (N, 2) f32, scales (N, 2)
      f32) — exactly what ``ServingEngine``/``DynamicBatcher`` take; the
      engine's decode maps predictions back to THIS frame's coordinates
      through the returned centers/scales.
    """
    image = np.asarray(image)
    if image.ndim != 3 or image.shape[2] != 3:
        raise ValueError(f"image must be (H, W, 3), got {image.shape}")
    boxes = np.asarray(boxes, np.float32)
    if boxes.ndim != 2 or boxes.shape[1] < 4 or boxes.shape[0] < 1:
        raise ValueError(f"boxes must be (N>=1, 4) [x, y, w, h], got "
                         f"{boxes.shape}")
    out_w, out_h = int(out_size[0]), int(out_size[1])
    aspect = out_w / out_h
    crops = np.empty((len(boxes), out_h, out_w, 3), np.uint8)
    centers = np.empty((len(boxes), 2), np.float32)
    scales = np.empty((len(boxes), 2), np.float32)
    for i, box in enumerate(boxes):
        c, s = box_to_center_scale(box, aspect, scale_padding=scale_padding)
        trans = get_affine_transform(c, s, 0.0, (out_w, out_h))
        crops[i] = host_affine_crop(image, trans, (out_w, out_h))
        centers[i], scales[i] = c, s
    return crops, centers, scales
