"""Debug visualization (reference ``lib/utils/vis.py::save_debug_images``,
SURVEY.md §2.20): gt/pred joints drawn on de-normalized inputs and heatmap
grids, gated by the DEBUG.* config flags. PIL-based (no OpenCV dependency)."""
from __future__ import annotations

import os

import numpy as np

from rsgnet_tpu.ops.warp import IMAGENET_MEAN, IMAGENET_STD


def denormalize(inputs):
    """(N, H, W, 3) normalized -> uint8 RGB."""
    x = np.asarray(inputs)
    x = (x * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)) * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


def _draw_joints(arr, joints, vis, color):
    h, w = arr.shape[:2]
    for (x, y), v in zip(np.asarray(joints).reshape(-1, 2), np.asarray(vis)):
        if v <= 0:
            continue
        xi, yi = int(round(float(x))), int(round(float(y)))
        if 0 <= xi < w and 0 <= yi < h:
            arr[max(0, yi - 2):yi + 3, max(0, xi - 2):xi + 3] = color
    return arr


def save_batch_image_with_joints(inputs, joints, joints_vis, path,
                                 color=(0, 255, 0), max_images=16):
    """Grid of inputs with joints overlaid. joints in input-pixel space."""
    from PIL import Image
    imgs = denormalize(inputs)[:max_images]
    n, h, w = imgs.shape[:3]
    cols = min(4, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        arr = _draw_joints(imgs[i].copy(), joints[i], joints_vis[i], color)
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = arr
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def save_batch_heatmaps(inputs, heatmaps, path, max_images=8):
    """Per-sample row: input followed by each joint heatmap (colorized)."""
    from PIL import Image
    imgs = denormalize(inputs)[:max_images]
    hm = np.asarray(heatmaps)[:max_images]          # (N, Hh, Wh, K)
    n, hh, wh, k = hm.shape
    grid = np.zeros((n * hh, (k + 1) * wh, 3), np.uint8)
    for i in range(n):
        from PIL import Image as _I
        small = np.asarray(_I.fromarray(imgs[i]).resize((wh, hh)))
        grid[i * hh:(i + 1) * hh, :wh] = small
        for j in range(k):
            m = hm[i, :, :, j]
            m = (255 * (m - m.min()) / max(float(m.max() - m.min()), 1e-6))
            col = np.stack([m, np.zeros_like(m), 255 - m], -1).astype(np.uint8)
            x0 = (j + 1) * wh
            grid[i * hh:(i + 1) * hh, x0:x0 + wh] = (
                0.7 * col + 0.3 * small).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def draw_skeleton(image, preds, maxvals, spec, thresh=0.3, radius=3):
    """Overlay predicted poses on an original-resolution image.

    The reference family ships a demo that renders detector-box predictions
    back onto the source frame (SURVEY.md §2.20 / demo path); this is the
    rebuild's equivalent, PIL-based (no OpenCV in env).

    image: (H, W, 3) uint8 RGB.  preds: (N, K, 2) image-space keypoints.
    maxvals: (N, K) or (N, K, 1) heatmap peak scores.  spec: KeypointSpec
    (skeleton edges + joint count).  Joints/bones below ``thresh`` are
    skipped. Returns a new (H, W, 3) uint8 array.
    """
    from PIL import Image, ImageDraw
    img = Image.fromarray(np.asarray(image, np.uint8))
    draw = ImageDraw.Draw(img)
    preds = np.asarray(preds, np.float32).reshape(-1, spec.num_joints, 2)
    scores = np.asarray(maxvals, np.float32).reshape(len(preds),
                                                     spec.num_joints)
    # per-limb palette cycles; joints drawn last so they sit on top
    palette = [(255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
               (85, 255, 0), (0, 255, 85), (0, 255, 170), (0, 170, 255),
               (0, 85, 255), (85, 0, 255), (170, 0, 255), (255, 0, 170)]
    for inst, (kp, sc) in enumerate(zip(preds, scores)):
        for e, (a, b) in enumerate(spec.skeleton):
            if sc[a] < thresh or sc[b] < thresh:
                continue
            col = palette[(inst * 3 + e) % len(palette)]
            draw.line([tuple(kp[a]), tuple(kp[b])], fill=col, width=2)
        for j in range(spec.num_joints):
            if sc[j] < thresh:
                continue
            x, y = float(kp[j, 0]), float(kp[j, 1])
            draw.ellipse([x - radius, y - radius, x + radius, y + radius],
                         fill=(0, 255, 0), outline=(0, 96, 0))
    return np.asarray(img)


def save_prediction_image(image, preds, maxvals, spec, path, thresh=0.3):
    """draw_skeleton + save; creates parent dirs like the other savers."""
    from PIL import Image
    arr = draw_skeleton(image, preds, maxvals, spec, thresh=thresh)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def save_debug_images(cfg, inputs, joints, joints_vis, target, output,
                      prefix):
    """The reference debug dump, gated by DEBUG.* flags. ``joints`` are
    input-space gt joints; ``output`` model heatmaps (N, Hh, Wh, K)."""
    if not cfg.DEBUG.DEBUG:
        return
    if cfg.DEBUG.SAVE_BATCH_IMAGES_GT:
        save_batch_image_with_joints(inputs, joints, joints_vis,
                                     f"{prefix}_gt.png")
    if cfg.DEBUG.SAVE_BATCH_IMAGES_PRED:
        hm = np.asarray(output)
        n, hh, wh, k = hm.shape
        flat = hm.reshape(n, hh * wh, k).argmax(axis=1)
        stride = np.asarray(inputs).shape[1] / hh
        pred = np.stack([(flat % wh) * stride, (flat // wh) * stride], -1)
        save_batch_image_with_joints(inputs, pred, np.ones((n, k)),
                                     f"{prefix}_pred.png", color=(255, 0, 0))
    if cfg.DEBUG.SAVE_HEATMAPS_GT:
        save_batch_heatmaps(inputs, target, f"{prefix}_hm_gt.png")
    if cfg.DEBUG.SAVE_HEATMAPS_PRED:
        save_batch_heatmaps(inputs, output, f"{prefix}_hm_pred.png")
