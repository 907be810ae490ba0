"""Production serving runtime (beyond the reference — SURVEY.md §1: the
reference has "no serving stack"; BASELINE's deployment framing makes one
first-class here).

Three layers, each usable alone:

  - ``ServingEngine`` (engine.py): shape-bucketed executor around any
    ``fn(images, centers, scales) -> (preds, maxvals)`` — a live jitted
    pipeline or a loaded StableHLO artifact (utils/export.py). Pads request
    batches up to a small static bucket set (XLA needs static shapes; one
    compile per bucket, then cached).
  - ``DynamicBatcher`` (batcher.py): coalesces concurrent requests into
    device batches (max-batch / max-wait policy), keeps several batches in
    flight so the device never idles between dispatches, and fans results
    back out to per-request futures.
  - HTTP front (http_server.py + tools/serve.py): a stdlib threaded HTTP
    server speaking npz over POST — no framework dependencies. Two routes:
    /v1/predict (pre-cropped batches) and /v1/predict_image (one raw frame
    + detector boxes; server-side preprocessing via preprocess.py).
"""
from rsgnet_tpu.serving.batcher import (DeadlineExceededError, DynamicBatcher,
                                        QueueFullError)
from rsgnet_tpu.serving.engine import ServingEngine
from rsgnet_tpu.serving.preprocess import crops_from_boxes

__all__ = ["ServingEngine", "DynamicBatcher", "crops_from_boxes",
           "QueueFullError", "DeadlineExceededError"]
