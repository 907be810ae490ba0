"""Shape-bucketed serving executor.

XLA compiles one program per input shape, so a server must not dispatch
every distinct request size as its own compile — standard practice (and
docs/SERVING.md's operational note) is to pad request batches to a small
static set of bucket sizes. ``ServingEngine`` owns that policy: it wraps
any ``fn(images, centers, scales) -> (preds, maxvals)`` — a live jitted
inference pipeline (core/inference.py) or a deserialized StableHLO artifact
(utils/export.py, exported with a symbolic batch dim) — pads up to the
nearest bucket, dispatches, and slices the results back to the true size.

``run`` returns DEVICE arrays (sliced lazily): callers that pipeline
(serving.batcher) materialize them off the dispatch path, so the device
starts the next batch while the previous response is still in flight.
"""
from __future__ import annotations

import threading
from typing import Callable, Sequence, Tuple

import numpy as np


class ServingEngine:
    """Pads request batches to static bucket sizes and executes.

    Args:
      serve_fn: ``fn(images, centers, scales) -> (preds, maxvals)``.
        Shapes: images (B, H, W, 3), centers/scales (B, 2). One XLA compile
        per distinct B ends up in the jit cache; buckets bound that set.
      buckets: ascending batch sizes requests are padded to. The largest
        bucket is the engine's ``max_batch``.
      image_shape: optional (H, W, 3) to validate requests against at
        submit time (clear host-side error instead of a device trace error).
      image_dtype: optional expected dtype (e.g. uint8 for artifacts
        exported with ``normalize_input=True``); requests are cast if safe.
    """

    def __init__(self, serve_fn: Callable, buckets: Sequence[int] = (
            1, 2, 4, 8, 16, 32, 64), image_shape=None, image_dtype=None):
        if not buckets or list(buckets) != sorted(set(int(b) for b in buckets)):
            raise ValueError(f"buckets must be ascending unique ints, got "
                             f"{buckets!r}")
        self._fn = serve_fn
        self.buckets = tuple(int(b) for b in buckets)
        self.max_batch = self.buckets[-1]
        self.image_shape = tuple(image_shape) if image_shape else None
        self.image_dtype = np.dtype(image_dtype) if image_dtype else None
        self._lock = threading.Lock()
        self._bucket_calls = {b: 0 for b in self.buckets}
        # measured seconds per dispatch, filled by warmup(); consumers
        # (DynamicBatcher._chunks_for_buckets) use it to decide whether
        # splitting a group across buckets beats padding to the next one
        self.bucket_cost: dict = {}

    def bucket_for(self, n: int) -> int:
        """Smallest bucket >= n. Requests above max_batch are the caller's
        responsibility to split (DynamicBatcher never forms one)."""
        if n < 1:
            raise ValueError(f"batch size must be >= 1, got {n}")
        for b in self.buckets:
            if b >= n:
                return b
        raise ValueError(f"request batch {n} exceeds the largest bucket "
                         f"{self.max_batch}; split it or add a bucket")

    def validate(self, images, centers, scales) -> int:
        """Host-side request validation; returns the batch size."""
        images, centers, scales = (np.asarray(images), np.asarray(centers),
                                   np.asarray(scales))
        if images.ndim != 4:
            raise ValueError(f"images must be (B, H, W, 3), got shape "
                             f"{images.shape}")
        n = images.shape[0]
        if self.image_shape and tuple(images.shape[1:]) != self.image_shape:
            raise ValueError(f"images must be (B, {', '.join(map(str, self.image_shape))}), "
                             f"got {images.shape}")
        if centers.shape != (n, 2) or scales.shape != (n, 2):
            raise ValueError(f"centers/scales must be ({n}, 2), got "
                             f"{centers.shape} / {scales.shape}")
        return n

    def run(self, images, centers, scales) -> Tuple:
        """Pad to the nearest bucket, execute, slice back to the true size.

        Returns device arrays (materialize with ``np.asarray`` when the
        response is actually sent). Padding repeats the first row — benign
        values through the whole pipeline (an all-zeros row is also fine,
        but a real row can never hit an unforeseen degenerate branch)."""
        n = self.validate(images, centers, scales)
        b = self.bucket_for(n)
        images, centers, scales = (np.asarray(images),
                                   np.asarray(centers, np.float32),
                                   np.asarray(scales, np.float32))
        if self.image_dtype is not None and images.dtype != self.image_dtype:
            images = images.astype(self.image_dtype)
        if b != n:
            pad = b - n
            images = np.concatenate(
                [images, np.repeat(images[:1], pad, axis=0)])
            centers = np.concatenate(
                [centers, np.repeat(centers[:1], pad, axis=0)])
            scales = np.concatenate(
                [scales, np.repeat(scales[:1], pad, axis=0)])
        preds, maxvals = self._fn(images, centers, scales)
        with self._lock:
            self._bucket_calls[b] += 1
        return preds[:n], maxvals[:n]

    def warmup(self, buckets: Sequence[int] | None = None,
               timing_repeats: int = 2):
        """Pre-compile the given buckets (default: all) with dummy requests
        so the first real request never pays an XLA compile. Requires
        ``image_shape`` (and uses ``image_dtype`` or float32).

        Also MEASURES each bucket: ``timing_repeats`` post-compile calls
        are timed to a host materialization and the MIN is recorded in
        ``bucket_cost`` — the batcher's split-vs-pad decisions are then
        driven by this box's real per-dispatch costs (an overhead-bound
        model makes small buckets nearly as expensive as large ones;
        instance counting alone would mis-split). Min-of-N because dispatch
        noise is additive: one anomalous sample (tunnel hiccup, host page
        fault) must not poison every subsequent split decision."""
        if self.image_shape is None:
            raise ValueError("warmup needs image_shape to build dummy input")
        import time as _time

        import jax
        dtype = self.image_dtype or np.float32
        for b in (buckets or self.buckets):
            imgs = np.zeros((b, *self.image_shape), dtype)
            args = (imgs, np.full((b, 2), 32.0, np.float32),
                    np.ones((b, 2), np.float32))
            jax.block_until_ready(self._fn(*args))      # compile
            best = float("inf")
            for _ in range(max(1, timing_repeats)):
                t0 = _time.perf_counter()
                out = self._fn(*args)
                # materialize (tunnel rule: block_until_ready alone can lie)
                jax.tree_util.tree_map(np.asarray, out)
                best = min(best, _time.perf_counter() - t0)
            self.bucket_cost[b] = best

    def stats(self) -> dict:
        with self._lock:
            calls = dict(self._bucket_calls)
        return {"bucket_calls": calls,
                "batches": int(sum(calls.values()))}
