"""Minimal HTTP front for the serving runtime — stdlib only.

Protocol (framework-free, binary-clean):

  POST /v1/predict   body: an ``.npz`` archive with arrays
                     ``images`` (B, H, W, 3), ``centers`` (B, 2),
                     ``scales`` (B, 2)
                     -> 200, body: ``.npz`` with ``preds`` (B, K, 2)
                     image-space keypoints and ``maxvals`` (B, K, 1) scores
  POST /v1/predict_image
                     body: ``.npz`` with ``image`` (H, W, 3) uint8 — ONE
                     raw frame, any size — OR ``jpeg`` (encoded frame
                     bytes; decoded server-side by the native libjpeg
                     loader) — and ``boxes`` (N, 4) float
                     [x, y, w, h] person boxes. The server does the
                     reference demo-path preprocessing itself
                     (serving/preprocess.py: box -> center/scale ->
                     host affine crop) and batches the crops through the
                     same engine; responses are frame-space keypoints.
                     N may exceed the batcher's max_batch — the server
                     splits and reassembles.
  GET  /v1/stats     -> 200, JSON batcher + engine counters
  GET  /healthz      -> 200 "ok" once the model is warm

``ThreadingHTTPServer`` gives one host thread per connection; they all
funnel into the shared ``DynamicBatcher``, which is the component that
actually forms device batches — concurrency here is what makes coalescing
effective, not a performance path itself. For >1 chip run one process per
chip behind any TCP load balancer (eval forwards are collectives-free, so
chips scale linearly — docs/SERVING.md).
"""
from __future__ import annotations

import io
import json
import math
from concurrent.futures import TimeoutError as FutureTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from rsgnet_tpu.ops.warp import IMAGENET_MEAN, IMAGENET_STD
from rsgnet_tpu.serving.batcher import (DeadlineExceededError, DynamicBatcher,
                                        QueueFullError)
from rsgnet_tpu.serving.preprocess import crops_from_boxes

MAX_BODY_BYTES = 512 * 1024 * 1024


def make_server(batcher: DynamicBatcher, host: str = "127.0.0.1",
                port: int = 0, request_timeout_s: float = 120.0
                ) -> ThreadingHTTPServer:
    """Build (not start) the server; ``.server_address`` has the bound port.

    Start with ``server.serve_forever()`` (blocking) or on a thread; stop
    with ``server.shutdown()`` then ``batcher.close()``.
    """
    if (batcher.engine.image_shape is not None
            and batcher.engine.image_dtype is None):
        # a static server-construction property: warn ONCE here, not per
        # request — raw 0-255 crops would silently feed a serve_fn that may
        # expect normalized floats (ADVICE round 3)
        import logging
        logging.getLogger("rsgnet_tpu.serving").warning(
            "engine.image_dtype is unset; /v1/predict_image will send RAW "
            "uint8 crops to the model — set image_dtype on the engine "
            "(tools/serve.py does) if the serve_fn expects normalized "
            "floats")

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):   # route through logging, quiet
            import logging
            logging.getLogger("rsgnet_tpu.serving").debug(
                "%s - %s", self.address_string(), fmt % args)

        def _reply(self, code: int, body: bytes, ctype: str, headers=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj, headers=()):
            self._reply(code, json.dumps(obj).encode(), "application/json",
                        headers)

        def _reply_shed(self, e: QueueFullError):
            """503 + Retry-After: the admission-control response. The
            client pays one fast round trip instead of deepening the
            queue for everyone (docs/SERVING.md overload notes)."""
            self._reply_json(
                503, {"error": str(e),
                      "retry_after_s": e.retry_after_s},
                headers=(("Retry-After",
                          str(max(1, math.ceil(e.retry_after_s)))),))

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, b"ok", "text/plain")
            elif self.path == "/v1/stats":
                self._reply_json(200, batcher.stats())
            else:
                self._reply_json(404, {"error": f"no route {self.path}"})

        def _load_body_npz(self):
            length = int(self.headers.get("Content-Length", "0"))
            if not 0 < length <= MAX_BODY_BYTES:
                raise ValueError(f"bad Content-Length {length}")
            return np.load(io.BytesIO(self.rfile.read(length)),
                           allow_pickle=False)

        def _reply_npz(self, preds, maxvals):
            buf = io.BytesIO()
            np.savez(buf, preds=preds, maxvals=maxvals)
            self._reply(200, buf.getvalue(), "application/octet-stream")

        def _predict(self):
            try:
                with self._load_body_npz() as z:
                    images, centers, scales = (z["images"], z["centers"],
                                               z["scales"])
            except Exception as e:   # malformed request — client error
                self._reply_json(400, {"error": f"bad request: {e}"})
                return
            try:
                preds, maxvals = batcher.predict(images, centers, scales,
                                                 timeout=request_timeout_s)
            except QueueFullError as e:            # overload → shed
                self._reply_shed(e)
                return
            except (DeadlineExceededError,
                    FutureTimeoutError) as e:      # deadline → timeout
                self._reply_json(504, {"error": str(e) or "deadline"})
                return
            except (ValueError, TypeError) as e:   # validation → client
                self._reply_json(400, {"error": str(e)})
                return
            except Exception as e:                 # execution → server
                self._reply_json(500, {"error": str(e)})
                return
            self._reply_npz(preds, maxvals)

        def _predict_image(self):
            engine = batcher.engine
            # the body must be CONSUMED before any reply: this handler is
            # keep-alive (protocol_version HTTP/1.1), and an early reply
            # leaves the multi-MB npz in the socket to be parsed as the
            # next request line, desyncing the connection
            try:
                with self._load_body_npz() as z:
                    boxes = z["boxes"]
                    if "image" in z.files:
                        image = z["image"]
                    elif "jpeg" in z.files:
                        # encoded frame (uint8 byte array): ~10x less
                        # request bandwidth; decoded with the native
                        # libjpeg loader (PIL/cv2 fallback)
                        from rsgnet_tpu.utils.imageio import decode_image
                        image = decode_image(z["jpeg"].tobytes())
                    else:
                        raise ValueError("need 'image' (H, W, 3 uint8) or "
                                         "'jpeg' (encoded bytes)")
            except Exception as e:
                self._reply_json(400, {"error": f"bad request: {e}"})
                return
            # server-side misconfiguration, not a client fault: without
            # image_shape this route cannot size the crops (ADVICE round 3)
            if engine.image_shape is None:
                self._reply_json(500, {
                    "error": "server engine has no image_shape; "
                             "/v1/predict_image needs it to size the crops"})
                return
            try:
                h, w, _ = engine.image_shape
                crops, centers, scales = crops_from_boxes(image, boxes,
                                                          (w, h))
                if engine.image_dtype is not None \
                        and np.issubdtype(engine.image_dtype, np.floating):
                    # a float engine serves NORMALIZED crops (tools/serve.py:
                    # artifacts exported with normalize_input=False); uint8
                    # or unspecified engines take the raw crops
                    crops = ((crops.astype(np.float32) / 255.0
                              - np.asarray(IMAGENET_MEAN, np.float32))
                             / np.asarray(IMAGENET_STD, np.float32))
            except Exception as e:
                self._reply_json(400, {"error": f"bad request: {e}"})
                return
            try:
                # one frame may hold more people than max_batch: split into
                # batcher-legal requests; they pipeline through the same
                # coalescer and come back in order. Admission is ATOMIC
                # over the whole frame (submit_many): a shed frame costs
                # zero device time instead of leaving its earlier chunks
                # computing a response nobody can assemble
                m = batcher.max_batch
                reqs = [(crops[i:i + m], centers[i:i + m], scales[i:i + m])
                        for i in range(0, len(crops), m)]
                futures = batcher.submit_many(reqs,
                                              timeout_s=request_timeout_s)
                parts = [f.result(timeout=request_timeout_s)
                         for f in futures]
            except QueueFullError as e:
                self._reply_shed(e)
                return
            except (DeadlineExceededError, FutureTimeoutError) as e:
                self._reply_json(504, {"error": str(e) or "deadline"})
                return
            except (ValueError, TypeError) as e:
                self._reply_json(400, {"error": str(e)})
                return
            except Exception as e:
                self._reply_json(500, {"error": str(e)})
                return
            self._reply_npz(np.concatenate([p for p, _ in parts]),
                            np.concatenate([v for _, v in parts]))

        def do_POST(self):
            if self.path == "/v1/predict":
                self._predict()
            elif self.path == "/v1/predict_image":
                self._predict_image()
            else:
                self._reply_json(404, {"error": f"no route {self.path}"})

    return ThreadingHTTPServer((host, port), Handler)


def predict_remote(url: str, images, centers, scales, timeout: float = 120.0):
    """Client helper (and the round-trip test's reference): POST one request
    to a running server; returns (preds, maxvals) numpy arrays."""
    import urllib.request
    buf = io.BytesIO()
    np.savez(buf, images=np.asarray(images),
             centers=np.asarray(centers, np.float32),
             scales=np.asarray(scales, np.float32))
    req = urllib.request.Request(
        url.rstrip("/") + "/v1/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        with np.load(io.BytesIO(resp.read()), allow_pickle=False) as z:
            return z["preds"], z["maxvals"]


def predict_image_remote(url: str, image=None, boxes=None,
                         timeout: float = 120.0, jpeg: bytes | None = None):
    """Client helper for ``/v1/predict_image``: one raw (H, W, 3) uint8
    frame (``image``) OR one encoded frame (``jpeg`` bytes — ~10x less
    request bandwidth, decoded server-side) + (N, 4) [x, y, w, h] person
    boxes; returns (preds (N, K, 2) frame-space keypoints,
    maxvals (N, K, 1))."""
    import urllib.request
    if (image is None) == (jpeg is None):
        raise ValueError("pass exactly one of image= or jpeg=")
    if boxes is None:
        raise ValueError("boxes is required: (N, 4) [x, y, w, h] person "
                         "boxes in frame coordinates")
    buf = io.BytesIO()
    payload = {"boxes": np.asarray(boxes, np.float32)}
    if jpeg is not None:
        payload["jpeg"] = np.frombuffer(jpeg, np.uint8)
    else:
        payload["image"] = np.asarray(image, np.uint8)
    np.savez(buf, **payload)
    req = urllib.request.Request(
        url.rstrip("/") + "/v1/predict_image", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        with np.load(io.BytesIO(resp.read()), allow_pickle=False) as z:
            return z["preds"], z["maxvals"]
