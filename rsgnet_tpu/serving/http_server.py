"""Minimal HTTP front for the serving runtime — stdlib only.

Protocol (framework-free, binary-clean):

  POST /v1/predict   body: an ``.npz`` archive with arrays
                     ``images`` (B, H, W, 3), ``centers`` (B, 2),
                     ``scales`` (B, 2)
                     -> 200, body: ``.npz`` with ``preds`` (B, K, 2)
                     image-space keypoints and ``maxvals`` (B, K, 1) scores
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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from rsgnet_tpu.serving.batcher import DynamicBatcher

MAX_BODY_BYTES = 512 * 1024 * 1024


def make_server(batcher: DynamicBatcher, host: str = "127.0.0.1",
                port: int = 0, request_timeout_s: float = 120.0
                ) -> ThreadingHTTPServer:
    """Build (not start) the server; ``.server_address`` has the bound port.

    Start with ``server.serve_forever()`` (blocking) or on a thread; stop
    with ``server.shutdown()`` then ``batcher.close()``.
    """

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):   # route through logging, quiet
            import logging
            logging.getLogger("rsgnet_tpu.serving").debug(
                "%s - %s", self.address_string(), fmt % args)

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, b"ok", "text/plain")
            elif self.path == "/v1/stats":
                self._reply_json(200, batcher.stats())
            else:
                self._reply_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/v1/predict":
                self._reply_json(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if not 0 < length <= MAX_BODY_BYTES:
                    raise ValueError(f"bad Content-Length {length}")
                with np.load(io.BytesIO(self.rfile.read(length)),
                             allow_pickle=False) as z:
                    images, centers, scales = (z["images"], z["centers"],
                                               z["scales"])
            except Exception as e:   # malformed request — client error
                self._reply_json(400, {"error": f"bad request: {e}"})
                return
            try:
                preds, maxvals = batcher.predict(images, centers, scales,
                                                 timeout=request_timeout_s)
            except (ValueError, TypeError) as e:   # validation → client
                self._reply_json(400, {"error": str(e)})
                return
            except Exception as e:                 # execution → server
                self._reply_json(500, {"error": str(e)})
                return
            buf = io.BytesIO()
            np.savez(buf, preds=preds, maxvals=maxvals)
            self._reply(200, buf.getvalue(), "application/octet-stream")

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
