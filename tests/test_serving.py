"""Serving runtime tests: bucketed engine, dynamic batcher, HTTP front.

Ground truth everywhere is the direct per-request call of the SAME jitted
inference fn — the runtime must be a pure transport: whatever requests go
through coalescing/padding/pipelining must come back numerically equal
(padding rows and batch-mates must never leak into a request's results;
inference has no cross-batch ops, so equality is tight)."""
import io
import threading
import time

import jax
import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.core.inference import make_inference_fn
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.serving import DynamicBatcher, ServingEngine


@pytest.fixture(scope="module")
def served():
    """(serve_fn, image_shape (H,W,3), direct) — tiny model, uint8 crops."""
    cfg = tiny_rsgnet()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    infer = make_inference_fn(cfg, model, normalize_input=True)

    def serve_fn(images, centers, scales):
        return infer(variables, images, centers, scales)

    return serve_fn, (h, w, 3), cfg


def random_request(rng, image_shape, n):
    h, w, _ = image_shape
    return (rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8),
            rng.uniform(20, 40, (n, 2)).astype(np.float32),
            rng.uniform(0.5, 1.5, (n, 2)).astype(np.float32))


def direct(serve_fn, req):
    preds, maxvals = serve_fn(*req)
    return np.asarray(preds), np.asarray(maxvals)


def test_engine_bucket_selection_and_validation(served):
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(2, 4, 8),
                        image_shape=image_shape, image_dtype=np.uint8)
    assert [eng.bucket_for(n) for n in (1, 2, 3, 4, 5, 8)] == \
        [2, 2, 4, 4, 8, 8]
    with pytest.raises(ValueError, match="exceeds"):
        eng.bucket_for(9)
    with pytest.raises(ValueError, match="ascending"):
        ServingEngine(serve_fn, buckets=(4, 2))
    rng = np.random.default_rng(0)
    imgs, cs, ss = random_request(rng, image_shape, 3)
    with pytest.raises(ValueError, match="images must be"):
        eng.run(imgs[:, :-8], cs, ss)            # wrong spatial size
    with pytest.raises(ValueError, match="centers/scales"):
        eng.run(imgs, cs[:2], ss)


def test_engine_padding_matches_direct(served):
    """n=3 padded to bucket 4: results equal the direct n=3 call."""
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(4, 8), image_shape=image_shape,
                        image_dtype=np.uint8)
    rng = np.random.default_rng(1)
    req = random_request(rng, image_shape, 3)
    want_p, want_m = direct(serve_fn, req)
    got_p, got_m = (np.asarray(x) for x in eng.run(*req))
    assert got_p.shape == want_p.shape == (3, 17, 2)
    np.testing.assert_allclose(got_p, want_p, atol=1e-5)
    np.testing.assert_allclose(got_m, want_m, atol=1e-5)
    assert eng.stats()["bucket_calls"][4] == 1


def test_engine_warmup_compiles_buckets(served):
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2), image_shape=image_shape,
                        image_dtype=np.uint8)
    eng.warmup()                                  # must not raise
    assert eng.stats()["batches"] == 0            # warmup isn't traffic


def test_batcher_sequential_matches_direct(served):
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2, 4, 8),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(2)
    with DynamicBatcher(eng, max_wait_ms=1.0) as b:
        for n in (1, 3, 2):
            req = random_request(rng, image_shape, n)
            want_p, want_m = direct(serve_fn, req)
            got_p, got_m = b.predict(*req, timeout=300)
            np.testing.assert_allclose(got_p, want_p, atol=1e-5)
            np.testing.assert_allclose(got_m, want_m, atol=1e-5)
        st = b.stats()
    assert st["requests"] == 3 and st["instances"] == 6


def test_batcher_concurrent_many_threads(served):
    """24 mixed-size requests from 6 threads: every response equals its own
    direct result — coalescing/padding/pipelining leak nothing across
    requests; counters reconcile."""
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2, 4, 8, 16),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(3)
    reqs = [random_request(rng, image_shape, int(n))
            for n in rng.integers(1, 6, size=24)]
    want = [direct(serve_fn, r) for r in reqs]
    got = [None] * len(reqs)
    errors = []
    batcher = DynamicBatcher(eng, max_wait_ms=20.0, in_flight=2)

    def worker(idxs):
        try:
            futs = [(i, batcher.submit(*reqs[i])) for i in idxs]
            for i, f in futs:
                got[i] = f.result(timeout=300)
        except Exception as e:          # pragma: no cover - fail loudly
            errors.append(e)

    threads = [threading.Thread(target=worker,
                                args=(range(k, len(reqs), 6),))
               for k in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.close()
    assert not errors
    for i, (want_p, want_m) in enumerate(want):
        np.testing.assert_allclose(got[i][0], want_p, atol=1e-5,
                                   err_msg=f"request {i}")
        np.testing.assert_allclose(got[i][1], want_m, atol=1e-5,
                                   err_msg=f"request {i}")
    st = batcher.stats()
    assert st["requests"] == len(reqs)
    assert st["instances"] == sum(r[0].shape[0] for r in reqs)
    assert st["batches"] <= st["requests"]
    assert st["batches"] == st["engine"]["batches"]


def test_batcher_coalesces_under_backpressure(served):
    """While batch 1 holds the single in-flight slot, later submits queue up
    and MUST form a shared batch (mean fill > 1), not dispatch singly."""
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2, 4, 8, 16),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(4)
    batcher = DynamicBatcher(eng, max_wait_ms=50.0, in_flight=1)
    first = batcher.submit(*random_request(rng, image_shape, 1))
    # these queue while the first batch occupies the slot (or, worst case,
    # within each other's wait window) — either way they share batches
    time.sleep(0.05)
    rest = [batcher.submit(*random_request(rng, image_shape, 2))
            for _ in range(5)]
    for f in [first] + rest:
        f.result(timeout=300)
    batcher.close()
    st = batcher.stats()
    assert st["requests"] == 6
    assert st["batches"] < 6, f"no coalescing happened: {st}"
    assert st["mean_batch_fill"] > 1.0


def test_batcher_splits_over_max_batch(served):
    """Requests totalling > max_batch roll into the next batch, results
    still correct."""
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2, 4),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(5)
    reqs = [random_request(rng, image_shape, 3) for _ in range(3)]  # 9 > 4
    want = [direct(serve_fn, r) for r in reqs]
    with DynamicBatcher(eng, max_wait_ms=10.0) as b:
        futs = [b.submit(*r) for r in reqs]
        got = [f.result(timeout=300) for f in futs]
        st = b.stats()
    assert st["batches"] >= 3                     # 3+3 never fits bucket 4
    for g, (want_p, want_m) in zip(got, want):
        np.testing.assert_allclose(g[0], want_p, atol=1e-5)
    with pytest.raises(ValueError, match="max_batch"):
        DynamicBatcher(eng).submit(*random_request(rng, image_shape, 5))


def test_batcher_error_propagation_and_close(served):
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2),
                        image_shape=image_shape, image_dtype=np.uint8)
    b = DynamicBatcher(eng, max_wait_ms=1.0)
    rng = np.random.default_rng(6)
    good = b.submit(*random_request(rng, image_shape, 1))
    assert np.asarray(good.result(timeout=300)[0]).shape == (1, 17, 2)
    # submit-side validation raises in the CALLER, nothing enqueued
    imgs, cs, ss = random_request(rng, image_shape, 1)
    with pytest.raises(ValueError):
        b.submit(imgs[:, :-8], cs, ss)
    # close drains pending work, then rejects new submissions
    pending = b.submit(*random_request(rng, image_shape, 2))
    b.close()
    assert pending.result(timeout=1)[0].shape == (2, 17, 2)
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(imgs, cs, ss)
    b.close()                                     # idempotent


def test_http_round_trip(served):
    """Full stack over a real socket: npz request -> batched device
    execution -> npz response equals the direct call; stats + healthz."""
    import json
    import urllib.request

    from rsgnet_tpu.serving.http_server import make_server, predict_remote
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2, 4),
                        image_shape=image_shape, image_dtype=np.uint8)
    batcher = DynamicBatcher(eng, max_wait_ms=5.0)
    server = make_server(batcher, port=0)         # OS-assigned port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = "http://%s:%d" % server.server_address
    try:
        rng = np.random.default_rng(7)
        req = random_request(rng, image_shape, 2)
        want_p, want_m = direct(serve_fn, req)
        got_p, got_m = predict_remote(url, *req, timeout=300)
        np.testing.assert_allclose(got_p, want_p, atol=1e-5)
        np.testing.assert_allclose(got_m, want_m, atol=1e-5)
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert r.read() == b"ok"
        with urllib.request.urlopen(url + "/v1/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["requests"] == 1 and st["instances"] == 2
        # malformed body -> 400, not a hung/killed connection
        bad = urllib.request.Request(url + "/v1/predict", data=b"not-npz",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        # wrong shapes -> 400 with the validation message
        buf = io.BytesIO()
        np.savez(buf, images=np.zeros((1, 4, 4, 3), np.uint8),
                 centers=np.zeros((1, 2), np.float32),
                 scales=np.ones((1, 2), np.float32))
        bad = urllib.request.Request(url + "/v1/predict",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        batcher.close()


def test_crops_from_boxes_matches_reference_path(served):
    """Server-side preprocessing == composing the reference pieces by hand
    (box_to_center_scale -> get_affine_transform -> host warp), on an
    arbitrary-size frame."""
    from rsgnet_tpu.ops.affine import box_to_center_scale, \
        get_affine_transform
    from rsgnet_tpu.ops.warp import host_affine_crop
    from rsgnet_tpu.serving.preprocess import crops_from_boxes
    _, image_shape, _ = served
    h, w, _ = image_shape
    rng = np.random.default_rng(11)
    frame = rng.integers(0, 256, (97, 123, 3), dtype=np.uint8)
    boxes = np.array([[10, 15, 40, 60], [50, 5, 60, 80], [0, 0, 123, 97]],
                     np.float32)
    crops, centers, scales = crops_from_boxes(frame, boxes, (w, h))
    assert crops.shape == (3, h, w, 3) and crops.dtype == np.uint8
    for i, box in enumerate(boxes):
        c, s = box_to_center_scale(box, w / h)
        trans = get_affine_transform(c, s, 0.0, (w, h))
        np.testing.assert_array_equal(crops[i],
                                      host_affine_crop(frame, trans, (w, h)))
        np.testing.assert_allclose(centers[i], c)
        np.testing.assert_allclose(scales[i], s)
    with pytest.raises(ValueError, match="image must be"):
        crops_from_boxes(frame[..., 0], boxes, (w, h))
    with pytest.raises(ValueError, match="boxes must be"):
        crops_from_boxes(frame, boxes[:0], (w, h))


def test_http_predict_image(served):
    """Raw-frame route: the server crops, batches, and returns frame-space
    keypoints equal to preprocessing + /v1/predict done by hand — including
    a frame whose people outnumber max_batch (server-side split)."""
    from rsgnet_tpu.serving.http_server import (make_server,
                                                predict_image_remote)
    from rsgnet_tpu.serving.preprocess import crops_from_boxes
    serve_fn, image_shape, _ = served
    h, w, _ = image_shape
    eng = ServingEngine(serve_fn, buckets=(1, 2, 4),
                        image_shape=image_shape, image_dtype=np.uint8)
    batcher = DynamicBatcher(eng, max_wait_ms=5.0)
    server = make_server(batcher, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = "http://%s:%d" % server.server_address
    try:
        rng = np.random.default_rng(13)
        frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
        # 6 boxes > max_batch 4: forces the server-side split
        boxes = np.stack([np.array([10 * i, 5 * i, 50, 70], np.float32)
                          for i in range(6)])
        crops, centers, scales = crops_from_boxes(frame, boxes, (w, h))
        # ground truth: the same crops through the raw fn (6 > max_batch 4,
        # so a single /v1/predict would be rejected — the split is exactly
        # what this route adds)
        want_p, want_m = direct(serve_fn, (crops, centers, scales))
        got_p, got_m = predict_image_remote(url, frame, boxes, timeout=300)
        assert got_p.shape == (6, 17, 2) and got_m.shape == (6, 17, 1)
        np.testing.assert_allclose(got_p, want_p, atol=1e-5)
        np.testing.assert_allclose(got_m, want_m, atol=1e-5)
        # encoded-frame flavor: jpeg bytes must equal posting the decoded
        # pixels (JPEG is lossy, so ground truth is the same decoded array
        # through the image= flavor — byte-identical inputs server-side)
        from PIL import Image
        from rsgnet_tpu.utils.imageio import decode_image
        jbuf = io.BytesIO()
        Image.fromarray(frame).save(jbuf, format="JPEG", quality=90)
        jpeg_bytes = jbuf.getvalue()
        want_jp, want_jm = predict_image_remote(
            url, image=decode_image(jpeg_bytes), boxes=boxes[:3],
            timeout=300)
        got_jp, got_jm = predict_image_remote(url, jpeg=jpeg_bytes,
                                              boxes=boxes[:3], timeout=300)
        np.testing.assert_allclose(got_jp, want_jp, atol=1e-5)
        np.testing.assert_allclose(got_jm, want_jm, atol=1e-5)
        # malformed: missing boxes -> 400; neither image nor jpeg -> 400
        import urllib.error
        import urllib.request
        buf = io.BytesIO()
        np.savez(buf, image=frame)
        bad = urllib.request.Request(url + "/v1/predict_image",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        buf = io.BytesIO()
        np.savez(buf, boxes=boxes)
        bad = urllib.request.Request(url + "/v1/predict_image",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        with pytest.raises(ValueError, match="exactly one"):
            predict_image_remote(url, image=frame, jpeg=jpeg_bytes,
                                 boxes=boxes)
    finally:
        server.shutdown()
        server.server_close()
        batcher.close()


def test_http_predict_image_float_engine(served):
    """A float32 engine (artifact exported with normalize_input=False)
    serves normalized crops: the route must apply the ImageNet normalization
    server-side and still match the uint8 engine's answers."""
    from rsgnet_tpu.core.inference import make_inference_fn
    from rsgnet_tpu.serving.http_server import (make_server,
                                                predict_image_remote)
    serve_fn, image_shape, cfg = served
    h, w, _ = image_shape
    model = get_pose_net(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    infer = make_inference_fn(cfg, model, normalize_input=False)

    def float_fn(images, centers, scales):
        return infer(variables, images, centers, scales)

    eng = ServingEngine(float_fn, buckets=(1, 2),
                        image_shape=image_shape, image_dtype=np.float32)
    batcher = DynamicBatcher(eng, max_wait_ms=5.0)
    server = make_server(batcher, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = "http://%s:%d" % server.server_address
    try:
        rng = np.random.default_rng(17)
        frame = rng.integers(0, 256, (90, 110, 3), dtype=np.uint8)
        boxes = np.array([[5, 5, 60, 80]], np.float32)
        got_p, got_m = predict_image_remote(url, frame, boxes, timeout=300)
        # ground truth through the uint8 fixture fn (normalize on device)
        from rsgnet_tpu.serving.preprocess import crops_from_boxes
        crops, centers, scales = crops_from_boxes(frame, boxes, (w, h))
        want_p, want_m = direct(serve_fn, (crops, centers, scales))
        np.testing.assert_allclose(got_p, want_p, atol=1e-3)
        np.testing.assert_allclose(got_m, want_m, atol=1e-4)
    finally:
        server.shutdown()
        server.server_close()
        batcher.close()


def test_engine_on_exported_artifact(served):
    """The engine serves a StableHLO artifact (symbolic batch dim) the same
    as the live fn — the deployment configuration docs/SERVING.md
    recommends."""
    serve_fn, image_shape, cfg = served
    from rsgnet_tpu.utils.export import export_inference, load_exported
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    blob = export_inference(cfg, model, variables, normalize_input=True)
    eng = ServingEngine(load_exported(blob), buckets=(2,),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(8)
    req = random_request(rng, image_shape, 1)
    want_p, want_m = direct(serve_fn, req)
    with DynamicBatcher(eng, max_wait_ms=1.0) as b:
        got_p, got_m = b.predict(*req, timeout=300)
    np.testing.assert_allclose(got_p, want_p, atol=1e-5)
    np.testing.assert_allclose(got_m, want_m, atol=1e-5)


def test_batcher_over_sharded_mesh(served):
    """Multi-chip serving: the engine wraps a data-parallel sharded infer fn
    (8 virtual devices); buckets are multiples of the mesh size so every
    padded batch divides evenly, and results still equal the single-device
    direct call (docs/SERVING.md multi-chip note, made concrete)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rsgnet_tpu.parallel.mesh import make_mesh
    serve_fn, image_shape, cfg = served
    mesh = make_mesh(axis_name="data")
    if mesh.size < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    model = get_pose_net(cfg)
    h, w, _ = image_shape
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    infer = make_inference_fn(cfg, model, jit=False, normalize_input=True)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded = jax.jit(infer, in_shardings=(repl, shard, shard, shard),
                      out_shardings=(shard, shard))
    variables = jax.device_put(variables, repl)

    def serve_sharded(images, centers, scales):
        return sharded(variables, images, centers, scales)

    n = mesh.size
    eng = ServingEngine(serve_sharded, buckets=(n, 2 * n),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(9)
    reqs = [random_request(rng, image_shape, k) for k in (1, 3, 5)]
    want = [direct(serve_fn, r) for r in reqs]
    with DynamicBatcher(eng, max_wait_ms=10.0) as b:
        futs = [b.submit(*r) for r in reqs]
        got = [f.result(timeout=300) for f in futs]
    for g, (want_p, want_m) in zip(got, want):
        np.testing.assert_allclose(g[0], want_p, atol=1e-5)
        np.testing.assert_allclose(g[1], want_m, atol=1e-5)


def _pend(ns):
    from rsgnet_tpu.serving.batcher import _Pending
    from concurrent.futures import Future
    z = np.zeros((1, 1))
    return [_Pending(z, z, z, n, Future()) for n in ns]


def test_chunker_bucket_alignment(served):
    """_chunks_for_buckets: split only when the MEASURED per-bucket costs
    say it wins; FIFO order and request atomicity preserved."""
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 8, 64, 256),
                        image_shape=image_shape, image_dtype=np.uint8)
    # synthetic cost table with the measured SHAPE of this model's costs:
    # a large per-dispatch overhead + a linear term (BENCH_NOTES serving
    # latency profile: B=1 54 ms, B=64 100 ms)
    eng.bucket_cost = {1: 0.031, 8: 0.038, 64: 0.094, 256: 0.286}
    b = DynamicBatcher(eng, max_wait_ms=1.0)
    try:
        chunk = b._chunks_for_buckets

        # the sweep's case: 102 singles -> full 64 + remainder 38 (two
        # 94 ms dispatches, 188 ms < one 256-bucket at 286 ms); the
        # remainder is NOT fragmented into 8s (5 more dispatches would
        # cost 228 ms)
        g = _pend([1] * 102)
        got = chunk(g, 102)
        assert [s for _, s in got] == [64, 38]
        assert [p.n for c, _ in got for p in c] == [1] * 102
        assert got[0][0] == g[:64] and got[1][0] == g[64:]  # FIFO kept

        # exact bucket fit: never split
        assert [s for _, s in chunk(_pend([32, 32]), 64)] == [64]
        # below the smallest usable boundary: one chunk
        assert [s for _, s in chunk(_pend([1, 1, 1]), 3)] == [3]
        # atomic boundaries can make splitting worse: 4+3 over {1,8,...}
        # costs two 8-bucket dispatches split vs one kept -> no split
        assert [s for _, s in chunk(_pend([4, 3]), 7)] == [7]
        # 65 = full 64 + a straggler single (125 ms vs 286 ms)
        assert [s for _, s in chunk(_pend([1] * 65), 65)] == [64, 1]
        # greedy prefix respects atomicity: 40 + 24 singles fill 64 whole
        assert [s for _, s in chunk(_pend([40] + [1] * 24), 64)] == [64]
        # 200 singles: 3x64 + 8 costs 320 ms — WORSE than one 256-bucket
        # (286 ms); the cost model keeps it whole (instance counting
        # would have split it)
        assert [s for _, s in chunk(_pend([1] * 200), 200)] == [200]
        # without a cost table (warmup not run): original behavior
        eng.bucket_cost = {}
        assert [s for _, s in chunk(_pend([1] * 102), 102)] == [102]
    finally:
        b.close()


def test_batcher_dispatches_bucket_aligned_chunks(served):
    """End to end: a coalesced group that falls between buckets dispatches
    as a full lower bucket + remainder, and every request's results still
    equal the direct call."""
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 4, 16),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(11)
    release = threading.Event()
    calls = []

    def gated(images, centers, scales):
        calls.append(images.shape[0])
        release.wait(60)
        return serve_fn(images, centers, scales)

    geng = ServingEngine(gated, buckets=(1, 4, 16),
                         image_shape=image_shape, image_dtype=np.uint8)
    # a cost table under which 4+1 (80 ms) beats one 16-bucket (200 ms)
    geng.bucket_cost = {1: 0.03, 4: 0.05, 16: 0.2}
    b = DynamicBatcher(geng, max_wait_ms=30.0, in_flight=1)
    try:
        # the first request grabs the slot; 5 more singles queue behind it
        # -> a coalesced group of 5 = full 4-bucket + 1 single,
        # NOT one 16-bucket
        reqs = [random_request(rng, image_shape, 1) for _ in range(6)]
        want = [direct(serve_fn, r) for r in reqs]
        futs = [b.submit(*reqs[0])]
        time.sleep(0.2)               # let the dispatcher take the slot
        futs += [b.submit(*r) for r in reqs[1:]]
        time.sleep(0.3)               # group of 5 coalesces in the queue
        release.set()
        got = [f.result(timeout=300) for f in futs]
    finally:
        b.close()
    for g, (want_p, want_m) in zip(got, want):
        np.testing.assert_allclose(g[0], want_p, atol=1e-5)
        np.testing.assert_allclose(g[1], want_m, atol=1e-5)
    assert calls[0] == 1
    # the queued 5 went out as 4 + 1 (bucket-aligned), not padded to 16
    assert sorted(calls[1:]) == [1, 4], calls


# --- admission control + deadline-aware dispatch (VERDICT round-4 item 3) ---


def _gated_engine(served, buckets=(1, 2, 4)):
    """Engine whose serve_fn blocks until the gate opens — deterministic
    queue buildup for admission-control scenarios."""
    serve_fn, image_shape, _ = served
    gate = threading.Event()

    def gated(images, centers, scales):
        gate.wait(120)
        return serve_fn(images, centers, scales)

    eng = ServingEngine(gated, buckets=buckets, image_shape=image_shape,
                        image_dtype=np.uint8)
    return eng, gate, image_shape


def _wait_queue_drained(batcher, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if batcher.stats()["queued_instances"] == 0:
            return
        time.sleep(0.01)
    raise AssertionError("dispatcher never took the queued request")


def test_admission_control_sheds_at_capacity(served):
    """max_queued bounds the waiting instances: the submit that would
    exceed it raises QueueFullError with a positive retry estimate, is
    counted as rejected, and every ADMITTED request still completes."""
    from rsgnet_tpu.serving import QueueFullError
    eng, gate, image_shape = _gated_engine(served)
    rng = np.random.default_rng(21)
    b = DynamicBatcher(eng, max_wait_ms=1.0, in_flight=1, max_queued=3)
    try:
        futs = [b.submit(*random_request(rng, image_shape, 1))]
        _wait_queue_drained(b)          # dispatcher blocked in the engine
        futs += [b.submit(*random_request(rng, image_shape, 1))
                 for _ in range(3)]
        with pytest.raises(QueueFullError) as ei:
            b.submit(*random_request(rng, image_shape, 1))
        assert ei.value.retry_after_s > 0
        st = b.stats()
        assert st["rejected"] == 1
        assert st["queued_instances"] == 3
        gate.set()
        for f in futs:                  # shed costs the shed request only
            f.result(timeout=300)
        st = b.stats()
        assert st["rejected"] == 1 and st["requests"] == 4
        assert st["queued_instances"] == 0      # ledger back to zero
    finally:
        gate.set()
        b.close()


def test_deadline_dropped_at_dispatch(served):
    """A request whose deadline passed while queued completes with
    DeadlineExceededError and never reaches the device (no engine batch)."""
    from rsgnet_tpu.serving import DeadlineExceededError
    eng, gate, image_shape = _gated_engine(served)
    rng = np.random.default_rng(22)
    b = DynamicBatcher(eng, max_wait_ms=1.0, in_flight=1)
    try:
        f1 = b.submit(*random_request(rng, image_shape, 1))
        _wait_queue_drained(b)          # f1 holds the device slot
        f2 = b.submit(*random_request(rng, image_shape, 1), timeout_s=0.05)
        time.sleep(0.25)                # f2's deadline passes in the queue
        gate.set()
        with pytest.raises(DeadlineExceededError):
            f2.result(timeout=300)
        f1.result(timeout=300)          # the live request is unaffected
        assert b.stats()["expired"] == 1
        assert eng.stats()["batches"] == 1      # f2 cost zero device time
    finally:
        gate.set()
        b.close()


def test_http_sheds_503_with_retry_after(served):
    """Saturation through the HTTP front: queue full -> 503 + Retry-After
    (the load balancer's signal), not an unbounded wait."""
    import urllib.error

    from rsgnet_tpu.serving.http_server import make_server, predict_remote
    eng, gate, image_shape = _gated_engine(served)
    batcher = DynamicBatcher(eng, max_wait_ms=1.0, in_flight=1, max_queued=1)
    server = make_server(batcher, port=0, request_timeout_s=60.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = "http://%s:%d" % server.server_address
    rng = np.random.default_rng(23)
    try:
        f1 = batcher.submit(*random_request(rng, image_shape, 1))
        _wait_queue_drained(batcher)
        f2 = batcher.submit(*random_request(rng, image_shape, 1))
        with pytest.raises(urllib.error.HTTPError) as ei:
            predict_remote(url, *random_request(rng, image_shape, 1),
                           timeout=30)
        assert ei.value.code == 503
        assert int(ei.value.headers["Retry-After"]) >= 1
        assert "retry_after_s" in ei.value.read().decode()
        gate.set()
        f1.result(timeout=300)
        f2.result(timeout=300)
    finally:
        gate.set()
        server.shutdown()
        server.server_close()
        batcher.close()


def test_http_times_out_504(served):
    """A stalled engine turns into a bounded 504 for the client (the
    server-side request_timeout_s), not an indefinite hang."""
    import urllib.error

    from rsgnet_tpu.serving.http_server import make_server, predict_remote
    eng, gate, image_shape = _gated_engine(served)
    batcher = DynamicBatcher(eng, max_wait_ms=1.0, in_flight=1)
    server = make_server(batcher, port=0, request_timeout_s=0.3)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = "http://%s:%d" % server.server_address
    rng = np.random.default_rng(24)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            predict_remote(url, *random_request(rng, image_shape, 1),
                           timeout=30)
        assert ei.value.code == 504
    finally:
        gate.set()
        server.shutdown()
        server.server_close()
        batcher.close()


def test_admission_bounds_waiting_not_request_size(served):
    """Review finding (round 5): max_queued bounds what is ALREADY
    waiting — a legal single request larger than max_queued must be
    admitted on an idle server (the old check compared queued + n against
    the bound and rejected it forever)."""
    serve_fn, image_shape, _ = served
    eng = ServingEngine(serve_fn, buckets=(1, 2, 4, 8),
                        image_shape=image_shape, image_dtype=np.uint8)
    rng = np.random.default_rng(25)
    with DynamicBatcher(eng, max_wait_ms=1.0, max_queued=2) as b:
        req = random_request(rng, image_shape, 6)     # 6 > max_queued 2
        want_p, want_m = direct(serve_fn, req)
        got_p, got_m = b.predict(*req, timeout=300)
    np.testing.assert_allclose(got_p, want_p, atol=1e-5)
    np.testing.assert_allclose(got_m, want_m, atol=1e-5)


def test_submit_many_atomic_admission(served):
    """submit_many: a frame's chunk list admits whole or sheds whole —
    a shed frame costs ZERO device time (no earlier-chunk orphans)."""
    from rsgnet_tpu.serving import QueueFullError
    eng, gate, image_shape = _gated_engine(served, buckets=(1, 2))
    rng = np.random.default_rng(26)
    b = DynamicBatcher(eng, max_wait_ms=1.0, in_flight=1, max_queued=1)
    try:
        f1 = b.submit(*random_request(rng, image_shape, 1))
        _wait_queue_drained(b)          # device slot held
        f2 = b.submit(*random_request(rng, image_shape, 1))   # queue at cap
        reqs = [random_request(rng, image_shape, 2) for _ in range(3)]
        with pytest.raises(QueueFullError):
            b.submit_many(reqs, timeout_s=60)
        st = b.stats()
        assert st["queued_instances"] == 1      # nothing partially enqueued
        assert st["rejected"] == 3              # every chunk counted shed
        gate.set()
        f1.result(timeout=300)
        f2.result(timeout=300)
        # with capacity back, the same group admits whole and matches the
        # direct calls
        futs = b.submit_many(reqs, timeout_s=300)
        for f, r in zip(futs, reqs):
            want_p, want_m = direct(served[0], r)
            got_p, got_m = f.result(timeout=300)
            np.testing.assert_allclose(got_p, want_p, atol=1e-5)
            np.testing.assert_allclose(got_m, want_m, atol=1e-5)
        assert b.stats()["queued_instances"] == 0
    finally:
        gate.set()
        b.close()
