"""Native libjpeg decoder (csrc/jpeg_loader.cpp): bit-parity vs PIL, canvas
semantics, fallbacks, and the dataset decode cache.

The host pipeline's decode path (reference ``lib/dataset/JointsDataset.py``
reads via cv2 — SURVEY.md §2.9/§3.1) must produce IDENTICAL pixels whichever
backend decodes: the system libjpeg-turbo and Pillow's bundled turbo share
the same engine, so equality is exact, and these tests pin that rather than
assume it.
"""
import io
import pickle

import numpy as np
import pytest
from PIL import Image

from rsgnet_tpu.utils import native_jpeg


def _jpeg_bytes(arr, mode="RGB", quality=90):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _pil_rgb(data):
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


needs_native = pytest.mark.skipif(not native_jpeg.available(),
                                  reason="no compiler/libjpeg")


@needs_native
@pytest.mark.parametrize("shape,mode,quality", [
    ((480, 640), "RGB", 90),
    ((123, 77), "RGB", 75),      # odd dims exercise MCU edge blocks
    ((256, 256), "L", 85),       # grayscale source -> RGB in-decoder
    ((640, 640), "RGB", 95),
    ((8, 8), "RGB", 50),
])
def test_decode_bit_parity_vs_pil(shape, mode, quality):
    rng = np.random.RandomState(hash((shape, mode)) % (2**31))
    arr = rng.randint(0, 256, shape if mode == "L" else shape + (3,),
                      dtype=np.uint8)
    data = _jpeg_bytes(arr, mode=mode, quality=quality)
    nat = native_jpeg.decode(data)
    assert nat is not None
    np.testing.assert_array_equal(nat, _pil_rgb(data))


@needs_native
def test_decode_into_canvas_pads_and_matches():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (200, 300, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr)
    canvas = np.zeros((256, 320, 3), np.uint8)
    assert native_jpeg.decode_into(data, canvas) == (200, 300)
    np.testing.assert_array_equal(canvas[:200, :300], _pil_rgb(data))
    assert canvas[200:].max() == 0 and canvas[:, 300:].max() == 0


@needs_native
def test_decode_into_too_big_raises():
    data = _jpeg_bytes(np.zeros((100, 50, 3), np.uint8))
    with pytest.raises(ValueError):
        native_jpeg.decode_into(data, np.zeros((64, 64, 3), np.uint8))
    # the other axis too
    with pytest.raises(ValueError):
        native_jpeg.decode_into(data, np.zeros((128, 32, 3), np.uint8))


def test_non_jpeg_returns_none():
    canvas = np.zeros((64, 64, 3), np.uint8)
    assert native_jpeg.decode(b"\x89PNG\r\n\x1a\n") is None
    assert native_jpeg.decode_into(b"\x89PNG\r\n\x1a\n", canvas) is None
    assert native_jpeg.decode(b"") is None


@needs_native
def test_corrupt_jpeg_returns_none_not_crash():
    data = _jpeg_bytes(np.zeros((32, 32, 3), np.uint8))
    # truncated mid-stream: must fail cleanly, not exit(). libjpeg treats
    # premature EOF as a WARNING (suppressed by emit_silent), so a partial
    # decode to the full header dims is an acceptable outcome; crashing or
    # returning a wrong-shaped array is not. Truncating inside the HEADER
    # makes exif_orientation fail closed -> None.
    bad = bytes(data[: len(data) // 2])
    out = native_jpeg.decode(bad)
    assert out is None or out.shape == (32, 32, 3)
    assert native_jpeg.decode(bad[:8]) is None
    garbage = b"\xff\xd8" + b"\x00" * 64
    assert native_jpeg.decode(garbage) is None


def test_decode_image_dispatch_matches_pil():
    """utils.imageio.decode_image must give identical pixels whichever
    backend it picks (native or PIL)."""
    from rsgnet_tpu.utils.imageio import decode_image
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (90, 110, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr, quality=92)
    np.testing.assert_array_equal(decode_image(data), _pil_rgb(data))


def test_load_sample_canvas_identical_across_backends(tmp_path, monkeypatch):
    """The dataset's canvas is byte-identical with the native decoder on or
    off (RSGNET_DISABLE_NATIVE_JPEG path = PIL paste)."""
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data import get_dataset

    write_fixture(str(tmp_path), make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.TEST_SET = "val"
    ds = get_dataset(cfg, root=str(tmp_path), image_set="val")
    native_samples = [ds.load_sample(i) for i in range(min(4, len(ds)))]

    monkeypatch.setattr(native_jpeg, "_DISABLED", True)
    ds_pil = get_dataset(cfg, root=str(tmp_path), image_set="val")
    for i, s_nat in enumerate(native_samples):
        s_pil = ds_pil.load_sample(i)
        np.testing.assert_array_equal(s_nat["image"], s_pil["image"])
        np.testing.assert_array_equal(s_nat["center"], s_pil["center"])


def test_decode_cache_shares_across_instances(tmp_path):
    """Instances of the same image decode once; entries are read-only and
    stacking still works."""
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data import get_dataset
    import rsgnet_tpu.data.dataset as dsmod

    write_fixture(str(tmp_path), make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.TEST_SET = "val"
    ds = get_dataset(cfg, root=str(tmp_path), image_set="val")
    # image 1 holds two instances -> same cached canvas object
    paths = [ds.db[i]["image_path"] for i in range(len(ds))]
    same_img = [i for i, p in enumerate(paths) if p == paths[0]]
    assert len(same_img) >= 2, "fixture should have a multi-instance image"

    calls = []
    orig = dsmod.read_bytes

    def counting_read_bytes(path):
        calls.append(path)
        return orig(path)

    dsmod.read_bytes, saved = counting_read_bytes, dsmod.read_bytes
    try:
        s0 = ds.load_sample(same_img[0])
        s1 = ds.load_sample(same_img[1])
    finally:
        dsmod.read_bytes = saved
    assert len(calls) == 1, "second instance must hit the decode cache"
    assert s0["image"] is s1["image"], "cache should share the canvas"
    assert not s0["image"].flags.writeable
    # collate copies: batches are independent of the cached canvas
    batch = ds.collate(same_img[:2])
    assert batch["image"].flags.writeable
    np.testing.assert_array_equal(batch["image"][0], batch["image"][1])


def test_decode_cache_pickles_fresh():
    from rsgnet_tpu.data.dataset import _DecodeCache
    c = _DecodeCache(max_bytes=4096)
    c.put("k", ("canvas", np.zeros((2, 2, 3), np.uint8), 2, 2))
    c2 = pickle.loads(pickle.dumps(c))
    assert c2.max_bytes == 4096 and c2.get("k") is None


def test_exif_oriented_jpeg_declined_and_routed_to_cv2():
    """cv2.imdecode (the decode path the native loader replaced) APPLIES the
    EXIF orientation tag; libjpeg ignores it. Oriented JPEGs must therefore
    be declined by the native path so decode_image keeps cv2's geometry —
    otherwise predictions land on rotated pixels with no error raised."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (100, 60, 3), dtype=np.uint8)
    exif = Image.Exif()
    exif[274] = 6                         # orientation: rotate 90 CW
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90, exif=exif)
    data = buf.getvalue()

    assert native_jpeg.exif_orientation(data) == 6
    assert native_jpeg.decode(data) is None
    canvas = np.zeros((640, 640, 3), np.uint8)
    assert native_jpeg.decode_into(data, canvas) is None

    from rsgnet_tpu.utils.imageio import decode_image
    got = decode_image(data)
    want = cv2.cvtColor(
        cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB)
    assert want.shape == (60, 100, 3)     # cv2 applied the rotation
    np.testing.assert_array_equal(got, want)

    # untagged (and orientation=1) JPEGs stay on the native path
    plain = _jpeg_bytes(arr)
    assert native_jpeg.exif_orientation(plain) is None
    if native_jpeg.available():
        assert native_jpeg.decode(plain) is not None


def test_exif_parse_failure_fails_closed():
    """A JPEG whose marker stream we can't parse might still carry an
    orientation tag, so the native path must DECLINE (cv2/PIL fallback keeps
    the geometry) — parse failure is NOT 'no EXIF'. Legal 0xFF fill bytes
    before a marker must not derail the walk either."""
    data = _jpeg_bytes(np.zeros((16, 16, 3), np.uint8))
    # fill bytes between segments are legal: still a well-formed walk
    padded = data[:2] + b"\xff\xff" + data[2:]
    assert native_jpeg.exif_orientation(padded) is None
    # truncated header -> PARSE_FAILED -> both decoders decline
    assert native_jpeg.exif_orientation(data[:6]) is native_jpeg.PARSE_FAILED
    assert native_jpeg.decode(data[:6]) is None
    # non-marker byte where a marker must be -> PARSE_FAILED
    bad = b"\xff\xd8" + b"\x12\x34" + b"\x00" * 32
    assert native_jpeg.exif_orientation(bad) is native_jpeg.PARSE_FAILED
    assert native_jpeg.decode_into(bad, np.zeros((64, 64, 3), np.uint8)) \
        is None


def test_half_body_widens_needed_extent():
    """Half-body aug re-centers onto the selected joints' mean (up to ~box/2
    from the detection center the >canvas window is placed around), so the
    training read-extent must widen by a full box when it can fire."""
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data.dataset import TopDownDataset
    from rsgnet_tpu.data.skeletons import get_spec

    cfg = tiny_rsgnet()
    cfg.DATASET.PROB_HALF_BODY = 0.3
    ds = TopDownDataset(cfg, root="/nonexistent", image_set="train",
                        is_train=True, spec=get_spec("coco"))
    scale = np.array([1.0, 1.0], np.float32)        # 200 px box
    with_hb = ds._needed_extent(scale)
    cfg.DATASET.PROB_HALF_BODY = 0.0
    without_hb = ds._needed_extent(scale)
    np.testing.assert_allclose(with_hb - without_hb, 200.0)
    # eval extent is untouched by training margins
    ds.is_train = False
    np.testing.assert_allclose(ds._needed_extent(scale), 204.0)


def test_decode_cache_evicts_lru_by_bytes():
    # pure-Python cache logic — must run in PIL-fallback environments too.
    # Byte-budgeted: a "full" entry (full-resolution decode) costs its real
    # size, so big entries evict many small ones and memory stays bounded.
    from rsgnet_tpu.data.dataset import _DecodeCache
    kb = np.zeros(1024, np.uint8)
    c = _DecodeCache(max_bytes=2 * 1024)
    c.put("a", ("full", kb))
    c.put("b", ("full", kb.copy()))
    assert c.get("a") is not None    # refresh a
    c.put("c", ("full", kb.copy()))  # evicts b (LRU), not a
    assert c.get("b") is None and c.get("a") is not None \
        and c.get("c") is not None
    # re-putting the same key replaces, not double-counts
    c.put("a", ("full", kb.copy()))
    assert c.get("c") is not None
    # an entry larger than the whole budget is declined (and evicts nothing)
    c.put("huge", ("full", np.zeros(4096, np.uint8)))
    assert c.get("huge") is None and c.get("a") is not None
    assert c._bytes <= c.max_bytes
