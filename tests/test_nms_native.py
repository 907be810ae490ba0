"""C++ OKS-NMS vs NumPy oracle vs JAX device kernel — three independent
implementations must agree (SURVEY.md §2.14)."""
import numpy as np
import pytest

from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.ops.nms import oks_nms_np, soft_oks_nms_np
from rsgnet_tpu.ops.nms_native import (available, oks_nms_cpp,
                                       soft_oks_nms_cpp)

SIGMAS = get_spec("coco").sigmas
pytestmark = pytest.mark.skipif(not available(),
                                reason="no C++ toolchain in environment")


def random_db(m, k=17, seed=0, spread=80.0):
    rng = np.random.RandomState(seed)
    db = []
    base = rng.uniform(100, 400, (m, 1, 2))
    for i in range(m):
        kp = np.zeros((k, 3), np.float32)
        kp[:, :2] = base[i] + rng.uniform(-spread, spread, (k, 2))
        kp[:, 2] = rng.uniform(0.1, 1.0, k)
        db.append({"keypoints": kp,
                   "score": float(rng.uniform(0.2, 1.0)),
                   "area": float(rng.uniform(5e3, 5e4))})
    return db


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("m", [1, 2, 5, 16])
def test_greedy_matches_oracle(seed, m):
    db = random_db(m, seed=seed, spread=30.0 if seed % 2 else 150.0)
    for thresh in (0.5, 0.9):
        for ivt in (None, 0.2):
            got = oks_nms_cpp(db, thresh, SIGMAS, ivt)
            want = oks_nms_np(db, thresh, SIGMAS, ivt)
            assert got == list(want), (seed, m, thresh, ivt)


@pytest.mark.parametrize("seed", range(5))
def test_soft_matches_oracle(seed):
    db = random_db(10, seed=seed, spread=40.0)
    keep_c, sc_c = soft_oks_nms_cpp(db, 0.9, SIGMAS, max_dets=6)
    keep_n, sc_n = soft_oks_nms_np(db, 0.9, SIGMAS, max_dets=6)
    assert keep_c == list(keep_n)
    np.testing.assert_allclose(sc_c, np.asarray(sc_n, np.float32), rtol=1e-5)


def test_cpp_matches_jax_device_kernel():
    import jax.numpy as jnp
    from rsgnet_tpu.ops.nms import oks_nms_jax
    db = random_db(12, seed=3, spread=60.0)
    kpts = np.stack([np.asarray(d["keypoints"], np.float32) for d in db])
    scores = np.asarray([d["score"] for d in db], np.float32)
    areas = np.asarray([d["area"] for d in db], np.float32)
    keep_mask = np.asarray(oks_nms_jax(jnp.asarray(kpts), jnp.asarray(scores),
                                       jnp.asarray(areas), SIGMAS, 0.9))
    keep_cpp = sorted(oks_nms_cpp(db, 0.9, SIGMAS))
    assert sorted(np.where(keep_mask)[0].tolist()) == keep_cpp


@pytest.mark.parametrize("seed", range(3))
def test_batched_device_nms_matches_per_image_oracle(seed):
    """batched_oks_nms_jax (one device call, padded) == per-image NumPy
    greedy, across variable instance counts."""
    from rsgnet_tpu.ops.nms import batched_oks_nms_jax
    rng = np.random.RandomState(seed)
    groups = []
    for m in (1, 3, 7, 12):
        groups.append(random_db(m, seed=seed * 10 + m,
                                spread=40.0 if m % 2 else 140.0))
    kpts = [np.stack([np.asarray(d["keypoints"], np.float32) for d in g])
            for g in groups]
    scores = [np.asarray([d["score"] for d in g], np.float32) for g in groups]
    areas = [np.asarray([d["area"] for d in g], np.float32) for g in groups]
    keeps = batched_oks_nms_jax(kpts, scores, areas, SIGMAS, 0.9)
    for g, keep in zip(groups, keeps):
        want = sorted(oks_nms_np(g, 0.9, SIGMAS))
        assert sorted(keep.tolist()) == want


def test_device_nms_in_dataset_evaluate(tmp_path):
    """TEST.DEVICE_NMS end-to-end through COCODataset.evaluate: same AP as
    the host path."""
    import json, os
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data import get_dataset
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture
    root = str(tmp_path)
    ds_dict = make_dataset()
    write_fixture(root, ds_dict)
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.TEST.DEVICE_NMS = False          # host path first (device default on)
    ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    n, k = len(ds), ds.num_joints
    preds = np.zeros((n, k, 3), np.float32)
    boxes = np.zeros((n, 6), np.float32)
    ids = np.zeros((n,), np.int64)
    for i, rec in enumerate(ds.db):
        preds[i, :, :2] = rec["joints"][:, :2] + i * 0.5
        preds[i, :, 2] = rec["joints_vis"][:, 0]
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(rec["scale"] * 200.0)
        boxes[i, 5] = 1.0
        ids[i] = rec["image_id"]
    _, ap_host = ds.evaluate(preds, boxes, ids)
    cfg.TEST.DEVICE_NMS = True
    _, ap_dev = ds.evaluate(preds, boxes, ids)
    assert ap_dev == ap_host


def test_duplicate_suppression():
    db = random_db(1, seed=0)
    db[0]["score"] = 0.9
    dup = {"keypoints": db[0]["keypoints"] + 0.5, "score": 0.5,
           "area": db[0]["area"]}
    db.append(dup)
    assert oks_nms_cpp(db, 0.9, SIGMAS) == [0]


@pytest.mark.parametrize("seed", range(4))
def test_exact_score_ties_three_way(seed):
    """Quantized scores (every instance ties with several others): all three
    implementations must agree — the tie-break is defined as 'highest index
    first among equal scores' (oracle: stable-sort / max-scan; C++: >= scan;
    device: reversed argmax). VERDICT round-2 item 8."""
    import jax.numpy as jnp
    from rsgnet_tpu.ops.nms import oks_nms_jax, soft_oks_nms_jax

    m = 10
    db = random_db(m, seed=seed, spread=50.0)
    rng = np.random.RandomState(seed + 99)
    for d in db:                          # 3 score levels over 10 instances
        d["score"] = float(rng.choice([0.25, 0.5, 0.75]))

    for thresh in (0.5, 0.9):
        want = oks_nms_np(db, thresh, SIGMAS)
        got = oks_nms_cpp(db, thresh, SIGMAS)
        assert got == list(want), (seed, thresh)
        kpts = np.stack([np.asarray(d["keypoints"], np.float32) for d in db])
        scores = np.asarray([d["score"] for d in db], np.float32)
        areas = np.asarray([d["area"] for d in db], np.float32)
        keep_mask = np.asarray(oks_nms_jax(
            jnp.asarray(kpts), jnp.asarray(scores), jnp.asarray(areas),
            SIGMAS, thresh))
        assert sorted(np.where(keep_mask)[0].tolist()) == sorted(want)

    keep_n, sc_n = soft_oks_nms_np(db, 0.9, SIGMAS, max_dets=6)
    keep_c, sc_c = soft_oks_nms_cpp(db, 0.9, SIGMAS, max_dets=6)
    assert keep_c == list(keep_n), seed
    np.testing.assert_allclose(sc_c, np.asarray(sc_n, np.float32), rtol=1e-5)
    kpts = np.stack([np.asarray(d["keypoints"], np.float32) for d in db])
    scores = np.asarray([d["score"] for d in db], np.float32)
    areas = np.asarray([d["area"] for d in db], np.float32)
    keep_j, sc_j = soft_oks_nms_jax(jnp.asarray(kpts), jnp.asarray(scores),
                                    jnp.asarray(areas), SIGMAS, 0.9,
                                    max_dets=6)
    assert sorted(np.where(np.asarray(keep_j))[0].tolist()) == sorted(keep_n)
    np.testing.assert_allclose(np.asarray(sc_j)[np.asarray(keep_n)],
                               np.asarray(sc_n, np.float32), rtol=1e-4)

    # UNDECAYED exact ties: far-apart instances (mutual OKS == 0, so the
    # gaussian decay is exactly 1) with one shared score keep the tie alive
    # into EVERY selection round — the regime where a per-round re-sort
    # oracle alternated tie order and the kept SET diverged across backends.
    far = []
    for i, d in enumerate(db):
        kp = np.asarray(d["keypoints"], np.float32).copy()
        kp[:, 0] += 10000.0 * (i + 1)
        far.append({"keypoints": kp, "score": 0.7, "area": d["area"]})
    keep_n, sc_n = soft_oks_nms_np(far, 0.9, SIGMAS, max_dets=6)
    # the defined rule, explicitly: highest index first among pure ties
    assert list(keep_n) == [9, 8, 7, 6, 5, 4]
    np.testing.assert_allclose(sc_n, 0.7, rtol=1e-6)
    keep_c, sc_c = soft_oks_nms_cpp(far, 0.9, SIGMAS, max_dets=6)
    assert keep_c == list(keep_n), seed
    np.testing.assert_allclose(sc_c, np.asarray(sc_n, np.float32), rtol=1e-5)
    kpts = np.stack([np.asarray(d["keypoints"], np.float32) for d in far])
    scores = np.asarray([d["score"] for d in far], np.float32)
    areas = np.asarray([d["area"] for d in far], np.float32)
    keep_j, sc_j = soft_oks_nms_jax(jnp.asarray(kpts), jnp.asarray(scores),
                                    jnp.asarray(areas), SIGMAS, 0.9,
                                    max_dets=6)
    assert sorted(np.where(np.asarray(keep_j))[0].tolist()) == sorted(keep_n)
    np.testing.assert_allclose(np.asarray(sc_j)[np.asarray(keep_n)],
                               np.asarray(sc_n, np.float32), rtol=1e-4)


def test_device_soft_nms_in_dataset_evaluate(tmp_path):
    """TEST.DEVICE_NMS + TEST.SOFT_NMS end-to-end through evaluate(): same
    AP as the host soft-NMS path (VERDICT round-1 item 6). Instances are
    near-duplicated so soft suppression actually fires."""
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data import get_dataset
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture
    root = str(tmp_path)
    ds_dict = make_dataset()
    write_fixture(root, ds_dict)
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.TEST.DEVICE_NMS = False          # host path first (device default on)
    ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    n, k = len(ds), ds.num_joints
    # duplicate every instance with a jitter -> overlapping candidates
    preds = np.zeros((2 * n, k, 3), np.float32)
    boxes = np.zeros((2 * n, 6), np.float32)
    ids = np.zeros((2 * n,), np.int64)
    for i, rec in enumerate(ds.db):
        for d in (0, 1):
            j = 2 * i + d
            preds[j, :, :2] = rec["joints"][:, :2] + d * 2.0
            preds[j, :, 2] = rec["joints_vis"][:, 0] * (1.0 - 0.3 * d)
            boxes[j, 0:2] = rec["center"]
            boxes[j, 2:4] = rec["scale"]
            boxes[j, 4] = np.prod(rec["scale"] * 200.0)
            boxes[j, 5] = 1.0 - 0.1 * d
            ids[j] = rec["image_id"]
    cfg.TEST.SOFT_NMS = True
    _, ap_host = ds.evaluate(preds, boxes, ids)
    cfg.TEST.DEVICE_NMS = True
    _, ap_dev = ds.evaluate(preds, boxes, ids)
    assert ap_dev == ap_host
