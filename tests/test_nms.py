"""OKS-NMS parity: device kernels vs. reference-semantics NumPy oracle."""
import numpy as np
import jax.numpy as jnp

from rsgnet_tpu.ops import nms
from rsgnet_tpu.data.skeletons import COCO


def _rand_db(rng, m=12, k=17, clusters=3):
    """Poses in a few clusters so NMS actually suppresses."""
    db = []
    centers = rng.uniform(100, 400, size=(clusters, 2))
    for i in range(m):
        c = centers[i % clusters]
        kpts = np.zeros((k, 3), np.float32)
        kpts[:, :2] = c + rng.normal(scale=8.0, size=(k, 2))
        kpts[:, 2] = rng.uniform(0.3, 1.0, size=k)
        db.append({
            "keypoints": kpts,
            "score": float(rng.uniform(0.1, 1.0)),
            "area": float(rng.uniform(3000, 9000)),
        })
    return db


def test_oks_matrix_matches_oracle():
    rng = np.random.RandomState(0)
    db = _rand_db(rng)
    kpts = np.stack([d["keypoints"] for d in db])
    areas = np.array([d["area"] for d in db])
    got = np.asarray(nms.oks_matrix_jax(kpts, jnp.asarray(areas, jnp.float32),
                                        COCO.sigmas))
    for i in range(len(db)):
        want = nms.oks_iou(kpts[i].flatten(),
                           kpts.reshape(len(db), -1), areas[i], areas,
                           COCO.sigmas)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_oks_nms_parity():
    for seed in range(5):
        rng = np.random.RandomState(seed)
        db = _rand_db(rng)
        want = sorted(nms.oks_nms_np(db, 0.9, COCO.sigmas))
        kpts = np.stack([d["keypoints"] for d in db])
        scores = np.array([d["score"] for d in db], np.float32)
        areas = np.array([d["area"] for d in db], np.float32)
        keep = np.asarray(nms.oks_nms_jax(kpts, scores, areas, COCO.sigmas, 0.9))
        got = sorted(np.nonzero(keep)[0].tolist())
        assert got == want, (seed, got, want)


def test_oks_nms_padding_mask():
    rng = np.random.RandomState(1)
    db = _rand_db(rng, m=6)
    kpts = np.stack([d["keypoints"] for d in db])
    scores = np.array([d["score"] for d in db], np.float32)
    areas = np.array([d["area"] for d in db], np.float32)
    # pad with garbage rows marked invalid
    pad = 4
    kpts_p = np.concatenate([kpts, np.zeros((pad, 17, 3), np.float32)])
    scores_p = np.concatenate([scores, np.full((pad,), 2.0, np.float32)])
    areas_p = np.concatenate([areas, np.ones((pad,), np.float32)])
    valid = np.concatenate([np.ones(6, bool), np.zeros(pad, bool)])
    keep = np.asarray(nms.oks_nms_jax(kpts_p, scores_p, areas_p, COCO.sigmas,
                                      0.9, valid=jnp.asarray(valid)))
    assert not keep[6:].any()
    want = sorted(nms.oks_nms_np(db, 0.9, COCO.sigmas))
    assert sorted(np.nonzero(keep[:6])[0].tolist()) == want


def test_soft_oks_nms_selects_highest_first():
    rng = np.random.RandomState(2)
    db = _rand_db(rng, m=8)
    kpts = np.stack([d["keypoints"] for d in db])
    scores = np.array([d["score"] for d in db], np.float32)
    areas = np.array([d["area"] for d in db], np.float32)
    keep, new_scores = nms.soft_oks_nms_jax(kpts, scores, areas, COCO.sigmas,
                                            0.9, max_dets=8)
    keep = np.asarray(keep)
    assert keep[np.argmax(scores)]
    # every selected score is <= its original (decay only reduces)
    assert np.all(np.asarray(new_scores)[keep] <= scores[keep] + 1e-6)


def test_oks_identical_poses():
    kpts = np.zeros((2, 17, 3), np.float32)
    kpts[:, :, :2] = 50.0
    kpts[:, :, 2] = 1.0
    areas = np.array([5000.0, 5000.0], np.float32)
    m = np.asarray(nms.oks_matrix_jax(kpts, areas, COCO.sigmas))
    np.testing.assert_allclose(m, 1.0, atol=1e-5)
    keep = np.asarray(nms.oks_nms_jax(
        kpts, np.array([0.9, 0.8], np.float32), areas, COCO.sigmas, 0.9))
    np.testing.assert_array_equal(keep, [True, False])


def test_soft_oks_nms_decayed_score_parity():
    """Device soft-NMS keep set + decayed selection scores match the NumPy
    oracle (same gaussian decay, same greedy order)."""
    for seed in range(5):
        rng = np.random.RandomState(seed)
        db = _rand_db(rng, m=10)
        want_keep, want_scores = nms.soft_oks_nms_np(db, 0.9, COCO.sigmas,
                                                     max_dets=20)
        kpts = np.stack([d["keypoints"] for d in db])
        scores = np.array([d["score"] for d in db], np.float32)
        areas = np.array([d["area"] for d in db], np.float32)
        keep, new_scores = nms.soft_oks_nms_jax(kpts, scores, areas,
                                                COCO.sigmas, 0.9, max_dets=20)
        keep = np.asarray(keep)
        new_scores = np.asarray(new_scores)
        assert sorted(np.nonzero(keep)[0].tolist()) == sorted(want_keep), seed
        oracle = dict(zip(want_keep, want_scores))
        for idx in want_keep:
            np.testing.assert_allclose(new_scores[idx], oracle[idx],
                                       rtol=1e-4, atol=1e-5)


def test_soft_oks_nms_padded_rounds_keep_sentinels_dead():
    """Regression (round-4 review): with more rounds than live instances
    the per-round gaussian decay used to drag the -1e30 dead-slot sentinel
    toward 0 until a spent slot passed the liveness test again and its
    returned decayed score was clobbered with ~-1e29 garbage. Two heavily
    overlapping poses padded to m=20 with max_dets=20 reproduce it."""
    rng = np.random.RandomState(3)
    base = rng.uniform(60, 140, (17, 3)).astype(np.float32)
    base[:, 2] = 0.9
    near = base.copy()
    near[:, :2] += 0.5                              # OKS ~0.98 overlap
    kpts = np.zeros((20, 17, 3), np.float32)
    kpts[0], kpts[1] = base, near
    scores = np.zeros((20,), np.float32)
    scores[0], scores[1] = 0.9, 0.8
    areas = np.ones((20,), np.float32)
    areas[:2] = 180.0 * 180.0
    valid = np.zeros((20,), bool)
    valid[:2] = True
    keep, new_scores = nms.soft_oks_nms_jax(
        kpts, scores, areas, COCO.sigmas, 0.9,
        valid=jnp.asarray(valid), max_dets=20)
    keep, new_scores = np.asarray(keep), np.asarray(new_scores)
    db = [{"keypoints": kpts[i], "score": scores[i], "area": areas[i]}
          for i in range(2)]
    want_keep, want_scores = nms.soft_oks_nms_np(db, 0.9, COCO.sigmas,
                                                 max_dets=20)
    assert sorted(np.nonzero(keep[:2])[0].tolist()) == sorted(want_keep)
    assert not keep[2:].any()                       # padding never kept
    oracle = dict(zip(want_keep, want_scores))
    for idx in want_keep:
        np.testing.assert_allclose(new_scores[idx], oracle[idx],
                                   rtol=1e-4, atol=1e-5)


def test_batched_soft_oks_nms_matches_per_image():
    """Whole-dataset batched soft-NMS == per-image oracle on ragged groups."""
    rng = np.random.RandomState(7)
    groups = [_rand_db(rng, m=m) for m in (3, 9, 1, 6)]
    kp_l = [np.stack([d["keypoints"] for d in g]) for g in groups]
    sc_l = [np.array([d["score"] for d in g], np.float32) for g in groups]
    ar_l = [np.array([d["area"] for d in g], np.float32) for g in groups]
    out = nms.batched_soft_oks_nms_jax(kp_l, sc_l, ar_l, COCO.sigmas, 0.9)
    for g, (idx, dec) in zip(groups, out):
        want_keep, want_scores = nms.soft_oks_nms_np(g, 0.9, COCO.sigmas)
        assert sorted(idx.tolist()) == sorted(want_keep)
        oracle = dict(zip(want_keep, want_scores))
        for i, s in zip(idx, dec):
            np.testing.assert_allclose(s, oracle[int(i)], rtol=1e-4,
                                       atol=1e-5)


def test_device_nms_tie_break_matches_oracle():
    """Equal-score duplicates: NumPy's argsort()[::-1] keeps the HIGHER
    index; the device kernel must agree (stable-sort tie-break)."""
    import numpy as np
    import jax.numpy as jnp
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.ops.nms import oks_nms_jax, oks_nms_np

    spec = get_spec("coco")
    rng = np.random.RandomState(0)
    kp = rng.uniform(50, 150, (1, 17, 3)).astype(np.float32)
    kp[..., 2] = 0.9
    kpts = np.concatenate([kp, kp, kp], axis=0)       # 3 identical instances
    scores = np.array([0.7, 0.7, 0.7], np.float32)    # all tied
    areas = np.full((3,), 900.0, np.float32)
    db = [{"keypoints": kpts[i], "score": scores[i], "area": areas[i]}
          for i in range(3)]
    keep_np = oks_nms_np(db, 0.9, spec.sigmas)
    keep_jax = np.where(np.asarray(oks_nms_jax(
        jnp.asarray(kpts), jnp.asarray(scores), jnp.asarray(areas),
        spec.sigmas, 0.9)))[0]
    assert sorted(keep_np) == sorted(keep_jax.tolist()), (keep_np, keep_jax)
