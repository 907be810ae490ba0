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


def test_duplicate_suppression():
    db = random_db(1, seed=0)
    db[0]["score"] = 0.9
    dup = {"keypoints": db[0]["keypoints"] + 0.5, "score": 0.5,
           "area": db[0]["area"]}
    db.append(dup)
    assert oks_nms_cpp(db, 0.9, SIGMAS) == [0]
