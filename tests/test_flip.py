"""Tests for flip utilities and left/right channel permutation."""
import numpy as np
import jax.numpy as jnp

from rsgnet_tpu.ops import flip
from rsgnet_tpu.data.skeletons import COCO, CROWDPOSE


def test_flip_perm_involution():
    for spec in (COCO, CROWDPOSE):
        perm = spec.flip_perm
        np.testing.assert_array_equal(perm[perm], np.arange(spec.num_joints))


def test_fliplr_joints_parity():
    rng = np.random.RandomState(0)
    joints = np.zeros((17, 3), np.float32)
    joints[:, :2] = rng.uniform(0, 192, size=(17, 2))
    vis = np.zeros((17, 3), np.float32)
    vis[:, 0] = vis[:, 1] = (rng.uniform(size=17) > 0.3)
    j_np, v_np = flip.fliplr_joints(joints, vis, 192, COCO.flip_pairs)
    j_jx, v_jx = flip.fliplr_joints_jax(
        jnp.asarray(joints[:, :2]), jnp.asarray(vis[:, :2]), 192,
        jnp.asarray(COCO.flip_perm))
    np.testing.assert_allclose(np.asarray(j_jx), j_np[:, :2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_jx), v_np[:, :2], atol=1e-6)


def test_flip_back_double_flip_identity():
    rng = np.random.RandomState(1)
    hm = jnp.asarray(rng.uniform(size=(2, 8, 6, 17)).astype(np.float32))
    perm = jnp.asarray(COCO.flip_perm)
    once = flip.flip_back_jax(hm, perm)
    twice = flip.flip_back_jax(once, perm)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(hm), atol=1e-6)


def test_flip_back_shift():
    hm = np.zeros((1, 1, 5, 1), np.float32)
    hm[0, 0, :, 0] = [1, 2, 3, 4, 5]
    out = flip.flip_back_jax(jnp.asarray(hm), jnp.asarray([0]), shift=True)
    # flip -> [5,4,3,2,1]; shift right keeps col0 -> [5,5,4,3,2]
    np.testing.assert_allclose(np.asarray(out)[0, 0, :, 0], [5, 5, 4, 3, 2])


def test_flip_back_swaps_channels():
    hm = np.zeros((1, 1, 2, 3), np.float32)
    hm[0, 0, 0, 1] = 7.0   # channel 1 (e.g. left eye)
    out = flip.flip_back_jax(jnp.asarray(hm), jnp.asarray([0, 2, 1]))
    assert np.asarray(out)[0, 0, 1, 2] == 7.0  # now channel 2, mirrored x
