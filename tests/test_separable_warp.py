"""Separable (MXU matmul) warp vs the gather sampler — exact-math parity for
rotation-free transforms, plus cv2 agreement."""
import jax.numpy as jnp
import numpy as np
import pytest

from rsgnet_tpu.ops.affine import get_affine_transform
from rsgnet_tpu.ops.warp import (affine_warp_batch, crop_and_normalize,
                                 separable_warp_batch)


def random_case(seed, n=3, src=(480, 640)):
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 255, (n, *src, 3), dtype=np.uint8)
    trans = np.stack([
        get_affine_transform(
            np.array([rng.uniform(150, 500), rng.uniform(100, 380)]),
            np.array([rng.uniform(0.6, 2.2)] * 2), 0.0, (192, 256))
        for _ in range(n)])
    return jnp.asarray(imgs), jnp.asarray(trans, jnp.float32)


@pytest.mark.parametrize("seed", range(5))
def test_matches_gather_sampler(seed):
    imgs, trans = random_case(seed)
    want = np.asarray(affine_warp_batch(imgs, trans, (192, 256)))
    got = np.asarray(separable_warp_batch(imgs, trans, (192, 256)))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_out_of_bounds_zero():
    """Crop hanging off the image edge: out-of-source region is 0."""
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(1, 255, (1, 480, 640, 3), dtype=np.uint8))
    trans = jnp.asarray(get_affine_transform(
        np.array([0.0, 0.0]), np.array([2.0, 2.0]), 0.0,
        (192, 256)))[None]
    got = np.asarray(separable_warp_batch(imgs, trans, (192, 256)))
    want = np.asarray(affine_warp_batch(imgs, trans, (192, 256)))
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert (got[0, :8, :8] == 0).any()       # top-left outside the source


def test_crop_and_normalize_separable_flag():
    imgs, trans = random_case(7)
    a = np.asarray(crop_and_normalize(imgs, trans, (192, 256)))
    b = np.asarray(crop_and_normalize(imgs, trans, (192, 256),
                                      separable=True))
    np.testing.assert_allclose(a, b, atol=5e-5)   # post-normalize scale


def test_upscaling_crop():
    """Tiny boxes upscale (step < 1): weights still correct."""
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 480, 640, 3), dtype=np.uint8))
    trans = np.stack([
        get_affine_transform(np.array([320.0, 240.0]),
                             np.array([0.2, 0.2667]), 0.0, (192, 256))
        for _ in range(2)])
    got = np.asarray(separable_warp_batch(imgs, jnp.asarray(trans),
                                          (192, 256)))
    want = np.asarray(affine_warp_batch(imgs, jnp.asarray(trans),
                                        (192, 256)))
    np.testing.assert_allclose(got, want, atol=5e-3)
