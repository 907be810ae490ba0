"""Tests for the on-device affine warp vs. bilinear-sampling oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from rsgnet_tpu.ops import affine, warp


def _warp_affine_oracle(img, trans, out_size):
    """Direct NumPy re-derivation of cv2.warpAffine INTER_LINEAR + constant 0."""
    out_w, out_h = out_size
    m = np.vstack([trans, [0, 0, 1]])
    minv = np.linalg.inv(m)
    h, w = img.shape[:2]
    out = np.zeros((out_h, out_w) + img.shape[2:], np.float64)
    for y in range(out_h):
        for x in range(out_w):
            sx = minv[0, 0] * x + minv[0, 1] * y + minv[0, 2]
            sy = minv[1, 0] * x + minv[1, 1] * y + minv[1, 2]
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = 0.0
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    xi, yi = x0 + dx, y0 + dy
                    if 0 <= xi < w and 0 <= yi < h:
                        acc = acc + wy * wx * img[yi, xi]
            out[y, x] = acc
    return out


def test_warp_matches_oracle_random_transform():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, size=(40, 30, 3)).astype(np.float32)
    trans = affine.get_affine_transform([15.0, 20.0], [0.15, 0.2], 30.0,
                                        (24, 32))
    got = np.asarray(warp.affine_warp(jnp.asarray(img), jnp.asarray(trans),
                                      (24, 32)))
    want = _warp_affine_oracle(img, trans, (24, 32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_warp_identity():
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 1, size=(16, 12, 1)).astype(np.float32)
    ident = np.array([[1.0, 0, 0], [0, 1, 0]])
    got = np.asarray(warp.affine_warp(jnp.asarray(img), jnp.asarray(ident),
                                      (12, 16)))
    np.testing.assert_allclose(got, img, atol=1e-5)


def test_warp_affine_np_matches_oracle_and_device():
    """The host-side vectorized NumPy sampler (serving preprocessing / the
    no-cv2 host-crop path) agrees with the per-pixel oracle AND the device
    warp, including out-of-bounds zero borders."""
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 255, size=(40, 30, 3)).astype(np.float32)
    trans = affine.get_affine_transform([15.0, 20.0], [0.15, 0.2], 30.0,
                                        (24, 32))
    got = warp.warp_affine_np(img, trans, (24, 32))
    want = _warp_affine_oracle(img, trans, (24, 32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
    dev = np.asarray(warp.affine_warp(jnp.asarray(img), jnp.asarray(trans),
                                      (24, 32)))
    np.testing.assert_allclose(got, dev, rtol=1e-4, atol=1e-2)
    # a transform reaching far outside the source: borders are zeros
    far = affine.get_affine_transform([200.0, 200.0], [0.2, 0.25], 0.0,
                                      (16, 16))
    out = warp.warp_affine_np(img, far, (16, 16))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_host_affine_crop_uint8():
    """cv2 branch vs NumPy branch of host_affine_crop on uint8: equal to
    within 1 gray level (cv2's fixed-point arithmetic vs float rounding)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(50, 40, 3), dtype=np.uint8)
    trans = affine.get_affine_transform([20.0, 25.0], [0.2, 0.25], 0.0,
                                        (24, 32))
    via_cv2 = warp.host_affine_crop(img, trans, (24, 32))
    assert via_cv2.dtype == np.uint8 and via_cv2.shape == (32, 24, 3)
    via_np = np.clip(np.rint(warp.warp_affine_np(img, trans, (24, 32))),
                     0, 255).astype(np.uint8)
    assert np.abs(via_cv2.astype(int) - via_np.astype(int)).max() <= 1


def test_invert_affine():
    trans = affine.get_affine_transform([50.0, 60.0], [0.4, 0.5], 15.0,
                                        (48, 64))
    inv = np.asarray(warp.invert_affine(jnp.asarray(trans, jnp.float32)))
    ref = affine.get_affine_transform([50.0, 60.0], [0.4, 0.5], 15.0,
                                      (48, 64), inv=1)
    np.testing.assert_allclose(inv, ref, rtol=1e-3, atol=1e-3)


def test_crop_and_normalize_flip():
    rng = np.random.RandomState(2)
    imgs = rng.uniform(0, 255, size=(2, 20, 20, 3)).astype(np.float32)
    ident = np.tile(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    out = np.asarray(warp.crop_and_normalize(
        jnp.asarray(imgs), jnp.asarray(ident), (20, 20),
        flip=jnp.asarray([False, True])))
    want0 = (imgs[0] / 255.0 - warp.IMAGENET_MEAN) / warp.IMAGENET_STD
    want1 = (imgs[1, :, ::-1] / 255.0 - warp.IMAGENET_MEAN) / warp.IMAGENET_STD
    np.testing.assert_allclose(out[0], want0, atol=1e-5)
    np.testing.assert_allclose(out[1], want1, atol=1e-5)
