"""Direct parity against OpenCV — the reference's actual geometry backend
(SURVEY.md §7 hard-part 1). These pin our device kernels to the exact cv2
semantics the reference pipeline uses: getAffineTransform's 3-point solve,
warpAffine INTER_LINEAR sampling, and the DARK Gaussian modulation blur.

cv2.warpAffine quantizes source coordinates to 1/32 px internally
(INTER_BITS=5); tolerances below account only for that quantization.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from rsgnet_tpu.ops.affine import get_affine_transform  # noqa: E402
from rsgnet_tpu.ops.decode import dark_gaussian_blur_jax  # noqa: E402
from rsgnet_tpu.ops.warp import affine_warp  # noqa: E402


def random_cs(rng, w=640, h=480):
    center = np.array([rng.uniform(w * 0.3, w * 0.7),
                       rng.uniform(h * 0.3, h * 0.7)], np.float32)
    scale = np.array([rng.uniform(0.5, 2.0)] * 2, np.float32)
    rot = rng.uniform(-45, 45)
    return center, scale, rot


@pytest.mark.parametrize("seed", range(6))
def test_affine_matrix_matches_cv2_three_point_solve(seed):
    """Our matrix solve == cv2.getAffineTransform on the same 3 points."""
    rng = np.random.RandomState(seed)
    src = rng.uniform(0, 200, (3, 2)).astype(np.float32)
    dst = rng.uniform(0, 200, (3, 2)).astype(np.float32)
    want = cv2.getAffineTransform(src, dst)
    from rsgnet_tpu.ops.affine import _solve_affine
    got = _solve_affine(src, dst)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("rot", [0.0, 30.0, -45.0])
def test_device_warp_matches_cv2_warpaffine(seed, rot):
    """Device bilinear warp vs cv2.warpAffine on a smooth float image."""
    rng = np.random.RandomState(seed)
    # smooth image: cv2's 1/32-px coordinate quantization then only moves
    # values by (gradient * 1/32); keep gradients bounded for a tight bound
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    img = np.stack([np.sin(xx / 30) * 100 + 120,
                    np.cos(yy / 40) * 100 + 120,
                    ((xx + yy) / 8) % 255], -1).astype(np.float32)
    center, scale, _ = random_cs(rng)
    trans = get_affine_transform(center, scale, rot, (192, 256))
    want = cv2.warpAffine(img, trans, (192, 256), flags=cv2.INTER_LINEAR)
    got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(trans),
                                 (192, 256)))
    # interior only: border pixels differ by border-handling half-taps
    d = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
    assert d.max() < 1.5, d.max()
    assert d.mean() < 0.2, d.mean()


def test_device_warp_matches_cv2_on_noise():
    """Random-noise image: mean agreement within quantization noise."""
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
    center, scale, rot = random_cs(rng)
    trans = get_affine_transform(center, scale, rot, (192, 256))
    want = cv2.warpAffine(img, trans, (192, 256), flags=cv2.INTER_LINEAR)
    got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(trans),
                                 (192, 256)))
    d = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
    assert d.mean() < 3.0, d.mean()          # 255-range noise, 1/32-px coords


import pytest


@pytest.mark.parametrize("kernel", [3, 5, 7, 11, 17])
def test_dark_blur_matches_reference_cv2_procedure(kernel):
    """dark_gaussian_blur_jax == the DARK paper's zero-pad + cv2.GaussianBlur
    + max-rescale procedure. Small kernels matter: cv2 substitutes FIXED
    binomial tables for ksize 1/3/5/7 (the sigma formula only applies from
    9 up), and DARK configs commonly use BLUR_KERNEL in that range."""
    rng = np.random.RandomState(0)
    n, h, w, k = 2, 64, 48, 5
    hm = rng.uniform(0, 1, (n, k, h, w)).astype(np.float32)

    want = hm.copy()
    border = (kernel - 1) // 2
    for i in range(n):
        for j in range(k):
            origin_max = np.max(want[i, j])
            dr = np.zeros((h + 2 * border, w + 2 * border), np.float32)
            dr[border:-border, border:-border] = want[i, j].copy()
            dr = cv2.GaussianBlur(dr, (kernel, kernel), 0)
            want[i, j] = dr[border:-border, border:-border].copy()
            want[i, j] *= origin_max / np.max(want[i, j])

    got = np.asarray(dark_gaussian_blur_jax(
        jnp.asarray(np.transpose(hm, (0, 2, 3, 1))), kernel))
    got = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
