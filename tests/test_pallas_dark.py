"""Pallas fused DARK decode vs the jnp reference path (interpret mode on the
CPU backend; the same kernel compiles with Mosaic on real TPUs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rsgnet_tpu.ops.decode import dark_refine_jax, get_max_preds_jax
from rsgnet_tpu.ops.pallas.dark_decode import dark_decode_pallas


def make_heatmaps(n=2, h=64, w=48, k=5, seed=0, sigma=2.0):
    """Gaussian-ish peaks at random sub-pixel locations + noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    hm = np.zeros((n, h, w, k), np.float32)
    centers = np.zeros((n, k, 2), np.float32)
    for i in range(n):
        for j in range(k):
            cx = rng.uniform(4, w - 5)
            cy = rng.uniform(4, h - 5)
            centers[i, j] = (cx, cy)
            hm[i, :, :, j] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                                    / (2 * sigma ** 2))
            hm[i, :, :, j] += rng.uniform(0, 0.01, (h, w))
    return jnp.asarray(hm), centers


@pytest.mark.parametrize("blur", [3, 11])
def test_matches_jnp_dark_path(blur):
    hm, _ = make_heatmaps()
    coords_ref, maxv_ref = get_max_preds_jax(hm)
    coords_ref = dark_refine_jax(hm, coords_ref, blur_kernel=blur)
    coords, maxv = dark_decode_pallas(hm, blur_kernel=blur, interpret=True)
    np.testing.assert_allclose(np.asarray(coords), np.asarray(coords_ref),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(maxv), np.asarray(maxv_ref),
                               rtol=1e-6)


def test_recovers_subpixel_peaks():
    hm, centers = make_heatmaps(seed=3)
    coords, _ = dark_decode_pallas(hm, blur_kernel=11, interpret=True)
    err = np.abs(np.asarray(coords) - centers)
    assert err.max() < 0.35, err.max()          # sub-pixel accuracy


def test_zero_map_gives_zero_coords():
    hm = jnp.zeros((1, 64, 48, 3))
    coords, maxv = dark_decode_pallas(hm, interpret=True)
    assert float(jnp.max(jnp.abs(coords))) == 0.0
    assert float(maxv.max()) == 0.0


def test_border_peak_skips_newton():
    hm = np.zeros((1, 64, 48, 1), np.float32)
    hm[0, 1, 1, 0] = 1.0                         # too close to the border
    coords, _ = dark_decode_pallas(jnp.asarray(hm), interpret=True)
    np.testing.assert_array_equal(np.asarray(coords)[0, 0], [1.0, 1.0])
