"""Decode parity: argmax peaks, quarter-offset, DARK, vs. NumPy oracles."""
import numpy as np
import jax.numpy as jnp

from rsgnet_tpu.ops import decode


def _get_max_preds_oracle(batch_heatmaps_nkhw):
    """Reference get_max_preds re-derived in NumPy (NCHW layout)."""
    n, k, h, w = batch_heatmaps_nkhw.shape
    hm = batch_heatmaps_nkhw.reshape(n, k, -1)
    idx = np.argmax(hm, 2).reshape(n, k, 1)
    maxvals = np.amax(hm, 2).reshape(n, k, 1)
    preds = np.tile(idx, (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % w
    preds[:, :, 1] = np.floor(preds[:, :, 1] / w)
    pred_mask = np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    return preds * pred_mask, maxvals


def _quarter_oracle(hm_nkhw, coords):
    n, k, h, w = hm_nkhw.shape
    out = coords.copy()
    for i in range(n):
        for j in range(k):
            hmm = hm_nkhw[i][j]
            px = int(np.floor(coords[i][j][0] + 0.5))
            py = int(np.floor(coords[i][j][1] + 0.5))
            if 1 < px < w - 1 and 1 < py < h - 1:
                diff = np.array([hmm[py][px + 1] - hmm[py][px - 1],
                                 hmm[py + 1][px] - hmm[py - 1][px]])
                out[i][j] += np.sign(diff) * 0.25
    return out


def _rand_heatmaps(rng, n=3, k=5, h=64, w=48):
    hm = rng.uniform(0, 1, size=(n, k, h, w)).astype(np.float32)
    return hm


def test_get_max_preds_parity():
    rng = np.random.RandomState(0)
    hm = _rand_heatmaps(rng)
    want, wantv = _get_max_preds_oracle(hm)
    got, gotv = decode.get_max_preds_jax(jnp.asarray(np.transpose(hm, (0, 2, 3, 1))))
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_allclose(np.asarray(gotv), wantv, atol=1e-6)


def test_get_max_preds_negative_maxval_masked():
    hm = -np.ones((1, 1, 8, 8), np.float32)
    got, _ = decode.get_max_preds_jax(jnp.asarray(np.transpose(hm, (0, 2, 3, 1))))
    np.testing.assert_array_equal(np.asarray(got), np.zeros((1, 1, 2)))


def test_quarter_offset_parity():
    rng = np.random.RandomState(1)
    hm = _rand_heatmaps(rng, n=4, k=7)
    coords, _ = _get_max_preds_oracle(hm)
    want = _quarter_oracle(hm, coords)
    got = decode.quarter_offset_jax(
        jnp.asarray(np.transpose(hm, (0, 2, 3, 1))), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_dark_refines_toward_true_subpixel_peak():
    """A Gaussian blob at a fractional center: DARK must beat plain argmax."""
    h, w = 64, 48
    cx, cy, sigma = 20.3, 30.7, 2.0
    ys, xs = np.mgrid[0:h, 0:w]
    hm = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))
    hm = hm[None, :, :, None].astype(np.float32)
    coords, _ = decode.get_max_preds_jax(jnp.asarray(hm))
    refined = decode.dark_refine_jax(jnp.asarray(hm), coords, blur_kernel=11)
    refined = np.asarray(refined)[0, 0]
    err_argmax = np.hypot(*(np.asarray(coords)[0, 0] - [cx, cy]))
    err_dark = np.hypot(*(refined - [cx, cy]))
    assert err_dark < 0.1
    assert err_dark < err_argmax


def test_cv2_gaussian_kernel_normalized():
    k = decode._cv2_gaussian_kernel_1d(11)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[5] == k.max()


def test_get_final_preds_runs_and_maps_to_image():
    rng = np.random.RandomState(3)
    hm = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 48, 17)).astype(np.float32))
    center = jnp.asarray(np.array([[100.0, 100.0], [50.0, 80.0]], np.float32))
    scale = jnp.asarray(np.array([[1.0, 1.33], [0.8, 1.0]], np.float32))
    preds, maxvals = decode.get_final_preds_jax(hm, center, scale)
    assert preds.shape == (2, 17, 2)
    assert maxvals.shape == (2, 17, 1)
    preds_dark, _ = decode.get_final_preds_jax(hm, center, scale, use_dark=True)
    assert preds_dark.shape == (2, 17, 2)


def test_dark_respects_post_process_false():
    """Reference get_final_preds gates ALL sub-pixel refinement (DARK
    included) under TEST.POST_PROCESS; post_process=False must return raw
    argmax coordinates even with use_dark=True."""
    import numpy as np
    import jax.numpy as jnp
    from rsgnet_tpu.ops.decode import (get_final_preds_jax,
                                       get_max_preds_jax,
                                       transform_preds_jax)

    rng = np.random.RandomState(0)
    hm = jnp.asarray(rng.uniform(0, 1, (2, 16, 12, 4)).astype(np.float32))
    center = jnp.asarray(rng.uniform(80, 120, (2, 2)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.0, (2, 2)).astype(np.float32))
    raw, _ = get_max_preds_jax(hm)
    want = transform_preds_jax(raw, center, scale, (12, 16))
    got, _ = get_final_preds_jax(hm, center, scale, post_process=False,
                                 use_dark=True, blur_kernel=11)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
