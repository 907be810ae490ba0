"""Roll-decomposed two-pass warp (ops/shear_warp.py) vs the gather oracle.

Contract (module docstring): exact at rot 0 / +-90 / flips; at intermediate
angles the MAP is exact but the footprint is a sheared bilinear — close on
smooth images, with the difference concentrated at the zero-border feather.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsgnet_tpu.ops.affine import get_affine_transform_jax
from rsgnet_tpu.ops.shear_warp import shear_warp_batch
from rsgnet_tpu.ops.warp import affine_warp_batch

OUT = (48, 64)  # (w, h)


def _trans(centers, scales, rots, out=OUT):
    return jax.vmap(lambda c, s, r: get_affine_transform_jax(c, s, r, out))(
        jnp.asarray(centers, jnp.float32), jnp.asarray(scales, jnp.float32),
        jnp.asarray(rots, jnp.float32))


def _smooth_images(rng, n, s):
    """Blurred noise — natural-image-like smoothness without scipy."""
    imgs = rng.randint(0, 256, (n, s, s, 3)).astype(np.float32)
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    for axis in (1, 2):
        view = np.moveaxis(imgs, axis, -1)
        out = np.zeros_like(view)
        for i, w in enumerate(k):
            out += w * np.roll(view, i - 2, axis=-1)
        imgs = np.moveaxis(out, -1, axis)
    return imgs.clip(0, 255)


def test_exact_at_rot0_and_90():
    rng = np.random.RandomState(0)
    s = 96
    imgs = rng.randint(0, 256, (8, s, s, 3)).astype(np.uint8)
    centers = rng.uniform(20, 76, (8, 2))
    scales = np.stack([rng.uniform(0.15, 0.45, 8) * 0.75,
                       rng.uniform(0.15, 0.45, 8)], -1)
    for rot in (0.0, 90.0, -90.0):
        t = _trans(centers, scales, np.full(8, rot))
        ref = np.asarray(affine_warp_batch(jnp.asarray(imgs), t, OUT))
        got = np.asarray(shear_warp_batch(jnp.asarray(imgs), t, OUT))
        np.testing.assert_allclose(got, ref, atol=1e-2, err_msg=f"rot={rot}")


def test_exact_with_flip_composed():
    """Flips fold into the matrix exactly as data/augment.py composes them."""
    rng = np.random.RandomState(1)
    s = 96
    imgs = rng.randint(0, 256, (6, s, s, 3)).astype(np.uint8)
    centers = rng.uniform(30, 66, (6, 2))
    scales = np.stack([rng.uniform(0.2, 0.4, 6) * 0.75,
                       rng.uniform(0.2, 0.4, 6)], -1)
    t = _trans(centers, scales, np.zeros(6))
    f_col0 = -t[:, :, 0]
    f_col2 = t[:, :, 0] * (s - 1.0) + t[:, :, 2]
    tf = jnp.stack([f_col0, t[:, :, 1], f_col2], axis=-1)
    ref = np.asarray(affine_warp_batch(jnp.asarray(imgs), tf, OUT))
    got = np.asarray(shear_warp_batch(jnp.asarray(imgs), tf, OUT))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_close_on_smooth_images_all_angles():
    rng = np.random.RandomState(2)
    s = 96
    n = 10
    imgs = _smooth_images(rng, n, s)
    centers = rng.uniform(34, 62, (n, 2))
    scales = np.stack([rng.uniform(0.2, 0.35, n) * 0.75,
                       rng.uniform(0.2, 0.35, n)], -1)
    rots = np.array([5., 15., -30., 45., 60., -75., 89., -45., 33., -12.])
    t = _trans(centers, scales, rots)
    ref = np.asarray(affine_warp_batch(jnp.asarray(imgs), t, OUT))
    got = np.asarray(shear_warp_batch(jnp.asarray(imgs), t, OUT))
    err = np.abs(ref - got).reshape(n, -1)
    # map must be exact: errors are filter-footprint only — small in the mean
    # (thresholds calibrated on this fixture; regression guards, 0-255 scale)
    assert err.mean() < 1.0, err.mean()
    assert (err.mean(1) < 2.0).all(), err.mean(1)
    assert (err.max(1) < 15.0).all(), err.max(1)


def test_border_zero_outside_source():
    """Crops hanging off the canvas: outside must be exactly 0 (both impls)."""
    rng = np.random.RandomState(3)
    s = 64
    imgs = np.full((4, s, s, 3), 200, np.uint8)
    centers = np.array([[2.0, 2.0], [62.0, 62.0], [2.0, 62.0], [32.0, 2.0]])
    scales = np.full((4, 2), 0.4)
    rots = np.array([0.0, 25.0, -50.0, 70.0])
    t = _trans(centers, scales, rots)
    ref = np.asarray(affine_warp_batch(jnp.asarray(imgs), t, OUT))
    got = np.asarray(shear_warp_batch(jnp.asarray(imgs), t, OUT))
    # fully-outside pixels agree except the sheared border feather, which may
    # extend ~|B| px along the shear direction (documented footprint effect)
    assert ((ref == 0) == (np.abs(got) < 1e-5)).mean() > 0.99
    leaked = (np.abs(got) > 1e-3) & (ref == 0)
    assert leaked.mean() < 0.01, leaked.mean()
    # leaked values are border blends, bounded by the source intensity —
    # circular-roll wraparound of bright content would exceed this
    assert got.max() <= 200.0 + 1e-3 and got.min() >= -1e-3


def test_uint8_and_float32_sources_agree():
    rng = np.random.RandomState(4)
    s = 96
    imgs = rng.randint(0, 256, (5, s, s, 3)).astype(np.uint8)
    centers = rng.uniform(30, 66, (5, 2))
    scales = np.stack([rng.uniform(0.2, 0.4, 5) * 0.75,
                       rng.uniform(0.2, 0.4, 5)], -1)
    rots = rng.uniform(-80, 80, 5)
    t = _trans(centers, scales, rots)
    a = np.asarray(shear_warp_batch(jnp.asarray(imgs), t, OUT))
    b = np.asarray(shear_warp_batch(jnp.asarray(imgs, jnp.float32), t, OUT))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_wide_integer_sources_not_quantized():
    """int32 sources with values > 255 must NOT take the bf16 selection
    path (only 8-bit types are bf16-exact)."""
    rng = np.random.RandomState(6)
    s = 96
    imgs32 = rng.randint(0, 100000, (3, s, s, 1)).astype(np.int32)
    centers = rng.uniform(30, 66, (3, 2))
    scales = np.stack([rng.uniform(0.2, 0.4, 3) * 0.75,
                       rng.uniform(0.2, 0.4, 3)], -1)
    t = _trans(centers, scales, rng.uniform(-60, 60, 3))
    a = np.asarray(shear_warp_batch(jnp.asarray(imgs32), t, OUT))
    b = np.asarray(shear_warp_batch(jnp.asarray(imgs32, jnp.float32), t, OUT))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-2)


def test_non_square_source_rejected():
    imgs = jnp.zeros((2, 64, 96, 3), jnp.uint8)
    t = _trans(np.full((2, 2), 32.0), np.full((2, 2), 0.3), np.zeros(2))
    with pytest.raises(AssertionError):
        shear_warp_batch(imgs, t, OUT)


def test_fuzz_many_random_affines():
    """Property fuzz over a wide affine distribution (scales, anisotropy,
    rotations incl. the transposed-frame regime, off-canvas centers):
    outputs are finite, bounded by the source range, close to the gather
    in the mean, and EXACT wherever rotation is zero."""
    rng = np.random.RandomState(7)
    s = 64
    n = 48
    imgs = _smooth_images(rng, n, s)
    centers = rng.uniform(-10, 74, (n, 2))
    scales = np.stack([rng.uniform(0.1, 0.6, n) * rng.uniform(0.5, 1.5, n),
                       rng.uniform(0.1, 0.6, n)], -1)
    rots = np.where(rng.uniform(size=n) < 0.3, 0.0,
                    rng.uniform(-90, 90, n)).astype(np.float32)
    t = _trans(centers, scales, rots, out=(32, 48))
    ref = np.asarray(affine_warp_batch(jnp.asarray(imgs), t, (32, 48)))
    got = np.asarray(shear_warp_batch(jnp.asarray(imgs), t, (32, 48)))
    assert np.isfinite(got).all()
    assert got.min() >= -1e-3 and got.max() <= imgs.max() + 1e-2
    err = np.abs(ref - got).reshape(n, -1)
    assert err.mean() < 1.5, err.mean()
    zero_rot = rots == 0.0
    assert zero_rot.sum() > 5
    np.testing.assert_allclose(got[zero_rot], ref[zero_rot], atol=1e-2)


def test_augment_batch_uses_shear_by_default():
    """The default TRAIN.WARP='auto' resolves to the roll warp off-TPU;
    'gather' falls back; with rotation+flip off both agree exactly."""
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data.augment import augment_batch
    from rsgnet_tpu.data.skeletons import get_spec

    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.ROT_FACTOR = 0.0
    cfg.DATASET.SCALE_FACTOR = 0.25
    cfg.DATASET.PROB_HALF_BODY = 0.0
    assert cfg.TRAIN.WARP == "auto"
    cfg.TRAIN.WARP = "shear"
    rng = np.random.RandomState(5)
    n, s = 4, 128
    images = rng.randint(0, 256, (n, s, s, 3)).astype(np.uint8)
    joints = rng.uniform(20, 100, (n, 17, 2)).astype(np.float32)
    vis = np.ones((n, 17), np.float32)
    centers = rng.uniform(50, 78, (n, 2)).astype(np.float32)
    scales = np.full((n, 2), 0.35, np.float32)
    spec = get_spec("coco")
    key = jax.random.PRNGKey(0)
    a = augment_batch(key, images, joints, vis, centers, scales, cfg, spec)
    cfg.TRAIN.WARP = "gather"
    b = augment_batch(key, images, joints, vis, centers, scales, cfg, spec)
    np.testing.assert_allclose(np.asarray(a.inputs), np.asarray(b.inputs),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.target), np.asarray(b.target),
                               atol=1e-6)
