"""Parity tests for the affine-geometry core (SURVEY.md §2.13 contract)."""
import numpy as np
import pytest

from rsgnet_tpu.ops import affine


def _random_cases(n=32, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        center = rng.uniform(50, 500, size=2).astype(np.float32)
        scale = rng.uniform(0.5, 3.0, size=2).astype(np.float32)
        rot = float(rng.uniform(-45, 45))
        yield center, scale, rot


def test_affine_roundtrip_identity():
    """fwd(inv(p)) == p for many random transforms."""
    for center, scale, rot in _random_cases():
        t = affine.get_affine_transform(center, scale, rot, (192, 256))
        t_inv = affine.get_affine_transform(center, scale, rot, (192, 256), inv=1)
        pts = np.random.RandomState(1).uniform(0, 192, size=(10, 2))
        for p in pts:
            q = affine.affine_transform(p, t)
            back = affine.affine_transform(q, t_inv)
            np.testing.assert_allclose(back, p, atol=1e-3)


def test_affine_maps_center_to_output_center():
    for center, scale, rot in _random_cases():
        t = affine.get_affine_transform(center, scale, rot, (192, 256))
        out = affine.affine_transform(center, t)
        np.testing.assert_allclose(out, [96.0, 128.0], atol=1e-3)


def test_affine_no_rotation_is_scale_translation():
    """rot=0: pure anisotropic scale + translation, x maps by w/(scale*200)."""
    center = np.array([100.0, 80.0])
    scale = np.array([1.0, 1.5])
    t = affine.get_affine_transform(center, scale, 0, (192, 256))
    # NOTE the HRNet construction scales BOTH axes by dst_w / (scale_x*200)
    # (the y axis uses the same src_w-derived basis) — verify that quirk.
    p = affine.affine_transform(center + np.array([10.0, 0.0]), t)
    np.testing.assert_allclose(p - [96, 128], [10 * 192.0 / 200.0, 0], atol=1e-3)
    p = affine.affine_transform(center + np.array([0.0, 10.0]), t)
    np.testing.assert_allclose(p - [96, 128], [0, 10 * 192.0 / 200.0], atol=1e-3)


def test_jax_matches_numpy_transform():
    import jax.numpy as jnp
    centers, scales, rots = [], [], []
    mats = []
    for center, scale, rot in _random_cases(16):
        mats.append(affine.get_affine_transform(center, scale, rot, (192, 256)))
        centers.append(center)
        scales.append(scale)
        rots.append(rot)
    jmats = affine.get_affine_transform_jax(
        jnp.asarray(np.stack(centers)), jnp.asarray(np.stack(scales)),
        jnp.asarray(np.array(rots)), (192, 256))
    np.testing.assert_allclose(np.asarray(jmats), np.stack(mats), atol=2e-3)


def test_jax_matches_numpy_inverse():
    import jax.numpy as jnp
    for center, scale, rot in _random_cases(8, seed=3):
        m = affine.get_affine_transform(center, scale, rot, (48, 64), inv=1)
        jm = affine.get_affine_transform_jax(
            jnp.asarray(center), jnp.asarray(scale), jnp.asarray(rot),
            (48, 64), inv=True)
        np.testing.assert_allclose(np.asarray(jm), m, rtol=1e-4, atol=1e-2)


def test_transform_preds_parity():
    import jax.numpy as jnp
    rng = np.random.RandomState(7)
    coords = rng.uniform(0, 48, size=(17, 2)).astype(np.float32)
    center = np.array([123.0, 210.0], np.float32)
    scale = np.array([1.2, 1.6], np.float32)
    ref = affine.transform_preds(coords, center, scale, (48, 64))
    jx = affine.transform_preds_jax(
        jnp.asarray(coords)[None], jnp.asarray(center)[None],
        jnp.asarray(scale)[None], (48, 64))[0]
    np.testing.assert_allclose(np.asarray(jx), ref, atol=5e-3)


def test_box_to_center_scale():
    center, scale = affine.box_to_center_scale([10, 20, 100, 50], 192.0 / 256.0)
    np.testing.assert_allclose(center, [60.0, 45.0])
    # w=100 > a*h=37.5 -> h = 100/0.75; scale = [100, 133.33]/200 * 1.25
    np.testing.assert_allclose(
        scale, np.array([100.0, 100.0 / (192.0 / 256.0)]) / 200.0 * 1.25,
        rtol=1e-5)
