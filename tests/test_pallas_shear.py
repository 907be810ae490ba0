"""Fused Pallas shear warp == the XLA shear warp, BIT-FOR-BIT under jit.

The kernel (ops/pallas/shear_warp.py) shares ``shear_prepare`` with the XLA
path and reproduces its selection/weighting math exactly (one-hot selection
matmuls are exact; weights/validity use the same formulas in the same
order). Debugging note, established empirically: comparing against the
EAGER op-by-op ``shear_warp_batch`` shows ~1e-3-scale differences — those
come from the eager baseline itself (each op compiled separately, so XLA
cannot contract `a*b+c` into FMAs), not from the kernel. Against
``jax.jit(shear_warp_batch)`` — the form every real caller uses, since
``augment_batch`` runs under jit — the kernel output is IDENTICAL, which is
what we assert here for both uint8 and float sources, across rotations,
flips, the transposed source frame (|m11| < |m10|), and non-power-of-two
sizes.
"""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rsgnet_tpu.ops.affine import get_affine_transform
from rsgnet_tpu.ops.pallas.shear_warp import shear_warp_pallas
from rsgnet_tpu.ops.shear_warp import shear_warp_batch
from rsgnet_tpu.ops.warp import affine_warp_batch


def _trans_batch(rots, size, out_size, rng, jitter=True):
    mats = []
    for r in rots:
        c = np.array([size / 2, size / 2], np.float32)
        if jitter:
            c = c + rng.uniform(-size / 8, size / 8, 2).astype(np.float32)
        s = np.array([size / 200.0 * rng.uniform(0.7, 1.4),
                      size / 200.0 * rng.uniform(0.7, 1.4)], np.float32)
        mats.append(get_affine_transform(c, s, r, out_size))
    return jnp.asarray(np.stack(mats), jnp.float32)


@pytest.mark.parametrize("dtype", ["uint8", "float32"])
def test_pallas_matches_xla_shear_all_angles(dtype):
    rng = np.random.RandomState(0)
    size, out_size = 96, (40, 56)       # non-128-multiples on purpose
    rots = [0.0, 17.0, -33.0, 45.0, 60.0, 90.0, -90.0, 120.0, 179.0]
    if dtype == "uint8":
        imgs = rng.randint(0, 255, (len(rots), size, size, 3), np.uint8)
    else:
        imgs = rng.uniform(-1, 2, (len(rots), size, size, 3)) \
            .astype(np.float32)
    trans = _trans_batch(rots, size, out_size, rng)
    jit_shear = jax.jit(functools.partial(shear_warp_batch,
                                          out_size=out_size))
    ref = np.asarray(jit_shear(jnp.asarray(imgs), trans))
    got = np.asarray(shear_warp_pallas(jnp.asarray(imgs), trans, out_size,
                                       interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_pallas_matches_gather_at_exact_angles():
    """rot 0 / 90 / flip match the gather oracle (the XLA shear path's own
    exactness guarantee, re-asserted through the kernel). Tolerance is the
    FMA-granularity bound, not interpolation error: the EAGER gather oracle
    is compiled op-by-op, so its fp32 weight arithmetic rounds differently
    from any whole-graph compilation (see module docstring); the kernel
    itself is bit-identical to the jitted shear path."""
    rng = np.random.RandomState(1)
    size, out_size = 64, (48, 64)
    imgs = rng.randint(0, 255, (3, size, size, 3), np.uint8)
    trans = _trans_batch([0.0, 90.0, -90.0], size, out_size, rng,
                         jitter=False)
    ref = np.asarray(affine_warp_batch(jnp.asarray(imgs), trans, out_size))
    got = np.asarray(shear_warp_pallas(jnp.asarray(imgs), trans, out_size,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_pallas_warp_config_path():
    """TRAIN.WARP="pallas" drives augment_batch end to end (CPU interpret)
    and matches the shear backend on the same key. Labels (targets) are
    bit-equal — they never touch the warp backend; the warped inputs agree
    to FMA granularity (the two backends sit at different compilation
    boundaries inside augment_batch, see module docstring), ~1e-4 on the
    imagenet-normalized scale."""
    import jax

    from rsgnet_tpu.config.defaults import Config
    from rsgnet_tpu.data.augment import augment_batch
    from rsgnet_tpu.data.skeletons import get_spec

    cfg = Config()
    cfg.MODEL.IMAGE_SIZE = (48, 64)
    cfg.MODEL.HEATMAP_SIZE = (12, 16)
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.ROT_FACTOR = 30.0
    cfg.DATASET.SCALE_FACTOR = 0.25
    cfg.DATASET.PROB_HALF_BODY = 0.0
    cfg.TRAIN.WARP = "pallas"
    rng = np.random.RandomState(2)
    n, src = 4, 96
    spec = get_spec("coco")
    images = rng.randint(0, 256, (n, src, src, 3)).astype(np.uint8)
    joints = rng.uniform(20, 70, (n, 17, 2)).astype(np.float32)
    vis = np.ones((n, 17), np.float32)
    centers = rng.uniform(40, 56, (n, 2)).astype(np.float32)
    scales = np.full((n, 2), 0.3, np.float32)
    key = jax.random.PRNGKey(0)
    a = augment_batch(key, images, joints, vis, centers, scales, cfg, spec)
    inputs = np.asarray(a.inputs)
    assert inputs.shape == (n, cfg.MODEL.IMAGE_SIZE[1],
                            cfg.MODEL.IMAGE_SIZE[0], 3)
    assert np.isfinite(inputs).all()

    cfg.TRAIN.WARP = "shear"
    b = augment_batch(key, images, joints, vis, centers, scales, cfg, spec)
    np.testing.assert_array_equal(np.asarray(a.target),
                                  np.asarray(b.target))
    np.testing.assert_allclose(inputs, np.asarray(b.inputs), atol=1e-4)

    # "auto" resolves per backend at trace time: shear off-TPU (this test
    # runs on the CPU backend), pallas on real TPU. Bit-equal to the
    # explicit choice it resolves to.
    cfg.TRAIN.WARP = "auto"
    c = augment_batch(key, images, joints, vis, centers, scales, cfg, spec)
    expect = b if jax.default_backend() != "tpu" else a
    np.testing.assert_array_equal(np.asarray(c.inputs),
                                  np.asarray(expect.inputs))

    cfg.TRAIN.WARP = "bogus"
    with pytest.raises(ValueError, match="TRAIN.WARP"):
        augment_batch(key, images, joints, vis, centers, scales, cfg, spec)
