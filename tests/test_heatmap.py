"""Parity: fused on-device Gaussian targets vs. the reference-style oracle."""
import numpy as np
import jax.numpy as jnp

from rsgnet_tpu.ops import heatmap


HEATMAP_SIZE = (48, 64)   # (w, h)
IMAGE_SIZE = (192, 256)
SIGMA = 2


def _rand_joints(rng, k=17):
    joints = np.zeros((k, 3), np.float32)
    joints[:, 0] = rng.uniform(-30, IMAGE_SIZE[0] + 30, size=k)
    joints[:, 1] = rng.uniform(-30, IMAGE_SIZE[1] + 30, size=k)
    vis = np.zeros((k, 3), np.float32)
    vis[:, 0] = vis[:, 1] = (rng.uniform(size=k) > 0.2).astype(np.float32)
    return joints, vis


def test_target_parity_random():
    rng = np.random.RandomState(0)
    for _ in range(5):
        joints, vis = _rand_joints(rng)
        t_np, w_np = heatmap.generate_target_np(
            joints, vis, HEATMAP_SIZE, IMAGE_SIZE, SIGMA)
        t_jx, w_jx = heatmap.generate_target_jax(
            jnp.asarray(joints[:, :2]), jnp.asarray(vis[:, 0]),
            HEATMAP_SIZE, IMAGE_SIZE, SIGMA)
        # jax output is HWK; oracle is KHW
        t_jx = np.moveaxis(np.asarray(t_jx), -1, 0)
        np.testing.assert_allclose(t_jx, t_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_jx), w_np[:, 0], atol=1e-6)


def test_target_batched_shapes():
    rng = np.random.RandomState(1)
    joints = rng.uniform(0, 192, size=(4, 17, 2)).astype(np.float32)
    vis = np.ones((4, 17), np.float32)
    t, w = heatmap.generate_target_jax(joints, vis, HEATMAP_SIZE, IMAGE_SIZE,
                                       SIGMA)
    assert t.shape == (4, 64, 48, 17)
    assert w.shape == (4, 17)


def test_target_peak_location():
    joints = np.array([[100.0, 120.0, 0.0]])
    vis = np.ones((1, 3), np.float32)
    t, w = heatmap.generate_target_jax(
        jnp.asarray(joints[:, :2]), jnp.asarray(vis[:, 0]),
        HEATMAP_SIZE, IMAGE_SIZE, SIGMA)
    t = np.asarray(t)[..., 0]
    # stride 4 -> mu = int(100/4+0.5), int(120/4+0.5) = (25, 30)
    assert t[30, 25] == 1.0
    assert w[0] == 1.0


def test_target_out_of_bounds_weight_zero():
    joints = np.array([[-100.0, -100.0, 0.0]])
    vis = np.ones((1, 3), np.float32)
    t, w = heatmap.generate_target_jax(
        jnp.asarray(joints[:, :2]), jnp.asarray(vis[:, 0]),
        HEATMAP_SIZE, IMAGE_SIZE, SIGMA)
    assert float(w[0]) == 0.0
    assert float(np.abs(np.asarray(t)).sum()) == 0.0


def test_joints_weight_applied():
    joints = np.array([[100.0, 120.0]])
    vis = np.ones((1,), np.float32)
    _, w = heatmap.generate_target_jax(
        joints, vis, HEATMAP_SIZE, IMAGE_SIZE, SIGMA,
        joints_weight=np.array([1.5], np.float32))
    np.testing.assert_allclose(np.asarray(w), [1.5])
