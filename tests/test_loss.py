"""Loss + PCK parity tests (SURVEY.md §2.16, §2.18)."""
import numpy as np
import jax.numpy as jnp

from rsgnet_tpu.core.loss import joints_mse_loss, joints_ohkm_mse_loss
from rsgnet_tpu.core.evaluate import accuracy_jax


def _mse_oracle(pred_nkhw, gt_nkhw, tw):
    """Reference JointsMSELoss re-derived in NumPy."""
    n, k, h, w = pred_nkhw.shape
    pred = pred_nkhw.reshape(n, k, -1)
    gt = gt_nkhw.reshape(n, k, -1)
    loss = 0.0
    for j in range(k):
        d = pred[:, j] * tw[:, j:j+1] - gt[:, j] * tw[:, j:j+1]
        loss += 0.5 * np.mean(d ** 2)
    return loss / k


def test_mse_parity():
    rng = np.random.RandomState(0)
    pred = rng.randn(4, 17, 8, 6).astype(np.float32)
    gt = rng.rand(4, 17, 8, 6).astype(np.float32)
    tw = (rng.rand(4, 17) > 0.3).astype(np.float32)
    want = _mse_oracle(pred, gt, tw)
    got = joints_mse_loss(jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
                          jnp.asarray(np.transpose(gt, (0, 2, 3, 1))),
                          jnp.asarray(tw))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_mse_no_target_weight():
    rng = np.random.RandomState(1)
    pred = rng.randn(2, 3, 4, 4).astype(np.float32)
    gt = rng.rand(2, 3, 4, 4).astype(np.float32)
    want = _mse_oracle(pred, gt, np.ones((2, 3), np.float32))
    got = joints_mse_loss(jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
                          jnp.asarray(np.transpose(gt, (0, 2, 3, 1))),
                          None, use_target_weight=False)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_ohkm_selects_hardest():
    """With topk=1, only the worst joint contributes."""
    pred = np.zeros((1, 3, 4, 4), np.float32)
    gt = np.zeros((1, 3, 4, 4), np.float32)
    gt[0, 2] = 1.0   # joint 2 is the hard one
    tw = np.ones((1, 3), np.float32)
    got = joints_ohkm_mse_loss(
        jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(gt, (0, 2, 3, 1))), jnp.asarray(tw), topk=1)
    np.testing.assert_allclose(float(got), 0.5 * 1.0, rtol=1e-6)


def test_zero_loss_when_equal():
    rng = np.random.RandomState(2)
    x = rng.rand(2, 8, 6, 5).astype(np.float32)
    got = joints_mse_loss(jnp.asarray(x), jnp.asarray(x),
                          jnp.ones((2, 5), jnp.float32))
    assert float(got) == 0.0


def test_pck_accuracy_perfect_and_off():
    """Identical heatmaps -> acc 1; far-off preds -> acc 0."""
    rng = np.random.RandomState(3)
    gt = np.zeros((2, 32, 24, 4), np.float32)
    for n in range(2):
        for j in range(4):
            gt[n, 10 + n, 8 + j, j] = 1.0
    per, avg, cnt, _ = accuracy_jax(jnp.asarray(gt), jnp.asarray(gt))
    assert float(avg) == 1.0
    assert int(cnt) == 4
    pred = np.zeros_like(gt)
    for n in range(2):
        for j in range(4):
            pred[n, 30, 20, j] = 1.0   # far away
    per, avg, cnt, _ = accuracy_jax(jnp.asarray(pred), jnp.asarray(gt))
    assert float(avg) == 0.0


def test_pck_invisible_joints_excluded():
    """gt peak at (0,0) (<=1) -> joint marked missing, acc = -1 for it."""
    gt = np.zeros((1, 16, 12, 2), np.float32)
    gt[0, 8, 6, 0] = 1.0          # visible joint
    # joint 1 left all-zero: argmax at (0,0) -> invalid
    per, avg, cnt, _ = accuracy_jax(jnp.asarray(gt), jnp.asarray(gt))
    assert float(per[0]) == 1.0
    assert float(per[1]) == -1.0
    assert int(cnt) == 1
