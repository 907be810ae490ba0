"""TRAIN.REMAT: rematerialized stages must be numerically identical and
differentiable (jax.checkpoint trades FLOPs for activation memory)."""
import jax
import jax.numpy as jnp
import numpy as np

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net


def test_remat_same_forward_and_trains():
    cfg = tiny_rsgnet()
    cfg_r = tiny_rsgnet()
    cfg_r.TRAIN.REMAT = True
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, h, w, 3)),
                    jnp.float32)

    m = get_pose_net(cfg)
    m_r = get_pose_net(cfg_r)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # same init tree applies to both (remat is transparent to params)
    out = m.apply(v, x, train=False)
    out_r = m_r.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    # one train step with remat enabled: finite loss, params change
    spec = get_spec("coco")
    state = create_train_state(cfg_r, m_r, jax.random.PRNGKey(0))
    step = make_train_step(cfg_r, m_r, spec)
    rng = np.random.RandomState(1)
    k = cfg.MODEL.NUM_JOINTS
    batch = {
        "image": rng.randint(0, 255, (2, 96, 72, 3)).astype(np.uint8),
        "joints": rng.uniform(8, 64, (2, k, 2)).astype(np.float32),
        "joints_vis": np.ones((2, k), np.float32),
        "center": np.tile(np.array([[36.0, 48.0]], np.float32), (2, 1)),
        "scale": np.tile(np.array([[0.3, 0.4]], np.float32), (2, 1)),
    }
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.array_equal(before, after)
