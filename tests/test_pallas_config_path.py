"""TEST.PALLAS_DECODE through the public inference path on the CPU backend
(the kernel auto-selects interpret mode off-TPU)."""
import jax
import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.core.inference import make_inference_fn
from rsgnet_tpu.models import get_pose_net


def test_pallas_decode_config_path_matches_xla():
    cfg = tiny_rsgnet()
    cfg.TEST.DECODE = "dark"
    cfg.TEST.FLIP_TEST = False
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32)
    c = np.tile(np.array([[100.0, 100.0]], np.float32), (2, 1))
    s = np.tile(np.array([[0.8, 1.0]], np.float32), (2, 1))
    v = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    p_xla, m_xla = make_inference_fn(cfg, model)(v, x, c, s)
    cfg.TEST.PALLAS_DECODE = True
    p_pal, m_pal = make_inference_fn(cfg, model)(v, x, c, s)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_xla),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_xla),
                               rtol=1e-5)
