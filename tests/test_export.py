"""StableHLO serving export (utils/export.py): round-trip + parity."""
import numpy as np

import jax
import jax.numpy as jnp

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.core.inference import make_inference_fn
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.utils.export import (export_inference, load_exported,
                                     read_exported, save_exported)


def _setup():
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.TEST.FLIP_TEST = True
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32), train=False)
    return cfg, model, variables, (h, w)


def test_export_roundtrip_matches_direct_inference(tmp_path):
    cfg, model, variables, (h, w) = _setup()
    blob = export_inference(cfg, model, variables)
    assert isinstance(blob, bytes) and len(blob) > 1000

    path = str(tmp_path / "model.shlo")
    save_exported(path, blob)
    served = read_exported(path)

    direct = make_inference_fn(cfg, model)
    rng = np.random.RandomState(0)
    # symbolic batch: one artifact serves multiple batch sizes
    for n in (2, 5):
        images = jnp.asarray(rng.uniform(-2, 2, (n, h, w, 3))
                             .astype(np.float32))
        centers = jnp.asarray(rng.uniform(100, 300, (n, 2))
                              .astype(np.float32))
        scales = jnp.asarray(rng.uniform(0.8, 1.4, (n, 2))
                             .astype(np.float32))
        p0, m0 = direct(variables, images, centers, scales)
        p1, m1 = served(images, centers, scales)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-5, atol=1e-5)


def test_export_other_families(tmp_path):
    """The export path is model-agnostic: pose_resnet (SimpleBaseline) and
    an MPII-spec model (16-kpt flip permutation baked into the flip-test)
    export and serve with the same parity as the flagship."""
    from rsgnet_tpu.config.defaults import tiny_resnet

    for mutate in (lambda c: None,
                   lambda c: setattr(c.DATASET, "DATASET", "mpii") or
                   setattr(c.MODEL, "NUM_JOINTS", 16)):
        cfg = tiny_resnet()
        mutate(cfg)
        model = get_pose_net(cfg)
        h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
        variables = model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, h, w, 3), jnp.float32),
                               train=False)
        served = load_exported(export_inference(cfg, model, variables))
        direct = make_inference_fn(cfg, model)
        rng = np.random.RandomState(2)
        images = jnp.asarray(rng.uniform(-2, 2, (3, h, w, 3))
                             .astype(np.float32))
        centers = jnp.asarray(rng.uniform(100, 300, (3, 2))
                              .astype(np.float32))
        scales = jnp.asarray(rng.uniform(0.8, 1.4, (3, 2))
                             .astype(np.float32))
        p0, m0 = direct(variables, images, centers, scales)
        p1, m1 = served(images, centers, scales)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-5, atol=1e-5)


def test_export_multi_platform_from_cpu():
    """platforms=("cpu","tpu"): a CI host without a TPU can build ONE
    artifact deployable on both (jax.export cross-platform lowering)."""
    cfg, model, variables, (h, w) = _setup()
    blob = export_inference(cfg, model, variables, platforms=("cpu", "tpu"))
    served = load_exported(blob)
    x = jnp.zeros((2, h, w, 3), jnp.float32)
    c = jnp.full((2, 2), 100.0)
    s = jnp.full((2, 2), 1.0)
    p, m = served(x, c, s)
    assert np.asarray(p).shape == (2, cfg.MODEL.NUM_JOINTS, 2)


def test_export_raw_uint8_variant():
    cfg, model, variables, (h, w) = _setup()
    blob = export_inference(cfg, model, variables, normalize_input=True)
    served = load_exported(blob)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randint(0, 256, (3, h, w, 3)).astype(np.uint8))
    centers = jnp.asarray(rng.uniform(100, 300, (3, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.8, 1.4, (3, 2)).astype(np.float32))
    p, m = served(images, centers, scales)
    assert np.isfinite(np.asarray(p)).all()
    assert np.asarray(m).shape == (3, cfg.MODEL.NUM_JOINTS, 1)


def test_export_e2e_pipeline():
    """End-to-end artifact: raw padded uint8 sources + boxes -> keypoints
    (separable device warp fused in), parity vs make_e2e_fn."""
    from rsgnet_tpu.core.inference import make_e2e_fn
    from rsgnet_tpu.utils.export import export_e2e

    cfg, model, variables, _ = _setup()
    src = (96, 96)
    blob = export_e2e(cfg, model, variables, src)
    served = load_exported(blob)
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randint(0, 256, (3, 96, 96, 3)).astype(np.uint8))
    centers = jnp.asarray(rng.uniform(30, 66, (3, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.2, 0.4, (3, 2)).astype(np.float32))
    direct = make_e2e_fn(cfg, model, src)
    # symbolic batch: the one artifact serves multiple batch sizes
    for n in (1, 3):
        p1, m1 = served(imgs[:n], centers[:n], scales[:n])
        p0, m0 = direct(variables, imgs[:n], centers[:n], scales[:n])
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-5, atol=1e-5)
