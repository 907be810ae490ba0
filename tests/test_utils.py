"""Utility-layer tests: summary, profiler meters, vis, image IO/zipreader."""
import os
import zipfile

import jax.numpy as jnp
import numpy as np

from rsgnet_tpu.config.defaults import tiny_rsgnet


def test_model_summary():
    from rsgnet_tpu.models import get_pose_net
    from rsgnet_tpu.utils.summary import count_params, get_model_summary
    cfg = tiny_rsgnet()
    model = get_pose_net(cfg)
    s = get_model_summary(cfg, model)
    assert "TOTAL" in s and "backbone" in s
    assert "M params" in s


def test_throughput_meter():
    from rsgnet_tpu.utils.profiler import ThroughputMeter
    m = ThroughputMeter(skip=1)
    for _ in range(4):
        m.start()
        x = jnp.ones((8, 8)) * 2
        m.stop(8, fence=x)
    assert m.steps == 4 and m.images == 24
    assert m.images_per_sec > 0


def test_zipreader(tmp_path):
    from PIL import Image
    from rsgnet_tpu.utils.imageio import read_image
    img = np.zeros((32, 48, 3), np.uint8)
    img[:, :, 0] = 200
    plain = tmp_path / "a.png"
    Image.fromarray(img).save(plain)
    zpath = tmp_path / "arch.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(plain, "sub/a.png")
    direct = read_image(str(plain))
    via_zip = read_image(f"{zpath}@/sub/a.png")
    np.testing.assert_array_equal(direct, via_zip)
    assert direct[0, 0, 0] == 200            # RGB order preserved


def test_vis_debug_images(tmp_path):
    from rsgnet_tpu.utils.vis import save_debug_images
    cfg = tiny_rsgnet()
    cfg.DEBUG.DEBUG = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_GT = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_PRED = True
    cfg.DEBUG.SAVE_HEATMAPS_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_PRED = True
    n, k = 2, cfg.MODEL.NUM_JOINTS
    inputs = np.random.RandomState(0).uniform(-2, 2, (n, 96, 64, 3))
    joints = np.random.RandomState(1).uniform(0, 60, (n, k, 2))
    vis = np.ones((n, k))
    hm = np.random.RandomState(2).uniform(0, 1, (n, 24, 16, k))
    prefix = str(tmp_path / "dbg")
    save_debug_images(cfg, inputs, joints, vis, hm, hm, prefix)
    assert os.path.exists(prefix + "_gt.png")
    assert os.path.exists(prefix + "_pred.png")
    assert os.path.exists(prefix + "_hm_gt.png")
    assert os.path.exists(prefix + "_hm_pred.png")
