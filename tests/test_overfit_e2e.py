"""End-to-end learning smoke: overfit the tiny model on the synthetic
fixture (no augmentation) and require training-time PCK and eval AP@.5 to
rise above chance — exercises the ENTIRE stack: on-device aug/target path ->
train step -> checkpointed weights -> e2e validate (warp -> model ->
flip-test -> decode -> OKS-NMS -> COCOeval).

Slow (~6 min on CPU); enabled with RSGNET_SLOW_TESTS=1 (CI smoke runs skip).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="slow e2e overfit test; set RSGNET_SLOW_TESTS=1")


def test_overfit_raises_pck_and_ap(tmp_path):
    import jax
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.core.train import create_train_state, make_train_step
    from rsgnet_tpu.core.validate import validate
    from rsgnet_tpu.data import get_dataset
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.models import get_pose_net
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture

    root = str(tmp_path)
    write_fixture(root, make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.SCALE_FACTOR = 0.0
    cfg.DATASET.ROT_FACTOR = 0.0
    cfg.DATASET.FLIP = False
    cfg.DATASET.PROB_HALF_BODY = 0.0
    cfg.TRAIN.LR = 2e-3
    cfg.TEST.FLIP_TEST = False
    ds = get_dataset(cfg, root=root, image_set="val", is_train=True)
    model = get_pose_net(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, get_spec("coco"))

    batch = ds.collate(np.arange(len(ds)))
    batch = {k: batch[k]
             for k in ("image", "joints", "joints_vis", "center", "scale")}
    key = jax.random.PRNGKey(0)
    acc = 0.0
    for i in range(1000):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
    acc = float(m["acc"])
    assert acc > 0.25, acc                   # well above the ~0.03 chance level

    val_ds = get_dataset(cfg, root=root, image_set="val", is_train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    name_value, ap = validate(cfg, val_ds, model, variables, batch_size=5)
    assert name_value["AP .5"] > 0.05, dict(name_value)
