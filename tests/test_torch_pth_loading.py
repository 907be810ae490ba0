"""End-to-end torch .pth checkpoint loading: a real torch-serialized
state_dict (what released reference checkpoints are) round-trips through
load_torch_checkpoint -> convert_state_dict -> identical forward results."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rsgnet_tpu.config.defaults import tiny_rsgnet  # noqa: E402
from rsgnet_tpu.models import get_pose_net  # noqa: E402
from rsgnet_tpu.utils.checkpoint import load_weights  # noqa: E402
from rsgnet_tpu.utils.torch_convert import (export_state_dict,  # noqa: E402
                                            load_torch_checkpoint)


def test_pth_checkpoint_roundtrip(tmp_path):
    cfg = tiny_rsgnet()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, h, w, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(model.apply(v, x, train=False))

    # export the backbone as a torch-style .pth (with the usual 'module.'
    # DataParallel prefix and a state_dict wrapper, like released ckpts)
    sd = export_state_dict(cfg, v["params"], v["batch_stats"],
                           nested_under="backbone")
    torch_sd = {f"module.{k}": torch.from_numpy(np.ascontiguousarray(val))
                for k, val in sd.items()}
    path = tmp_path / "model_best.pth"
    torch.save({"state_dict": torch_sd, "epoch": 5}, str(path))

    # load via the public eval-weights path (head params stay fresh-init,
    # which is exactly v's — so outputs must match bitwise)
    v2 = load_weights(cfg, model, str(path))
    got = np.asarray(model.apply(v2, x, train=False))
    np.testing.assert_array_equal(got, want)


def test_load_torch_checkpoint_strips_prefix(tmp_path):
    cfg = tiny_rsgnet()
    model = get_pose_net(cfg)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 96, 64, 3)), train=False)
    sd = export_state_dict(cfg, v["params"], v["batch_stats"],
                           nested_under="backbone")
    torch_sd = {f"module.{k}": torch.from_numpy(np.ascontiguousarray(val))
                for k, val in sd.items()}
    path = tmp_path / "ckpt.pth"
    torch.save(torch_sd, str(path))         # bare state_dict variant
    loaded = load_torch_checkpoint(str(path))
    assert set(loaded.keys()) == set(sd.keys())
    np.testing.assert_array_equal(loaded["conv1.weight"], sd["conv1.weight"])
