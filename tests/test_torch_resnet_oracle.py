"""pose_resnet (SimpleBaseline) — torch forward-oracle parity + smoke.

Same evidence standard as ``tests/test_torch_oracle.py``: the expected output
is defined by an INDEPENDENT NCHW PyTorch pose_resnet
(``tests/torch_resnet.py``, written from the public SimpleBaselines
architecture with the reference tensor naming), not by the builder's own
code.  Covers the one mapping that is new in this family — the transposed
conv expressed as a dilated-input conv with a spatially-flipped kernel —
plus the stem maxpool and the downsample-projection placement.
"""
import numpy as np
import pytest

from flax import traverse_util

from rsgnet_tpu.config.defaults import Config, tiny_resnet
from rsgnet_tpu.models.pose_resnet import PoseResNet
from rsgnet_tpu.utils.torch_convert import (convert_state_dict,
                                            export_state_dict)

from torch_resnet import torch_forward


def _tiny_cfg():
    cfg = tiny_resnet()
    cfg.MODEL.NUM_JOINTS = 5
    return cfg


def _res50_cfg():
    # full ResNet-50 topology at a small input — spatial size does not
    # change the architecture under test
    cfg = Config()
    cfg.DTYPE = "float32"
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.IMAGE_SIZE = (64, 96)
    cfg.MODEL.HEATMAP_SIZE = (16, 24)
    return cfg


def _mixed_deconv_cfg():
    # exercise every deconv kernel size the reference supports (4/3/2) and
    # the DECONV_WITH_BIAS branch in one config
    cfg = _tiny_cfg()
    cfg.MODEL.EXTRA.NUM_DECONV_KERNELS = (4, 3, 2)
    cfg.MODEL.EXTRA.DECONV_WITH_BIAS = True
    return cfg


def _randomized_variables(cfg, seed):
    """Init, then randomize EVERY leaf incl. BN running stats (which init to
    0/1 and would otherwise leave the BN mapping untested)."""
    import jax

    model = PoseResNet(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(seed),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    rng = np.random.RandomState(seed)
    out = {}
    for col in ("params", "batch_stats"):
        flat = traverse_util.flatten_dict(variables[col])
        new = {}
        for path, leaf in flat.items():
            shape = np.shape(leaf)
            if path[-1] in ("var", "scale"):
                v = rng.uniform(0.5, 1.5, shape)
            elif path[-1] == "kernel":
                fan_in = max(int(np.prod(shape[:-1])), 1)
                v = rng.normal(0, 1.0 / np.sqrt(fan_in), shape)
            else:                      # bias / mean
                v = rng.normal(0, 0.1, shape)
            new[path] = v.astype(np.float32)
        out[col] = traverse_util.unflatten_dict(new)
    return model, out


def _flax_forward(cfg, model, variables, x_nhwc):
    import jax
    return np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x_nhwc))


@pytest.mark.parametrize("make_cfg,seed",
                         [(_tiny_cfg, 0), (_res50_cfg, 1),
                          (_mixed_deconv_cfg, 2)],
                         ids=["tiny18", "res50", "mixed-deconv"])
def test_flax_matches_independent_torch_oracle(make_cfg, seed):
    cfg = make_cfg()
    model, variables = _randomized_variables(cfg, seed)
    sd = export_state_dict(cfg, variables["params"], variables["batch_stats"])

    rng = np.random.RandomState(100 + seed)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    x = rng.uniform(-2, 2, (2, h, w, 3)).astype(np.float32)

    ours = _flax_forward(cfg, model, variables, x)
    theirs = torch_forward(cfg, sd, np.transpose(x, (0, 3, 1, 2)))
    theirs = np.transpose(theirs, (0, 2, 3, 1))      # NCHW -> NHWC

    assert ours.shape == theirs.shape
    # heatmap (w,h) config is (16,24) -> NHWC (N,24,16,K)
    assert ours.shape[1:3] == (cfg.MODEL.HEATMAP_SIZE[1],
                               cfg.MODEL.HEATMAP_SIZE[0])
    err = np.abs(ours - theirs).max()
    scale = max(np.abs(theirs).max(), 1.0)
    assert err <= 1e-4 * scale, f"max abs err {err} (output scale {scale})"


def test_torch_import_direction_matches_oracle():
    """convert_state_dict (torch -> flax, the released-checkpoint direction)
    also reproduces the torch oracle's forward."""
    import jax
    import torch

    from torch_resnet import PoseResNet as TorchNet

    cfg = _tiny_cfg()
    tmodel = TorchNet(cfg)
    tmodel.eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, buf in tmodel.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}

    model = PoseResNet(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    params, stats = convert_state_dict(cfg, sd)
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.RandomState(3)
    x = rng.uniform(-2, 2, (2, h, w, 3)).astype(np.float32)
    ours = _flax_forward(cfg, model, variables, x)
    with torch.no_grad():
        theirs = tmodel(torch.as_tensor(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    err = np.abs(ours - theirs).max()
    assert err <= 1e-4 * max(np.abs(theirs).max(), 1.0), f"max abs err {err}"


@pytest.mark.parametrize("k", [4, 3, 2])
def test_deconv_construction_bitwise_vs_lax_conv_transpose(k):
    """The dilated-input conv used by DeconvBN is the SAME operator JAX's
    own ``lax.conv_transpose`` computes — bitwise, same backend — for every
    (kernel, padding, output_padding) triple in the reference's
    _get_deconv_cfg table.  This pins the construction itself; the <=1e-4
    torch tests above pin the cross-framework numerics."""
    import jax.numpy as jnp
    from jax import lax

    from rsgnet_tpu.models.pose_resnet import DECONV_CFG

    p, op = DECONV_CFG[k]
    rng = np.random.RandomState(k)
    x = jnp.asarray(rng.randn(2, 5, 7, 3), jnp.float32)      # NHWC
    w = jnp.asarray(rng.randn(k, k, 3, 4), jnp.float32)      # HWIO
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    pad = [(k - 1 - p, k - 1 - p + op)] * 2
    ours = lax.conv_general_dilated(x, w, window_strides=(1, 1), padding=pad,
                                    lhs_dilation=(2, 2),
                                    dimension_numbers=dn)
    ref = lax.conv_transpose(x, w, strides=(2, 2), padding=pad,
                             dimension_numbers=dn)
    # torch output-size law: (H-1)*s - 2p + k + op
    want_h = (x.shape[1] - 1) * 2 - 2 * p + k + op
    assert ours.shape[1] == want_h
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_oracle_is_sensitive_to_the_deconv_mapping():
    """Mutation check: corrupting ONE deconv tensor in the exported
    state_dict must change the torch forward — guards against the parity
    test passing because a tensor is silently unused on either side."""
    cfg = _tiny_cfg()
    model, variables = _randomized_variables(cfg, 5)
    sd = export_state_dict(cfg, variables["params"], variables["batch_stats"])

    rng = np.random.RandomState(9)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    x = rng.uniform(-2, 2, (1, h, w, 3)).astype(np.float32)
    x_nchw = np.transpose(x, (0, 3, 1, 2))

    base = torch_forward(cfg, sd, x_nchw)
    sd_mut = dict(sd)
    sd_mut["deconv_layers.3.weight"] = sd["deconv_layers.3.weight"] + 0.5
    mutated = torch_forward(cfg, sd_mut, x_nchw)
    assert np.abs(base - mutated).max() > 1e-3


def test_resnet_roundtrip_bijection():
    """export -> convert is the identity on every pose_resnet tensor."""
    cfg = _mixed_deconv_cfg()
    _, variables = _randomized_variables(cfg, 11)
    sd = export_state_dict(cfg, variables["params"], variables["batch_stats"])
    params, stats = convert_state_dict(cfg, sd)
    for col, tree in (("params", params), ("batch_stats", stats)):
        got = traverse_util.flatten_dict(tree)
        want = traverse_util.flatten_dict(variables[col])
        assert set(got) == set(want), col
        for path in want:
            np.testing.assert_array_equal(got[path], want[path],
                                          err_msg="/".join(path))


def test_resnet_imagenet_pretrained_init():
    """Reference init_weights path: a torchvision-style ImageNet ResNet
    checkpoint (backbone tensors + fc classifier, NO deconv/final_layer)
    initializes the backbone and leaves the head at fresh init."""
    import jax

    from flax import traverse_util

    from rsgnet_tpu.utils.torch_convert import load_pretrained_backbone

    cfg = _tiny_cfg()
    model, variables = _randomized_variables(cfg, 21)
    full_sd = export_state_dict(cfg, variables["params"],
                                variables["batch_stats"])
    # strip the pose head, add a classifier the map must ignore
    sd = {k: v for k, v in full_sd.items()
          if not k.startswith(("deconv_layers", "final_layer"))}
    sd["fc.weight"] = np.zeros((1000, 512), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)

    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    fresh = PoseResNet(cfg).init(jax.random.PRNGKey(3),
                                 np.zeros((1, h, w, 3), np.float32),
                                 train=False)
    loaded, n = load_pretrained_backbone(cfg, fresh, sd)
    assert n == len(sd) - 2             # everything but fc.*

    flat = traverse_util.flatten_dict(loaded["params"])
    fresh_flat = traverse_util.flatten_dict(fresh["params"])
    want = traverse_util.flatten_dict(variables["params"])
    for path in flat:
        if path[0].startswith(("deconv", "final_layer")):
            np.testing.assert_array_equal(flat[path], fresh_flat[path],
                                          err_msg=f"head {path} was touched")
        else:
            np.testing.assert_array_equal(flat[path], want[path],
                                          err_msg=f"backbone {path} not "
                                                  f"loaded")


def test_resnet_train_step_smoke():
    """tiny pose_resnet runs the real jitted train step and learns a bit."""
    import jax

    from rsgnet_tpu.core.train import create_train_state, make_train_step
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.models import get_pose_net

    cfg = _tiny_cfg()
    cfg.MODEL.NUM_JOINTS = 17
    model = get_pose_net(cfg)
    assert isinstance(model, PoseResNet)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, get_spec("coco"), jit=True,
                           donate=False)

    rng = np.random.RandomState(0)
    n = 4
    batch = {
        "image": rng.randint(0, 255, (n, 640, 640, 3)).astype(np.uint8),
        "joints": rng.uniform(200, 400, (n, 17, 2)).astype(np.float32),
        "joints_vis": np.ones((n, 17), np.float32),
        "center": np.full((n, 2), 320, np.float32),
        "scale": np.full((n, 2), 2.0, np.float32),
    }
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]       # MSE against near-zero targets drops
