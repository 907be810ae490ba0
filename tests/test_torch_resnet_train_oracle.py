"""pose_resnet torch TRAINING-step oracle — same standard as the HRNet and
flagship train oracles (``test_torch_train_oracle.py``): an fp64 torch run of
the INDEPENDENT NCHW pose_resnet defines the expected train-mode forward,
loss, every parameter gradient, and the BatchNorm running-stat updates (to
the documented biased/unbiased convention).  This closes the family's
evidence matrix: forward oracle (both conversion directions) + train oracle.

Reference paths per SURVEY.md: §2.16 (JointsMSELoss), §2.17 (train step);
the family's expected reference model is ``lib/models/pose_resnet.py``.
"""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from rsgnet_tpu.core.loss import joints_mse_loss
from rsgnet_tpu.utils.torch_convert import export_state_dict

from test_torch_resnet_oracle import _randomized_variables, _tiny_cfg
from test_torch_train_oracle import _torch_joints_mse_loss
from torch_resnet import PoseResNet as TorchNet


def test_resnet_train_step_matches_torch_oracle():
    cfg = _tiny_cfg()
    model, variables = _randomized_variables(cfg, seed=23)
    sd = export_state_dict(cfg, variables["params"], variables["batch_stats"])

    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    hh, hw = cfg.MODEL.HEATMAP_SIZE[1], cfg.MODEL.HEATMAP_SIZE[0]
    k = cfg.MODEL.NUM_JOINTS
    rng = np.random.RandomState(5)
    x = rng.uniform(-2, 2, (4, h, w, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (4, hh, hw, k)).astype(np.float32)
    tw = (rng.uniform(0, 1, (4, k)) > 0.25).astype(np.float32)

    # fp64 torch = ground truth; fp32 torch = legitimate noise floor (see
    # the HRNet train oracle's calibration notes)
    def torch_run(dtype):
        tmodel = TorchNet(cfg)
        missing, unexpected = tmodel.load_state_dict(
            {kk: torch.as_tensor(v) for kk, v in sd.items()}, strict=False)
        assert not [m for m in missing if "num_batches_tracked" not in m]
        assert not unexpected
        tmodel = tmodel.to(dtype)
        tmodel.train()
        bn_m = {}
        for name, mod in tmodel.named_modules():
            if isinstance(mod, nn.BatchNorm2d):
                def hook(mod, inp, out, name=name):
                    t = inp[0]
                    bn_m[name] = int(t.shape[0] * t.shape[2] * t.shape[3])
                mod.register_forward_hook(hook)
        out = tmodel(torch.as_tensor(
            np.transpose(x, (0, 3, 1, 2))).to(dtype))
        loss = _torch_joints_mse_loss(
            out,
            torch.as_tensor(np.transpose(target, (0, 3, 1, 2))).to(dtype),
            torch.as_tensor(tw).to(dtype))
        loss.backward()
        return tmodel, out, loss, bn_m

    tmodel64, t_out, t_loss, bn_m = torch_run(torch.float64)
    tmodel32, _, _, _ = torch_run(torch.float32)

    def loss_fn(params):
        out, new_state = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=True, mutable=["batch_stats"])
        return joints_mse_loss(out, jnp.asarray(target), jnp.asarray(tw)), \
            (out, new_state["batch_stats"])

    (f_loss, (f_out, new_stats)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])

    # (a) train-mode forward
    t_out_np = np.transpose(t_out.detach().numpy(), (0, 2, 3, 1))
    f_out_np = np.asarray(f_out).astype(np.float64)
    scale = max(np.abs(t_out_np).max(), 1.0)
    assert np.abs(f_out_np - t_out_np).max() <= 5e-4 * scale

    # (b) loss
    t_loss_v = float(t_loss.detach())
    assert abs(float(f_loss) - t_loss_v) <= 1e-5 * max(abs(t_loss_v), 1.0)

    # (c) every parameter gradient (bounds as calibrated for the HRNet train
    # oracle: per-param rel, mean rel, and aggregate-vs-fp32-floor)
    g_sd = export_state_dict(cfg, grads, variables["batch_stats"])
    t32_params = dict(tmodel32.named_parameters())
    rels, ours_tot, floor_tot = [], 0.0, 0.0
    for name, p in tmodel64.named_parameters():
        oracle = p.grad.numpy()
        gscale = max(np.abs(oracle).max(), 1e-8)
        ours = np.abs(g_sd[name].astype(np.float64) - oracle).max()
        ours_tot += ours
        floor_tot += np.abs(t32_params[name].grad.numpy() - oracle).max()
        rel = ours / gscale
        rels.append(rel)
        assert rel <= 5e-2, f"grad at {name}: rel err {rel:.3e}"
    assert len(rels) == sum(1 for _ in tmodel64.named_parameters())
    assert float(np.mean(rels)) <= 3e-3, np.mean(rels)
    assert ours_tot <= 3.0 * floor_tot, (ours_tot, floor_tot)

    # (d) BN running stats (documented biased/unbiased convention)
    new_sd = export_state_dict(cfg, variables["params"], new_stats)
    t_buffers = {kk: v.numpy() for kk, v in tmodel64.named_buffers()}
    n_bn = 0
    for name in sd:
        if name.endswith("running_mean"):
            theirs = t_buffers[name]
            ms = max(np.abs(theirs).max(), 1.0)
            assert np.abs(new_sd[name] - theirs).max() <= 1e-4 * ms, name
        elif name.endswith("running_var"):
            mod_name = name[:-len(".running_var")]
            m = bn_m[mod_name]
            old = sd[name].astype(np.float64)
            t_new = t_buffers[name]
            unbiased = (t_new - 0.9 * old) / 0.1
            expected_flax = 0.9 * old + 0.1 * unbiased * (m - 1) / m
            vs = max(np.abs(expected_flax).max(), 1.0)
            assert np.abs(new_sd[name] - expected_flax).max() <= 1e-4 * vs, \
                f"{name} (m={m})"
            n_bn += 1
    assert n_bn == len(bn_m)
