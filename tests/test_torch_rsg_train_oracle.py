"""Flagship TRAINING-step oracle: torch autograd defines the expected
gradients of the WHOLE PoseRSGNet (backbone + relation/skeleton-graph head).

Extends ``tests/test_torch_train_oracle.py`` (backbone-only) to the flagship
training objective used by ``core/train.py``:

    loss = JointsMSELoss(final) + 0.5 * JointsMSELoss(initial)   (aux term)

The torch side composes the independent torch_hrnet backbone with the
torch RSG-head mirror (``tests/torch_rsgnet.py``) and backprops through the
head's softmax-attention pooling, FiLM modulation, GCN einsums, splat and
refine ConvBN — so every flagship parameter gradient (head AND backbone,
which receives gradient through BOTH the initial-heatmap branch and the
feature branch) is checked against an fp64 torch ground truth.  BN
running-stat updates are already convention-checked in the backbone train
oracle; the head's refine BN reuses the same ConvBN module, so this test
focuses on (a) train-mode forward, (b) loss, (c) gradients.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rsgnet_tpu.core.loss import joints_mse_loss
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.utils.torch_convert import export_state_dict

from test_torch_rsg_oracle import _randomized, _tiny_rsg_cfg
from test_torch_train_oracle import _torch_joints_mse_loss
from torch_rsgnet import build_torch_rsgnet, export_head_grads


def test_flagship_train_step_matches_torch_oracle():
    cfg = _tiny_rsg_cfg("coco")
    model = get_pose_net(cfg)
    variables = _randomized(model, cfg, seed=17)
    adjacency = get_spec("coco").adjacency()

    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    hh, hw = cfg.MODEL.HEATMAP_SIZE[1], cfg.MODEL.HEATMAP_SIZE[0]
    k = cfg.MODEL.NUM_JOINTS
    rng = np.random.RandomState(23)
    x = rng.uniform(-2, 2, (4, h, w, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (4, hh, hw, k)).astype(np.float32)
    tw = (rng.uniform(0, 1, (4, k)) > 0.25).astype(np.float32)

    # torch side twice: fp64 = ground truth, fp32 = legitimate noise floor
    # (same calibration rationale as the backbone train oracle)
    def torch_run(dtype):
        tmodel = build_torch_rsgnet(cfg, variables, adjacency).to(dtype)
        tmodel.train()
        t_target = torch.as_tensor(
            np.transpose(target, (0, 3, 1, 2))).to(dtype)
        t_tw = torch.as_tensor(tw).to(dtype)
        final, initial = tmodel(torch.as_tensor(
            np.transpose(x, (0, 3, 1, 2))).to(dtype))
        loss = (_torch_joints_mse_loss(final, t_target, t_tw)
                + 0.5 * _torch_joints_mse_loss(initial, t_target, t_tw))
        loss.backward()
        return tmodel, final, loss

    tmodel64, t_final, t_loss = torch_run(torch.float64)
    tmodel32, _, _ = torch_run(torch.float32)

    # flax side: the training objective exactly as core/train.py builds it
    def loss_fn(params):
        (final, aux), new_state = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=True, return_aux=True,
            mutable=["batch_stats"])
        t, tww = jnp.asarray(target), jnp.asarray(tw)
        return (joints_mse_loss(final, t, tww)
                + 0.5 * joints_mse_loss(aux, t, tww)), final

    (f_loss, f_final), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])

    # (a) train-mode forward of the refined heatmaps vs the fp64 oracle
    t_final_np = np.transpose(t_final.detach().numpy(), (0, 2, 3, 1))
    scale = max(np.abs(t_final_np).max(), 1.0)
    assert np.abs(np.asarray(f_final, np.float64)
                  - t_final_np).max() <= 5e-4 * scale

    # (b) loss value
    t_loss_v = float(t_loss.detach())
    assert abs(float(f_loss) - t_loss_v) <= 1e-5 * max(abs(t_loss_v), 1.0)

    # (c) every parameter gradient (backbone names via export_state_dict,
    # head names via the transplant map's inverse), vs fp64 ground truth
    # with the torch-fp32 run as the aggregate noise floor
    g_sd = {f"backbone.{name}": v for name, v in export_state_dict(
        cfg, grads, variables["batch_stats"],
        nested_under="backbone").items()
        if not name.endswith((".running_mean", ".running_var"))}
    g_sd.update({f"head.{name}": v for name, v in
                 export_head_grads(grads["rsg_head"]).items()})

    t32_params = dict(tmodel32.named_parameters())
    rels, ours_tot, floor_tot, n_checked = [], 0.0, 0.0, 0
    for name, p in tmodel64.named_parameters():
        oracle = p.grad.numpy()
        gscale = max(np.abs(oracle).max(), 1e-8)
        assert name in g_sd, f"no flax grad exported for {name}"
        ours = np.abs(g_sd[name].astype(np.float64) - oracle).max()
        ours_tot += ours
        floor_tot += np.abs(t32_params[name].grad.numpy() - oracle).max()
        rel = ours / gscale
        rels.append(rel)
        n_checked += 1
        assert rel <= 5e-2, f"grad at {name}: rel err {rel:.3e}"
    assert n_checked == sum(1 for _ in tmodel64.named_parameters())
    assert n_checked == len(g_sd), (
        f"flax exported {len(g_sd)} grads, torch has {n_checked} params")
    assert float(np.mean(rels)) <= 3e-3, np.mean(rels)
    assert ours_tot <= 3.0 * floor_tot, (ours_tot, floor_tot)
