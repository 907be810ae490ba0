"""NCHW PyTorch mirror of the RSG head — the full-flagship-model oracle side.

Extends the round-2 torch-oracle pattern (``tests/torch_hrnet.py``) from the
backbone to the whole flagship model (SURVEY.md §2.8 expected reference path
``lib/models/`` RSGNet head variant).  The relation/skeleton-graph head has
no public torch counterpart (the reference mount has been empty every round),
so unlike the HRNet mirror this is NOT independent evidence about the
*design* — it is a second implementation of the SAME documented design
contract (the numbered steps in ``rsgnet_tpu/models/rsgnet_head.py``),
written against torch's native conventions (NCHW, ``nn.Linear`` [out, in]
weights, ``nn.BatchNorm2d``).  Comparing forwards therefore catches exactly
the class of bug a second framework can catch: layout transposes, softmax /
reduction axes, FiLM broadcast shapes, adjacency application order, BN
eps/stat semantics, concat order, residual wiring.

Head design contract mirrored here (rsgnet_tpu/models/rsgnet_head.py:7-27):

1. node pooling:   node[k] = softmax_HW(initial_hm_k) . proj(feats)
2. instance FiLM:  g = relu(fc1(mean_HW(feats)));  (scale, shift) = film(g)
                   nodes <- nodes * (1 + scale) + shift
3. skeleton GCN:   L rounds of  relu(W_n (A nodes) + W_s nodes)
4. refinement:     ctx = attn^T nodes  splatted to the grid, concat with
                   feats, refine ConvBN blocks, 1x1 delta conv;
                   final = initial + delta
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

BN_MOMENTUM = 0.1


class TorchRSGHead(nn.Module):
    def __init__(self, num_joints, adjacency, feat_channels,
                 node_channels=64, relation_channels=64,
                 gcn_layers=2, refine_blocks=1):
        super().__init__()
        self.register_buffer(
            "adj", torch.as_tensor(np.asarray(adjacency), dtype=torch.float32))
        cn = node_channels
        self.node_proj = nn.Conv2d(feat_channels, cn, 1)
        self.rel_fc1 = nn.Linear(feat_channels, relation_channels)
        self.rel_film = nn.Linear(relation_channels, 2 * cn)
        self.w_neigh = nn.ModuleList(
            [nn.Linear(cn, cn) for _ in range(gcn_layers)])
        self.w_self = nn.ModuleList(
            [nn.Linear(cn, cn) for _ in range(gcn_layers)])
        refine = []
        cin = feat_channels + cn
        for _ in range(refine_blocks):
            refine.append(nn.Sequential(
                nn.Conv2d(cin, cn, 3, padding=1, bias=False),
                nn.BatchNorm2d(cn, momentum=BN_MOMENTUM),
                nn.ReLU(inplace=True)))
            cin = cn
        self.refine = nn.ModuleList(refine)
        self.delta = nn.Conv2d(cn, num_joints, 1)

    def forward(self, feats, initial):
        """feats: (B, C, H, W); initial: (B, K, H, W) -> (final, initial)."""
        b, c, h, w = feats.shape
        k = initial.shape[1]

        # 1. node pooling via heatmap-softmax attention
        attn = torch.softmax(initial.reshape(b, k, h * w), dim=-1)  # (B,K,HW)
        proj = self.node_proj(feats).reshape(b, -1, h * w)          # (B,Cn,HW)
        nodes = torch.einsum("bkp,bcp->bkc", attn, proj)            # (B,K,Cn)

        # 2. instance-relation FiLM from a global embedding
        g = torch.relu(self.rel_fc1(feats.mean(dim=(2, 3))))
        scale, shift = self.rel_film(g).chunk(2, dim=-1)
        nodes = nodes * (1.0 + scale[:, None, :]) + shift[:, None, :]

        # 3. skeleton-graph message passing
        for wn, ws in zip(self.w_neigh, self.w_self):
            neigh = torch.einsum("kj,bjc->bkc", self.adj, nodes)
            nodes = torch.relu(wn(neigh) + ws(nodes))

        # 4. splat node context back to the grid, refine, residual delta
        ctx = torch.einsum("bkp,bkc->bpc", attn, nodes)             # (B,HW,Cn)
        ctx = ctx.permute(0, 2, 1).reshape(b, -1, h, w)
        y = torch.cat([feats, ctx], dim=1)
        for block in self.refine:
            y = block(y)
        return initial + self.delta(y), initial


def _load_head_from_flax(head: TorchRSGHead, params, batch_stats):
    """Transplant the flax head tree (params/batch_stats under 'rsg_head')
    into the torch mirror.  Layout transposes: Dense kernel (in, out) ->
    Linear weight (out, in); Conv kernel HWIO -> OIHW."""
    def t_lin(mod, tree):
        mod.weight.copy_(torch.as_tensor(np.asarray(tree["kernel"]).T))
        mod.bias.copy_(torch.as_tensor(np.asarray(tree["bias"])))

    def t_conv(weight, kernel):
        weight.copy_(torch.as_tensor(
            np.transpose(np.asarray(kernel), (3, 2, 0, 1))))

    with torch.no_grad():
        t_conv(head.node_proj.weight, params["node_proj"]["kernel"])
        head.node_proj.bias.copy_(
            torch.as_tensor(np.asarray(params["node_proj"]["bias"])))
        t_lin(head.rel_fc1, params["rel_fc1"])
        t_lin(head.rel_film, params["rel_film"])
        for i, (wn, ws) in enumerate(zip(head.w_neigh, head.w_self)):
            t_lin(wn, params[f"gcn{i}"]["w_neigh"])
            t_lin(ws, params[f"gcn{i}"]["w_self"])
        for i, block in enumerate(head.refine):
            conv, bn, _ = block
            t_conv(conv.weight, params[f"refine{i}"]["conv"]["kernel"])
            bn.weight.copy_(torch.as_tensor(
                np.asarray(params[f"refine{i}"]["bn"]["scale"])))
            bn.bias.copy_(torch.as_tensor(
                np.asarray(params[f"refine{i}"]["bn"]["bias"])))
            bn.running_mean.copy_(torch.as_tensor(
                np.asarray(batch_stats[f"refine{i}"]["bn"]["mean"])))
            bn.running_var.copy_(torch.as_tensor(
                np.asarray(batch_stats[f"refine{i}"]["bn"]["var"])))
        t_conv(head.delta.weight, params["delta"]["kernel"])
        head.delta.bias.copy_(
            torch.as_tensor(np.asarray(params["delta"]["bias"])))


def export_head_grads(tree):
    """flax rsg_head grad tree -> {torch param name: ndarray}, the exact
    inverse layout mapping of ``_load_head_from_flax`` (Dense kernel
    (in, out) -> Linear weight (out, in); Conv HWIO -> OIHW).  Used by the
    flagship train oracle to compare every head gradient against torch
    autograd."""
    def lin(prefix, sub):
        return {f"{prefix}.weight": np.asarray(sub["kernel"]).T,
                f"{prefix}.bias": np.asarray(sub["bias"])}

    def conv_w(kernel):
        return np.transpose(np.asarray(kernel), (3, 2, 0, 1))

    out = {"node_proj.weight": conv_w(tree["node_proj"]["kernel"]),
           "node_proj.bias": np.asarray(tree["node_proj"]["bias"]),
           "delta.weight": conv_w(tree["delta"]["kernel"]),
           "delta.bias": np.asarray(tree["delta"]["bias"])}
    out.update(lin("rel_fc1", tree["rel_fc1"]))
    out.update(lin("rel_film", tree["rel_film"]))
    i = 0
    while f"gcn{i}" in tree:
        out.update(lin(f"w_neigh.{i}", tree[f"gcn{i}"]["w_neigh"]))
        out.update(lin(f"w_self.{i}", tree[f"gcn{i}"]["w_self"]))
        i += 1
    i = 0
    while f"refine{i}" in tree:
        out[f"refine.{i}.0.weight"] = conv_w(tree[f"refine{i}"]["conv"]["kernel"])
        out[f"refine.{i}.1.weight"] = np.asarray(tree[f"refine{i}"]["bn"]["scale"])
        out[f"refine.{i}.1.bias"] = np.asarray(tree[f"refine{i}"]["bn"]["bias"])
        i += 1
    return out


class TorchPoseRSGNet(nn.Module):
    """backbone + head composed the way ``models/pose_rsgnet.py`` wires them."""

    def __init__(self, backbone, head):
        super().__init__()
        self.backbone = backbone
        self.head = head

    def forward(self, x):
        initial, feats = self.backbone(x, return_features=True)
        return self.head(feats, initial)


def build_torch_rsgnet(cfg, flax_variables, adjacency):
    """Build the full torch flagship mirror and load the flax weights into
    it (backbone via ``export_state_dict``, head via the transplant map)."""
    from torch_hrnet import PoseHighResolutionNet as TorchBackbone

    from rsgnet_tpu.utils.torch_convert import export_state_dict

    backbone = TorchBackbone(cfg)
    sd = export_state_dict(cfg, flax_variables["params"],
                           flax_variables["batch_stats"],
                           nested_under="backbone")
    missing, unexpected = backbone.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    bad = [k for k in missing if "num_batches_tracked" not in k]
    assert not bad, f"backbone missing tensors: {bad[:8]}"
    assert not unexpected, f"backbone unexpected tensors: {unexpected[:8]}"

    exp = 4 if cfg.MODEL.EXTRA.STAGE4.BLOCK == "BOTTLENECK" else 1
    feat_channels = cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS[0] * exp
    head = TorchRSGHead(
        num_joints=cfg.MODEL.NUM_JOINTS, adjacency=adjacency,
        feat_channels=feat_channels,
        node_channels=cfg.MODEL.RSG.NODE_CHANNELS,
        relation_channels=cfg.MODEL.RSG.RELATION_CHANNELS,
        gcn_layers=cfg.MODEL.RSG.GCN_LAYERS,
        refine_blocks=cfg.MODEL.RSG.REFINE_BLOCKS)
    _load_head_from_flax(head, flax_variables["params"]["rsg_head"],
                         flax_variables["batch_stats"]["rsg_head"])
    return TorchPoseRSGNet(backbone, head)


@torch.no_grad()
def torch_rsgnet_forward(cfg, flax_variables, adjacency, x_nchw):
    """Full flagship eval-mode forward on the torch side.
    Returns (final, initial) as numpy NCHW."""
    model = build_torch_rsgnet(cfg, flax_variables, adjacency)
    model.eval()
    final, initial = model(torch.as_tensor(x_nchw))
    return final.numpy(), initial.numpy()
