"""Torch-checkpoint <-> flax weight conversion (HRNet + pose_resnet).

Required by SURVEY.md §5.4: AP-parity verification against released reference
checkpoints needs a one-shot torch->JAX converter. The mapping targets the
public HRNet-family ``pose_hrnet`` state_dict naming (``conv1``/``bn1``,
``layer1.{b}``, ``transition{t}.{i}``, ``stage{s}.{m}.branches/fuse_layers``,
``final_layer``) and converts layouts:

- conv weights OIHW -> HWIO,
- BatchNorm weight/bias/running_mean/running_var ->
  scale/bias (params) + mean/var (batch_stats).

The relation/skeleton-graph head has no public torch counterpart; conversion
covers the backbone + final layer and leaves head params untouched.

``export_state_dict`` is the exact inverse (flax -> torch-style), used by the
round-trip tests to prove the mapping is a bijection over every backbone
parameter (nothing dropped, nothing double-mapped).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from rsgnet_tpu.config.defaults import Config

# (torch prefix, flax module path) pairs; each expands to conv/bn leaves.


def _blocks(scfg):
    return {"BASIC": ("cb1", "cb2"),
            "BOTTLENECK": ("cb1", "cb2", "cb3")}[scfg.BLOCK]


def hrnet_key_map(cfg: Config) -> List[Tuple[str, Tuple[str, ...], str]]:
    """[(torch_name, flax_path, kind)] for every backbone tensor.

    kind: 'conv' (OIHW weight), 'bn.weight/.bias/.mean/.var', 'bias'.
    """
    extra = cfg.MODEL.EXTRA
    out: List[Tuple[str, Tuple[str, ...], str]] = []

    def conv(tname, fpath):
        out.append((f"{tname}.weight", (*fpath, "conv", "kernel"), "conv"))

    def bn(tname, fpath):
        out.append((f"{tname}.weight", (*fpath, "bn", "scale"), "bn"))
        out.append((f"{tname}.bias", (*fpath, "bn", "bias"), "bn"))
        out.append((f"{tname}.running_mean", (*fpath, "bn", "mean"), "bn_stat"))
        out.append((f"{tname}.running_var", (*fpath, "bn", "var"), "bn_stat"))

    # stem
    conv("conv1", ("stem1",)); bn("bn1", ("stem1",))
    conv("conv2", ("stem2",)); bn("bn2", ("stem2",))
    # layer1: 4 x Bottleneck(64), downsample on block 0
    for b in range(4):
        for ci, cb in enumerate(("cb1", "cb2", "cb3")):
            conv(f"layer1.{b}.conv{ci + 1}", (f"layer1_{b}", cb))
            bn(f"layer1.{b}.bn{ci + 1}", (f"layer1_{b}", cb))
        if b == 0:
            conv(f"layer1.{b}.downsample.0", (f"layer1_{b}", "downsample"))
            bn(f"layer1.{b}.downsample.1", (f"layer1_{b}", "downsample"))

    stages = [extra.STAGE2, extra.STAGE3, extra.STAGE4]
    prev = [256]
    for si, scfg in enumerate(stages, start=2):
        t = si - 1                      # transition index (1-based)
        exp = 4 if scfg.BLOCK == "BOTTLENECK" else 1
        cur = [c * exp for c in scfg.NUM_CHANNELS]
        # transition
        for i, ch in enumerate(cur):
            if i < len(prev):
                if prev[i] != ch:
                    conv(f"transition{t}.{i}.0", (f"transition{t}_{i}",))
                    bn(f"transition{t}.{i}.1", (f"transition{t}_{i}",))
            else:
                steps = i + 1 - len(prev)
                for k in range(steps):
                    conv(f"transition{t}.{i}.{k}.0",
                         (f"transition{t}_{i}_down{k}",))
                    bn(f"transition{t}.{i}.{k}.1",
                       (f"transition{t}_{i}_down{k}",))
        # modules
        cbs = _blocks(scfg)
        for m in range(scfg.NUM_MODULES):
            mod = f"stage{si}_module{m}"
            tmod = f"stage{si}.{m}"
            for b in range(scfg.NUM_BRANCHES):
                for n in range(scfg.NUM_BLOCKS[b]):
                    for ci, cb in enumerate(cbs):
                        conv(f"{tmod}.branches.{b}.{n}.conv{ci + 1}",
                             (mod, f"branch{b}_block{n}", cb))
                        bn(f"{tmod}.branches.{b}.{n}.bn{ci + 1}",
                           (mod, f"branch{b}_block{n}", cb))
            # fusion (last module of stage4 has single-scale output)
            single = (si == 4) and (m == scfg.NUM_MODULES - 1)
            num_out = 1 if single else scfg.NUM_BRANCHES
            if scfg.NUM_BRANCHES > 1:
                for i in range(num_out):
                    for j in range(scfg.NUM_BRANCHES):
                        if j == i:
                            continue
                        if j > i:
                            conv(f"{tmod}.fuse_layers.{i}.{j}.0",
                                 (mod, f"fuse{i}_{j}"))
                            bn(f"{tmod}.fuse_layers.{i}.{j}.1",
                               (mod, f"fuse{i}_{j}"))
                        else:
                            for k in range(i - j):
                                conv(f"{tmod}.fuse_layers.{i}.{j}.{k}.0",
                                     (mod, f"fuse{i}_{j}_down{k}"))
                                bn(f"{tmod}.fuse_layers.{i}.{j}.{k}.1",
                                   (mod, f"fuse{i}_{j}_down{k}"))
        prev = cur

    out.append(("final_layer.weight", ("final_layer", "kernel"), "conv"))
    out.append(("final_layer.bias", ("final_layer", "bias"), "bias"))
    return out


def resnet_key_map(cfg: Config) -> List[Tuple[str, Tuple[str, ...], str]]:
    """[(torch_name, flax_path, kind)] for every pose_resnet tensor.

    Targets the public SimpleBaseline ``pose_resnet`` state_dict naming
    (``conv1``/``bn1``, ``layer{l}.{b}``, ``deconv_layers.{3i}`` sequential
    indices, ``final_layer``); torchvision ImageNet ResNet checkpoints share
    the backbone names, so pretrained init works through the same map.
    kind 'deconv' = torch ConvTranspose2d weight (I, O, kH, kW), converted
    with a spatial flip to the dilated-input conv kernel PoseResNet runs.
    """
    from rsgnet_tpu.models.pose_resnet import RESNET_SPEC
    extra = cfg.MODEL.EXTRA
    block_name, stage_blocks = RESNET_SPEC[extra.NUM_LAYERS]
    out: List[Tuple[str, Tuple[str, ...], str]] = []

    def conv(tname, fpath):
        out.append((f"{tname}.weight", (*fpath, "conv", "kernel"), "conv"))

    def bn(tname, fpath):
        out.append((f"{tname}.weight", (*fpath, "bn", "scale"), "bn"))
        out.append((f"{tname}.bias", (*fpath, "bn", "bias"), "bn"))
        out.append((f"{tname}.running_mean", (*fpath, "bn", "mean"), "bn_stat"))
        out.append((f"{tname}.running_var", (*fpath, "bn", "var"), "bn_stat"))

    conv("conv1", ("stem",)); bn("bn1", ("stem",))

    cbs = ("cb1", "cb2") if block_name == "BASIC" else ("cb1", "cb2", "cb3")
    exp = 1 if block_name == "BASIC" else 4
    in_ch = 64
    for li, num_blocks in enumerate(stage_blocks, start=1):
        feats = 64 * (2 ** (li - 1))
        stride = 1 if li == 1 else 2
        for b in range(num_blocks):
            for ci, cb in enumerate(cbs):
                conv(f"layer{li}.{b}.conv{ci + 1}", (f"layer{li}_{b}", cb))
                bn(f"layer{li}.{b}.bn{ci + 1}", (f"layer{li}_{b}", cb))
            # downsample projection exists exactly when the block created one
            if b == 0 and (stride != 1 or in_ch != feats * exp):
                conv(f"layer{li}.{b}.downsample.0",
                     (f"layer{li}_{b}", "downsample"))
                bn(f"layer{li}.{b}.downsample.1",
                   (f"layer{li}_{b}", "downsample"))
            in_ch = feats * exp

    for i in range(extra.NUM_DECONV_LAYERS):
        # reference deconv head is nn.Sequential(ConvTranspose2d, BN, ReLU)*n
        base = f"deconv_layers.{3 * i}"
        out.append((f"{base}.weight", (f"deconv{i}", "conv", "kernel"),
                    "deconv"))
        if extra.DECONV_WITH_BIAS:
            out.append((f"{base}.bias", (f"deconv{i}", "conv", "bias"),
                        "bias"))
        bn(f"deconv_layers.{3 * i + 1}", (f"deconv{i}",))

    out.append(("final_layer.weight", ("final_layer", "kernel"), "conv"))
    out.append(("final_layer.bias", ("final_layer", "bias"), "bias"))
    return out


def key_map(cfg: Config) -> List[Tuple[str, Tuple[str, ...], str]]:
    """Tensor map for cfg's model family (pose_resnet vs HRNet-backboned)."""
    if cfg.MODEL.NAME == "pose_resnet":
        return resnet_key_map(cfg)
    return hrnet_key_map(cfg)


def _to_flax(v: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(v, (2, 3, 1, 0))            # OIHW -> HWIO
    if kind == "deconv":
        # torch ConvTranspose2d weight (I, O, kH, kW) -> spatially-flipped
        # HWIO kernel of the equivalent dilated-input conv (models/pose_resnet)
        return np.transpose(v, (2, 3, 0, 1))[::-1, ::-1].copy()
    return v


def _to_torch(v: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(v, (3, 2, 0, 1))            # HWIO -> OIHW
    if kind == "deconv":
        return np.transpose(v[::-1, ::-1], (2, 3, 0, 1)).copy()
    return v


def _set(tree: dict, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def convert_state_dict(cfg: Config, torch_sd: Dict[str, np.ndarray],
                       nest_under: str | None = None):
    """torch-style state_dict -> (params, batch_stats) nested updates.

    ``nest_under='backbone'`` wraps for PoseRSGNet's module layout.
    Raises on any unconsumed backbone tensor so silent drops are impossible.
    """
    params: dict = {}
    stats: dict = {}
    consumed = set()
    for tname, fpath, kind in key_map(cfg):
        if tname not in torch_sd:
            raise KeyError(f"missing tensor in torch checkpoint: {tname}")
        v = _to_flax(np.asarray(torch_sd[tname]), kind)
        consumed.add(tname)
        # bn params split: scale/bias into params, mean/var into batch_stats
        is_stat = fpath[-1] in ("mean", "var")
        _set(stats if is_stat else params, fpath, v)
    leftovers = [k for k in torch_sd
                 if k not in consumed and not k.startswith("head")
                 and "num_batches_tracked" not in k]
    if leftovers:
        raise ValueError(f"unmapped torch tensors: {leftovers[:8]}"
                         f"{'...' if len(leftovers) > 8 else ''}")
    if nest_under:
        params = {nest_under: params}
        stats = {nest_under: stats}
    return params, stats


def export_state_dict(cfg: Config, params, batch_stats,
                      nested_under: str | None = None) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_state_dict`` (flax backbone -> torch-style)."""
    if nested_under:
        params = params[nested_under]
        batch_stats = batch_stats[nested_under]
    out = {}
    for tname, fpath, kind in key_map(cfg):
        src = batch_stats if fpath[-1] in ("mean", "var") else params
        out[tname] = _to_torch(np.asarray(_get(src, fpath)), kind)
    return out


def load_pretrained_backbone(cfg: Config, variables, torch_sd,
                             nest_under: str | None = None):
    """Reference ``init_weights`` semantics (SURVEY.md §2.7): initialize the
    backbone from a pretrained torch state_dict (ImageNet-classification
    HRNet or a pose checkpoint), loading only the tensors that exist and
    respecting MODEL.EXTRA.PRETRAINED_LAYERS ('*' = everything available).
    Missing tensors (e.g. final_layer in a classification checkpoint, or a
    classifier head we don't map) are left at their fresh initialization.

    Returns (new_variables, n_loaded_tensors).
    """
    import copy
    allowed = tuple(cfg.MODEL.EXTRA.PRETRAINED_LAYERS)
    load_all = "*" in allowed
    variables = {"params": copy.deepcopy(dict(variables["params"])),
                 "batch_stats": copy.deepcopy(dict(variables["batch_stats"]))}
    n_loaded = 0
    for tname, fpath, kind in key_map(cfg):
        if tname not in torch_sd:
            continue
        root = tname.split(".")[0].rstrip("0123456789") or tname
        if not load_all and tname.split(".")[0] not in allowed \
                and root not in allowed:
            continue
        v = _to_flax(np.asarray(torch_sd[tname]), kind)
        is_stat = fpath[-1] in ("mean", "var")
        tree = variables["batch_stats" if is_stat else "params"]
        if nest_under:
            tree = tree[nest_under]
        cur = _get(tree, fpath)
        if tuple(cur.shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch for {tname}: "
                             f"{cur.shape} vs {v.shape}")
        _set(tree, fpath, v)
        n_loaded += 1
    return variables, n_loaded


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth file (torch is CPU-only in this env; weights_only)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.replace("module.", "", 1) if k.startswith("module.") else k:
            v.numpy() for k, v in sd.items()}
