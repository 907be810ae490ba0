"""RSGNet = HRNet backbone + relation/skeleton-graph refinement head.

The flagship model (BASELINE.json configs 1-5). Forward returns the refined
heatmaps; with ``return_aux=True`` it also returns the pre-refinement initial
heatmaps for the auxiliary supervision term used in training.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models.hrnet import PoseHighResolutionNet
from rsgnet_tpu.models.rsgnet_head import RSGHead


class PoseRSGNet(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        self.backbone = PoseHighResolutionNet(cfg=cfg, name="backbone")
        spec = get_spec(cfg.DATASET.DATASET)
        assert spec.num_joints == cfg.MODEL.NUM_JOINTS, (
            f"dataset {spec.name} has {spec.num_joints} joints, config says "
            f"{cfg.MODEL.NUM_JOINTS}")
        dtype = jnp.bfloat16 if cfg.DTYPE == "bfloat16" else jnp.float32
        self.head = RSGHead(
            num_joints=cfg.MODEL.NUM_JOINTS,
            adjacency=spec.adjacency(),
            node_channels=cfg.MODEL.RSG.NODE_CHANNELS,
            relation_channels=cfg.MODEL.RSG.RELATION_CHANNELS,
            gcn_layers=cfg.MODEL.RSG.GCN_LAYERS,
            refine_blocks=cfg.MODEL.RSG.REFINE_BLOCKS,
            dtype=dtype, name="rsg_head")

    def __call__(self, x, train: bool = False, return_aux: bool = False):
        initial, feats = self.backbone(x, train=train, return_features=True)
        final, initial = self.head(feats, initial, train=train)
        if return_aux:
            return final, initial
        return final
