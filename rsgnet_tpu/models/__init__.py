"""Model registry — the reference's ``models.<NAME>.get_pose_net(cfg)``
dispatch (SURVEY.md §2.7/§2.8) as an explicit table."""
from __future__ import annotations

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.models.hrnet import PoseHighResolutionNet
from rsgnet_tpu.models.pose_resnet import PoseResNet
from rsgnet_tpu.models.pose_rsgnet import PoseRSGNet


def get_pose_net(cfg: Config):
    """Build the flax module named by cfg.MODEL.NAME.

    `pose_hrnet`  -> plain HRNet backbone + 1x1 heatmap head.
    `pose_resnet` -> SimpleBaseline ResNet backbone + deconv head.
    `pose_rsgnet` -> HRNet backbone + relation/skeleton-graph head
                     (also selected when MODEL.RSG.ENABLED is set).
    """
    name = cfg.MODEL.NAME
    if name == "pose_resnet":
        if cfg.MODEL.RSG.ENABLED:
            raise ValueError("MODEL.RSG.ENABLED requires the HRNet backbone's"
                             " high-res features; unset it or use "
                             "MODEL.NAME=pose_rsgnet")
        return PoseResNet(cfg=cfg)
    if name == "pose_rsgnet" or cfg.MODEL.RSG.ENABLED:
        return PoseRSGNet(cfg=cfg)
    if name == "pose_hrnet":
        return PoseHighResolutionNet(cfg=cfg)
    raise KeyError(f"unknown MODEL.NAME: {name}")


__all__ = ["get_pose_net", "PoseHighResolutionNet", "PoseResNet",
           "PoseRSGNet"]
