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


def init_variables(model, rng, x, train: bool = False):
    """``model.init`` as ONE jitted program.

    Eager flax init dispatches every layer op individually; on a tunneled
    TPU backend each tiny dispatch pays a remote-compile round trip
    (~0.4-0.5 s x hundreds of ops = minutes of startup, measured round 4 —
    BENCH_NOTES), and the per-op programs sit below the persistent-cache
    write threshold. One jitted init compiles once and is a cache load on
    every later run. Same math, same RNG streams (path-keyed fold-ins).
    """
    import jax as _jax
    return _jax.jit(model.init, static_argnames=("train",))(rng, x,
                                                            train=train)


__all__ = ["get_pose_net", "init_variables", "PoseHighResolutionNet",
           "PoseResNet", "PoseRSGNet"]
