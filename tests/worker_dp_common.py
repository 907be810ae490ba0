"""Shared fixture between the multi-process DP worker and the parent test:
the config and the deterministic global batch must be IDENTICAL in both
topologies for the numeric-equivalence assertion to mean anything."""
import numpy as np

from rsgnet_tpu.config.defaults import tiny_rsgnet

BATCH = 16
SRC = 96
K = 17


def make_cfg():
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = K
    # SGD: the parameter delta is linear in the gradient, so cross-topology
    # reduction-order noise stays at fp32 tolerance (Adam's rsqrt amplifies
    # 1e-10 differences on near-zero coordinates into LR-sized flips).
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.DATASET.SCALE_FACTOR = 0.0
    cfg.DATASET.ROT_FACTOR = 0.0
    cfg.DATASET.FLIP = False
    cfg.DATASET.PROB_HALF_BODY = 0.0
    return cfg


def make_global_batch():
    rng = np.random.RandomState(42)
    return {
        "image": rng.randint(0, 256, (BATCH, SRC, SRC, 3)).astype(np.uint8),
        "joints": rng.uniform(20, 76, (BATCH, K, 2)).astype(np.float32),
        "joints_vis": np.ones((BATCH, K), np.float32),
        "center": rng.uniform(40, 56, (BATCH, 2)).astype(np.float32),
        "scale": np.full((BATCH, 2), 0.35, np.float32),
    }
