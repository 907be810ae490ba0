"""Config shared by the multi-process fit() worker and its parent test —
must be IDENTICAL in both topologies for the equivalence assertion to hold.
SGD keeps the cross-topology reduction noise linear (see worker_dp_common)."""
from rsgnet_tpu.config.defaults import tiny_rsgnet


def make_fit_cfg():
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.TEST_SET = "val"
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1      # 8 global devices -> batch 8
    cfg.TEST.BATCH_SIZE_PER_GPU = 1
    cfg.PRINT_FREQ = 1
    return cfg
