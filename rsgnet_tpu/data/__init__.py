"""Dataset registry (reference ``lib/dataset/__init__.py`` dispatch,
SURVEY.md §2.12) — an explicit table instead of ``eval()``."""
from __future__ import annotations


def get_dataset(cfg, root=None, image_set=None, is_train=False, **kw):
    from rsgnet_tpu.data.coco import COCODataset
    from rsgnet_tpu.data.crowdpose import CrowdPoseDataset
    from rsgnet_tpu.data.mpii import MPIIDataset
    table = {"coco": COCODataset, "crowdpose": CrowdPoseDataset,
             "mpii": MPIIDataset}
    cls = table[cfg.DATASET.DATASET.lower()]
    root = root if root is not None else cfg.DATASET.ROOT
    if image_set is None:
        image_set = (cfg.DATASET.TRAIN_SET if is_train
                     else cfg.DATASET.TEST_SET)
    return cls(cfg, root, image_set, is_train, **kw)
