"""Run-dir + logger creation (reference ``lib/utils/utils.py::create_logger``,
SURVEY.md §2.19/§5.5): timestamped output/log directories laid out as
``{OUTPUT_DIR}/{dataset}/{model}/{cfg_name}/`` and
``{LOG_DIR}/{dataset}/{model}/{cfg_name}_{timestamp}.log``, console + file
handlers, plus a small metric-meter used by the train/val loops."""
from __future__ import annotations

import logging
import os
import time
from pathlib import Path


def create_logger(cfg, cfg_name: str, phase: str = "train", rank: int = 0):
    """Returns (logger, final_output_dir, tb_log_dir).

    ``rank`` (multi-host runs): process 0 owns the file handler, the INFO
    console stream, and the tb dir; other ranks get a console-only logger at
    WARNING with a ``[p{rank}]`` prefix so per-step chatter isn't duplicated
    N× but real problems from any host still surface — and they create no
    directories under LOG_DIR (the per-minute timestamp would litter the
    shared filesystem with empty dirs; fit() ignores tb_dir off rank 0).
    """
    root = Path(cfg.OUTPUT_DIR)
    dataset = cfg.DATASET.DATASET
    model = cfg.MODEL.NAME
    cfg_name = os.path.basename(cfg_name).split(".")[0]
    final_output_dir = root / dataset / model / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)

    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = f"{cfg_name}_{time_str}_{phase}.log"
    tb_log_dir = Path(cfg.LOG_DIR) / dataset / model / \
        f"{cfg_name}_{time_str}"
    if rank == 0:
        tb_log_dir.mkdir(parents=True, exist_ok=True)

    logger = logging.getLogger(f"rsgnet.{phase}")
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    logger.handlers.clear()
    prefix = "" if rank == 0 else f"[p{rank}] "
    fmt = logging.Formatter(f"%(asctime)-15s {prefix}%(message)s")
    if rank == 0:
        fh = logging.FileHandler(str(final_output_dir / log_file))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    logger.propagate = False
    return logger, str(final_output_dir), str(tb_log_dir)


class AverageMeter:
    """Running average (reference core/function.py meters)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0
