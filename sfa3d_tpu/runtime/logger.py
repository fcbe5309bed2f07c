"""Logging & metrics observability.

Parity with reference utils/logger.py (file+console logging), utils/misc.py
(AverageMeter/ProgressMeter/time_synchronized), and the TensorBoard surface
(train.py:95,167-168,238-241) via tensorboardX.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional


class Logger:
    """File + console logger (utils/logger.py:27-49)."""

    def __init__(self, logs_dir: str, saved_fn: str):
        os.makedirs(logs_dir, exist_ok=True)
        logger = logging.getLogger(f"sfa3d_tpu.{saved_fn}")
        logger.setLevel(logging.INFO)
        logger.handlers.clear()
        fmt = logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
        )
        fh = logging.FileHandler(os.path.join(logs_dir, f"logger_{saved_fn}.txt"))
        fh.setFormatter(fmt)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(fh)
        logger.addHandler(sh)
        self._logger = logger

    def info(self, msg: str):
        self._logger.info(msg)

    def warning(self, msg: str):
        self._logger.warning(msg)


class AverageMeter:
    """Running average tracker (utils/misc.py:22-44)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(1, self.count)

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    """Formatted per-batch progress lines (utils/misc.py:47-66)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        num_digits = len(str(num_batches // 1))
        self.batch_fmtstr = "[{:" + str(num_digits) + "d}/" + f"{num_batches}]"
        self.meters = meters
        self.prefix = prefix

    def get_message(self, batch: int) -> str:
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        return "\t".join(entries)


def time_synchronized() -> float:
    """Device-synchronized wall clock (utils/misc.py:69-71). On TPU there is
    nothing to flush eagerly; callers time compiled steps by forcing a
    scalar fetch (see bench.py) — this keeps the reference API shape."""
    return time.time()


def create_tb_writer(logs_dir: str):
    """SummaryWriter -> logs_dir/tensorboard (train.py:95); returns None when
    tensorboardX is unavailable."""
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        return None
    return SummaryWriter(logdir=os.path.join(logs_dir, "tensorboard"))
