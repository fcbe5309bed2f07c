"""Configuration layer: dataset constants and the typed training config tree.

Replaces the reference's module-level constant files (config/kitti_config.py,
config/argoverse_config.py) and its argparse->easydict flag surface
(config/train_config.py) with frozen dataclasses that are hashable, so they
can be closed over by jit as static configuration.
"""

from sfa3d_tpu.config import kitti, argoverse
from sfa3d_tpu.config.train import TrainConfig, parse_train_configs

__all__ = ["kitti", "argoverse", "TrainConfig", "parse_train_configs"]
