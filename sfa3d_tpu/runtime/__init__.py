"""Training runtime utilities: LR/momentum schedules, optimizers,
checkpointing, logging, meters — the TPU-side of reference utils/."""

from sfa3d_tpu.runtime.schedules import create_lr_schedule, create_momentum_schedule, create_optimizer

__all__ = ["create_lr_schedule", "create_momentum_schedule", "create_optimizer"]
