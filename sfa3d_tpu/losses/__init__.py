from sfa3d_tpu.losses.losses import (
    focal_loss,
    masked_l1_loss,
    balanced_l1_loss,
    compute_loss,
)

__all__ = ["focal_loss", "masked_l1_loss", "balanced_l1_loss", "compute_loss"]
