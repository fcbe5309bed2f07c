from sfa3d_tpu.eval.kitti_eval import (
    evaluate_kitti_ap,
    evaluate_kitti_ap_by_difficulty,
)

__all__ = ["evaluate_kitti_ap", "evaluate_kitti_ap_by_difficulty"]
