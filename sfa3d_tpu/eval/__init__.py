from sfa3d_tpu.eval.kitti_eval import evaluate_kitti_ap

__all__ = ["evaluate_kitti_ap"]
