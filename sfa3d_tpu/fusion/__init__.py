"""Camera-LiDAR late-fusion layer.

The reference implements fusion as O(N^2) Python dict/list loops
(test4.py/test5.py/test6.py). Here the same algorithms are fixed-K masked
array programs (greedy loops become bounded lax.fori_loop), so the whole
fusion cascade jits and batches:

- pairwise IoU matrices                 (fusion/iou.py)
- 3D detections -> camera 2D AABBs      (fusion/boxes2d.py)
- hard / soft(Gaussian) NMS             (fusion/nms.py)
- union+NMS, confidence-weighted, and Bayesian inverse-variance fusion
                                        (fusion/fuse.py)
"""

# one capacity constant for YOLO detection slots, shared by the host
# per-frame pipeline (fusion/pipeline.py) and the batched jit pipeline
# (fusion/batch.py) so the two implementations of the same cascade agree
DEFAULT_MAX_YOLO = 64

from sfa3d_tpu.fusion.iou import pairwise_iou_xywh, iou_xywh
from sfa3d_tpu.fusion.boxes2d import project_boxes_to_image
from sfa3d_tpu.fusion.nms import hard_nms, soft_nms_gaussian
from sfa3d_tpu.fusion.fuse import (
    DetectionSet,
    filter_by_confidence,
    greedy_match,
    fuse_weighted,
    fuse_bayesian,
    fuse_union_nms,
    confidence_to_variance,
    fuse_gaussian_parameters,
)

__all__ = [
    "DetectionSet",
    "filter_by_confidence",
    "pairwise_iou_xywh",
    "iou_xywh",
    "project_boxes_to_image",
    "hard_nms",
    "soft_nms_gaussian",
    "greedy_match",
    "fuse_weighted",
    "fuse_bayesian",
    "fuse_union_nms",
    "confidence_to_variance",
    "fuse_gaussian_parameters",
]
