"""Device-side ops: BEV rasterization, target generation, peak decode,
IoU/NMS/fusion kernels. Everything here is fixed-shape, masked, and
jit/vmap-compatible; the hot paths have Pallas TPU implementations.
"""

from sfa3d_tpu.ops.bev import make_bev_map, filter_and_pad_points, points_to_bev
from sfa3d_tpu.ops.targets import build_targets, compute_radius
from sfa3d_tpu.ops.decode import heat_nms, topk_detections, decode, post_processing, detections_to_real

__all__ = [
    "make_bev_map",
    "filter_and_pad_points",
    "points_to_bev",
    "build_targets",
    "compute_radius",
    "heat_nms",
    "topk_detections",
    "decode",
    "post_processing",
    "detections_to_real",
]
