"""Dynamic calibration / SLAM-simulation layer.

Covers the reference's slam.py / msac.py / stereo_calibration_yolo.py
capabilities: pluggable calibration sources (static KITTI vs. simulated
visual / LiDAR / visual-inertial SLAM with frame-indexed drift), RANSAC PnP
pose estimation, and targetless stereo self-calibration. Where the reference
calls cv2.solvePnP / cv2.findFundamentalMat / cv2.recoverPose, the
estimators here are batched JAX programs (fixed-iteration RANSAC with
vectorized hypothesis solves) — only ORB feature extraction stays on the
host.
"""

from sfa3d_tpu.slam.calib_sources import get_calibration_from_slam, SLAM_METHODS
from sfa3d_tpu.slam.pnp import ransac_pnp
from sfa3d_tpu.slam.epipolar import (
    estimate_fundamental_ransac,
    essential_from_fundamental,
    recover_pose,
    triangulate_points,
)

__all__ = [
    "get_calibration_from_slam",
    "SLAM_METHODS",
    "ransac_pnp",
    "estimate_fundamental_ransac",
    "essential_from_fundamental",
    "recover_pose",
    "triangulate_points",
]
