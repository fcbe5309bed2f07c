"""Geometry & calibration layer.

Vectorized (vmap/jit-friendly) coordinate transforms replacing the
reference's per-box Python loops (data_process/transformation.py), plus
host-side calibration file parsing (data_process/kitti_data_utils.py:94-173,
data_process/ref_calib.py).
"""

from sfa3d_tpu.geometry.transforms import (
    camera_to_lidar_points,
    lidar_to_camera_points,
    camera_to_lidar_box,
    lidar_to_camera_box,
    center_to_corner_box3d,
    corner_to_center_box3d,
    point_transform,
    box_transform,
    inverse_rigid_trans,
    project_to_image,
)
from sfa3d_tpu.geometry.se3 import SE3, quat2rotmat, yaw_from_quaternion
from sfa3d_tpu.geometry.calibration import KittiCalibration

__all__ = [
    "camera_to_lidar_points",
    "lidar_to_camera_points",
    "camera_to_lidar_box",
    "lidar_to_camera_box",
    "center_to_corner_box3d",
    "corner_to_center_box3d",
    "point_transform",
    "box_transform",
    "inverse_rigid_trans",
    "project_to_image",
    "SE3",
    "quat2rotmat",
    "yaw_from_quaternion",
    "KittiCalibration",
]
