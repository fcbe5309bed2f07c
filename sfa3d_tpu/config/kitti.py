"""KITTI dataset constants.

Capability parity with reference config/kitti_config.py:7-88 (class map, BEV
boundary, discretization, dataset-average calibration matrices).

Differences from the reference (deliberate fixes, SURVEY.md section 7.3):
- The reference's CLASS_NAME_TO_ID lacks a 'Car' key (it was retargeted to a
  relabeled dataset using 'Vehicle'), so stock KITTI labels crash. We support
  BOTH: 'Car'/'Van' alias to the Vehicle class id.
"""

import math

import numpy as np

# Class ids: 0=Pedestrian, 1=Car/Vehicle, 2=Cyclist. Negative ids are
# "ignore" categories (same encoding as reference kitti_config.py:7-17:
# -1 = ignore-all-classes DontCare, -3 -> ignore class (-id-2)=1 for Truck).
CLASS_NAME_TO_ID = {
    "Pedestrian": 0,
    "Vehicle": 1,
    "Car": 1,  # stock-KITTI alias (missing in reference; fixed here)
    "Van": 1,  # stock-KITTI alias
    "Cyclist": 2,
    "Truck": -3,
    "Person_sitting": 0,
    "Tram": -99,
    "Misc": -99,
    "DontCare": -1,
}

ID_TO_CLASS_NAME = {0: "Pedestrian", 1: "Car", 2: "Cyclist"}

NUM_CLASSES = 3

# BGR colors per class for drawing (reference kitti_config.py:19-20).
colors = [
    [0, 255, 255],
    [0, 0, 255],
    [255, 0, 0],
    [255, 120, 0],
    [255, 120, 120],
    [0, 120, 0],
    [120, 255, 255],
    [120, 0, 255],
]

# Front BEV detection range in the velodyne frame (meters).
# Reference kitti_config.py:23-30.
boundary = {
    "minX": 0.0,
    "maxX": 50.0,
    "minY": -25.0,
    "maxY": 25.0,
    "minZ": -2.73,
    "maxZ": 1.27,
}

bound_size_x = boundary["maxX"] - boundary["minX"]
bound_size_y = boundary["maxY"] - boundary["minY"]
bound_size_z = boundary["maxZ"] - boundary["minZ"]

# Rear range for the two-sided demo (reference kitti_config.py:36-43).
boundary_back = {
    "minX": -50.0,
    "maxX": 0.0,
    "minY": -25.0,
    "maxY": 25.0,
    "minZ": -2.73,
    "maxZ": 1.27,
}

BEV_WIDTH = 608  # raster columns, across the y axis (-25m .. 25m)
BEV_HEIGHT = 608  # raster rows, across the x axis (0m .. 50m)
DISCRETIZATION = (boundary["maxX"] - boundary["minX"]) / BEV_HEIGHT

# Voxel parameters (reference kitti_config.py:49-60; kept for parity even
# though the BEV pipeline does not consume them).
T = 35
vd, vh, vw = 0.1, 0.05, 0.05
W = math.ceil(bound_size_x / vw)
H = math.ceil(bound_size_y / vh)
D = math.ceil(bound_size_z / vd)

# Dataset-average calibration matrices (reference kitti_config.py:64-87),
# used when no per-frame calibration file is given.
Tr_velo_to_cam = np.array(
    [
        [7.49916597e-03, -9.99971248e-01, -8.65110297e-04, -6.71807577e-03],
        [1.18652889e-02, 9.54520517e-04, -9.99910318e-01, -7.33152811e-02],
        [9.99882833e-01, 7.49141178e-03, 1.18719929e-02, -2.78557062e-01],
        [0, 0, 0, 1],
    ]
)

R0 = np.array(
    [
        [0.99992475, 0.00975976, -0.00734152, 0],
        [-0.0097913, 0.99994262, -0.00430371, 0],
        [0.00729911, 0.0043753, 0.99996319, 0],
        [0, 0, 0, 1],
    ]
)

P2 = np.array(
    [
        [719.787081, 0.0, 608.463003, 44.9538775],
        [0.0, 719.787081, 174.545111, 0.1066855],
        [0.0, 0.0, 1.0, 3.0106472e-03],
        [0.0, 0.0, 0.0, 0],
    ]
)

R0_inv = np.linalg.inv(R0)
Tr_velo_to_cam_inv = np.linalg.inv(Tr_velo_to_cam)
P2_inv = np.linalg.pinv(P2)

# Fixed-shape budgets for the padded point tensors fed to the device BEV
# rasterizer. KITTI velodyne scans have ~120k points; the front-range filter
# typically keeps 15-25k. TPU-native addition (no reference analog: the
# reference uses ragged numpy arrays). Scatter cost is linear in the padded
# length, so pre-filtered paths use the smaller budget.
MAX_POINTS = 65536  # raw, unfiltered scans (device does the filtering)
MAX_POINTS_FILTERED = 32768  # host-prefiltered scans
