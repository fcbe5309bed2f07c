"""Dataset-agnostic 3D box -> BEV projection and matplotlib drawing.

Parity with reference data_process/bev_projection_utils.py (z-up yaw corner
builder :5-37, drop-z projection :40-52, matplotlib draw_bev_boxes :55-184)
and its synthetic-data driver data_process/main_script.py (the
`example_usage_bev_projection` end-to-end demo with SE3 lidar->ego motion).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from sfa3d_tpu.geometry.se3 import SE3
from sfa3d_tpu.geometry.transforms import center_to_corner_box3d


def get_3d_box_corners(box7: np.ndarray) -> np.ndarray:
    """(7,) [x, y, z, h, w, l, yaw] z-up box -> (8, 3) corners
    (bev_projection_utils.py:5-37)."""
    return np.asarray(center_to_corner_box3d(np.asarray(box7, np.float64)[None]))[0]


def project_box_to_bev(corners3d: np.ndarray) -> np.ndarray:
    """(8, 3) -> (4, 2) bottom-face BEV polygon (drop z,
    bev_projection_utils.py:40-52)."""
    return np.asarray(corners3d)[:4, :2]


def draw_bev_boxes(
    points: np.ndarray,
    boxes7: Sequence[np.ndarray],
    save_path: Optional[str] = None,
    boundary: Optional[Dict[str, float]] = None,
    title: str = "BEV projection",
):
    """Scatter the cloud + draw box polygons with heading arrows
    (bev_projection_utils.py:55-184). Returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=0.3, c=pts[:, 2], cmap="viridis", alpha=0.5)
    for box in boxes7:
        poly = project_box_to_bev(get_3d_box_corners(box))
        closed = np.vstack([poly, poly[:1]])
        ax.plot(closed[:, 0], closed[:, 1], "r-", linewidth=1.5)
        cx, cy, yaw = box[0], box[1], box[6]
        ax.arrow(cx, cy, 1.5 * np.cos(yaw), 1.5 * np.sin(yaw),
                 head_width=0.4, color="lime")
    if boundary:
        ax.set_xlim(boundary["minX"], boundary["maxX"])
        ax.set_ylim(boundary["minY"], boundary["maxY"])
    ax.set_aspect("equal")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def example_usage_bev_projection(save_path: Optional[str] = None, seed: int = 0):
    """Synthetic end-to-end demo: random cloud + boxes, lidar->ego SE3
    motion, BEV drawing (bev_projection_utils.py:187-262 +
    main_script.py:12-84 dummy-fixture flow)."""
    from sfa3d_tpu.data.synthetic import synthetic_scene

    points, labels = synthetic_scene(seed=seed, n_objects=6)
    lidar_T_ego = SE3.from_quaternion([1.0, 0.0, 0.0, 0.0], np.array([1.35, 0.0, 1.68]))
    points_ego = lidar_T_ego.transform_point_cloud(points[:, :3])
    boxes = []
    for row in labels:
        b = row[1:8].astype(np.float64).copy()
        b[6] = -row[7]  # stored as -yaw (see synthetic_scene)
        b[:3] = lidar_T_ego.transform_point_cloud(b[None, :3])[0]
        boxes.append(b)
    return draw_bev_boxes(
        np.hstack([points_ego, points[:, 3:4]]), boxes, save_path,
        boundary={"minX": -10, "maxX": 60, "minY": -30, "maxY": 30},
        title="synthetic BEV projection (ego frame)",
    )
