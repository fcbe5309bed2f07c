"""Coordinate transforms between camera-rect and velodyne frames.

Behavior parity with reference data_process/transformation.py (the
camera<->lidar point/box transforms :35-107, the corner converters :120-239,
rigid transforms :242-310), but expressed as batched `(N, .)` array math that
works identically under numpy and jax.numpy and composes with vmap/jit.

Conventions (KITTI):
- velodyne frame: x forward, y left, z up; box yaw `rz` about +z.
- camera-rect frame: x right, y down, z forward; box yaw `ry` about +y.
- yaw convention between frames: rz = -ry - pi/2 (transformation.py:93,104).
- 7-DOF boxes are rows of (x, y, z, h, w, l, yaw).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sfa3d_tpu.config import kitti as cnf


def _xp(a):
    """Pick the array namespace of `a` so functions work on numpy or jax."""
    return jnp if isinstance(a, jnp.ndarray) else np


def _homogeneous(points, xp):
    return xp.concatenate(
        [points, xp.ones_like(points[..., :1])], axis=-1
    )


def _default_mats(V2C, R0, xp):
    if V2C is None or R0 is None:
        return xp.asarray(cnf.Tr_velo_to_cam[:3]), xp.asarray(cnf.R0[:3, :3])
    V2C = xp.asarray(V2C)[:3]
    R0 = xp.asarray(R0)
    R0 = R0[:3, :3]
    return V2C, R0


def inverse_rigid_trans(Tr):
    """Invert a (3,4) [R|t] rigid transform (transformation.py:303-310)."""
    xp = _xp(Tr)
    R = Tr[:3, :3]
    t = Tr[:3, 3]
    Rt = xp.swapaxes(R, -1, -2)
    return xp.concatenate([Rt, (-Rt @ t)[..., None]], axis=-1)


def lidar_to_camera_points(points, V2C=None, R0=None):
    """(N,3) velodyne -> (N,3) camera-rect (transformation.py:73-85)."""
    xp = _xp(points)
    V2C, R0 = _default_mats(V2C, R0, xp)
    p = _homogeneous(points[..., :3], xp)  # (N,4)
    p = p @ V2C.T  # (N,3) ref-camera frame
    return p @ R0.T


def camera_to_lidar_points(points, V2C=None, R0=None):
    """(N,3) camera-rect -> (N,3) velodyne (transformation.py:35-47,62-70)."""
    xp = _xp(points)
    V2C, R0 = _default_mats(V2C, R0, xp)
    R0_inv = xp.swapaxes(R0, -1, -2)  # rotation: inverse == transpose
    p = points[..., :3] @ R0_inv.T  # undo rectification
    C2V = inverse_rigid_trans(V2C)
    p = _homogeneous(p, xp)
    return p @ C2V.T


def camera_to_lidar_box(boxes, V2C=None, R0=None, P2=None):
    """(N,7) camera boxes (x,y,z,h,w,l,ry) -> velodyne (x,y,z,h,w,l,rz).

    Parity: transformation.py:88-96 (rz = -ry - pi/2).
    """
    xp = _xp(boxes)
    xyz = camera_to_lidar_points(boxes[..., 0:3], V2C, R0)
    rz = -boxes[..., 6:7] - np.pi / 2
    return xp.concatenate([xyz, boxes[..., 3:6], rz], axis=-1)


def lidar_to_camera_box(boxes, V2C=None, R0=None, P2=None):
    """(N,7) velodyne boxes -> camera boxes (transformation.py:99-107)."""
    xp = _xp(boxes)
    xyz = lidar_to_camera_points(boxes[..., 0:3], V2C, R0)
    ry = -boxes[..., 6:7] - np.pi / 2
    return xp.concatenate([xyz, boxes[..., 3:6], ry], axis=-1)


# Unit box corner template in the velodyne frame: bottom face first
# (z=0..h with the box origin at the bottom center), matching
# transformation.py:135-138 corner ordering.
_CORNER_TEMPLATE = np.array(
    [
        [-0.5, +0.5, 0.0],
        [-0.5, -0.5, 0.0],
        [+0.5, -0.5, 0.0],
        [+0.5, +0.5, 0.0],
        [-0.5, +0.5, 1.0],
        [-0.5, -0.5, 1.0],
        [+0.5, -0.5, 1.0],
        [+0.5, +0.5, 1.0],
    ]
)  # columns scale (l, w, h)


def center_to_corner_box3d(boxes):
    """(N,7) velodyne boxes -> (N,8,3) corners (transformation.py:120-154).

    The reference loops over boxes; here the rotation is a single batched
    einsum, so it vmaps/jits cleanly on device.
    """
    xp = _xp(boxes)
    h, w, l = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    yaw = boxes[..., 6]
    template = xp.asarray(_CORNER_TEMPLATE)
    # scale template: x by l, y by w, z by h
    scale = xp.stack([l, w, h], axis=-1)  # (N,3)
    corners = template[None, :, :] * scale[:, None, :]  # (N,8,3)
    c, s = xp.cos(yaw), xp.sin(yaw)
    zeros, ones = xp.zeros_like(c), xp.ones_like(c)
    rot = xp.stack(
        [
            xp.stack([c, -s, zeros], axis=-1),
            xp.stack([s, c, zeros], axis=-1),
            xp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )  # (N,3,3)
    corners = xp.einsum("nij,nkj->nki", rot, corners)
    return corners + boxes[..., None, 0:3]


def corner_to_center_box3d(corners):
    """(N,8,3) velodyne corners -> (N,7) boxes.

    Average-variant parity with transformation.py:160-202 / kitti_data_utils
    box3d_corners_to_center (averaged edge lengths and edge-angle yaw),
    expressed for the velodyne-frame corner ordering produced by
    center_to_corner_box3d above.
    """
    xp = _xp(corners)
    xyz_bottom = xp.mean(corners[..., :4, :2], axis=-2)  # (N,2)
    z = xp.mean(corners[..., :4, 2], axis=-1)
    h = xp.abs(xp.mean(corners[..., 4:, 2] - corners[..., :4, 2], axis=-1))

    def edge(a, b):
        return xp.sqrt(
            xp.sum((corners[..., a, :2] - corners[..., b, :2]) ** 2, axis=-1)
        )

    w = (edge(0, 1) + edge(2, 3) + edge(4, 5) + edge(6, 7)) / 4.0
    l = (edge(0, 3) + edge(1, 2) + edge(4, 7) + edge(5, 6)) / 4.0

    def yaw_edge(a, b):
        d = corners[..., b, :2] - corners[..., a, :2]
        return xp.arctan2(d[..., 1], d[..., 0])

    # Length edges point along the box x axis (yaw direction).
    yaw = (
        yaw_edge(1, 2) + yaw_edge(0, 3) + yaw_edge(5, 6) + yaw_edge(4, 7)
    ) / 4.0
    return xp.stack(
        [xyz_bottom[..., 0], xyz_bottom[..., 1], z, h, w, l, yaw], axis=-1
    )


def point_transform(points, tx, ty, tz, rx=0.0, ry=0.0, rz=0.0):
    """Translate then rotate points (N,3) (transformation.py:242-285).

    Matches the reference's row-vector convention: p' = (p + t) @ Rx @ Ry @ Rz
    where each R is the reference's right-multiplied matrix.
    """
    xp = _xp(points)
    p = points[..., :3] + xp.asarray([tx, ty, tz])

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return xp.asarray([[1, 0, 0], [0, c, -s], [0, s, c]])

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return xp.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rot_z(a):
        c, s = np.cos(a), np.sin(a)
        return xp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    # Reference multiplies row vectors on the right by these matrices.
    if not np.isscalar(rx) or rx != 0:
        p = p @ rot_x(rx)
    if not np.isscalar(ry) or ry != 0:
        p = p @ rot_y(ry)
    if not np.isscalar(rz) or rz != 0:
        p = p @ rot_z(rz)
    return p


def box_transform(boxes, tx, ty, tz, r=0.0):
    """Rigid-transform velodyne boxes via their corners
    (transformation.py:288-300): center->corners, transform, corners->center.
    """
    corners = center_to_corner_box3d(boxes)
    xp = _xp(boxes)
    flat = corners.reshape(-1, 3)
    flat = point_transform(flat, tx, ty, tz, rz=r)
    corners = flat.reshape(corners.shape)
    out = corner_to_center_box3d(corners)
    # Preserve untouched entries exactly (h is invariant under rigid motion).
    return xp.concatenate([out[..., :3], boxes[..., 3:6], out[..., 6:7]], axis=-1)


def project_to_image(pts_3d, P):
    """(N,3) camera-rect points -> (N,2) pixels via 3x4 P
    (utils/visualization_utils.py:44-52)."""
    xp = _xp(pts_3d)
    p = _homogeneous(pts_3d, xp) @ xp.asarray(P).T  # (N,3)
    return p[..., :2] / p[..., 2:3]


def compute_box_3d_camera(box, P=None):
    """Camera-frame 8 corners of one (x,y,z,h,w,l,ry) box
    (utils/visualization_utils.py:27-41): origin at bottom center, y down.
    Returns (8,3) camera points (and (8,2) pixels when P is given)."""
    xp = _xp(box)
    x, y, z, h, w, l, ry = [box[..., i] for i in range(7)]
    c, s = xp.cos(ry), xp.sin(ry)
    x_c = xp.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], axis=-1)
    y_c = xp.stack([xp.zeros_like(h)] * 4 + [-h] * 4, axis=-1)
    z_c = xp.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], axis=-1)
    cx = c[..., None] * x_c + s[..., None] * z_c + x[..., None]
    cy = y_c + y[..., None]
    cz = -s[..., None] * x_c + c[..., None] * z_c + z[..., None]
    corners = xp.stack([cx, cy, cz], axis=-1)  # (...,8,3)
    if P is None:
        return corners
    return corners, project_to_image(corners, P)
