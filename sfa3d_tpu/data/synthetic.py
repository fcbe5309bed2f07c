"""Synthetic KITTI-like scene generator.

The only self-contained no-data path in the reference is
data_process/main_script.py:12-76 (random lidar + boxes + a dummy
calibration.json). This module generalizes that: structured synthetic scenes
(ground plane + walls + car-like box clusters with matching labels) with
realistic point counts, used by the benchmark harness and tests so the whole
framework runs without the KITTI download.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from sfa3d_tpu.config import kitti as cnf


def _box_surface_points(rng, h, w, l, x, y, z, yaw, m):
    """Surface-ish samples of one box in the velodyne frame, (m, 4) f32.
    MUST keep the exact rng call sequence of the original inline code —
    synthetic_scene's fixtures are pinned byte-for-byte by seeds recorded
    in parity/bench artifacts."""
    local = np.empty((m, 3), np.float32)
    local[:, 0] = rng.uniform(-l / 2, l / 2, m)
    local[:, 1] = rng.uniform(-w / 2, w / 2, m)
    local[:, 2] = rng.uniform(0, h, m)
    face = rng.integers(0, 3, m)
    local[face == 0, 0] = np.sign(local[face == 0, 0]) * l / 2
    local[face == 1, 1] = np.sign(local[face == 1, 1]) * w / 2
    local[face == 2, 2] = h * (local[face == 2, 2] > h / 2)
    # ~2 cm z noise (Velodyne-class range accuracy): real sensors never
    # emit bit-identical heights; the exact-duplicate z values the
    # face-pinning creates would otherwise make raster tie-breaking
    # (reference: exact-max-z point; ours: max intensity within the
    # 0.5 mm quantization bucket) visible on hundreds of pixels per frame
    local[:, 2] += rng.uniform(-0.02, 0.02, m)
    c, s = np.cos(yaw), np.sin(yaw)
    pts = np.empty((m, 4), np.float32)
    pts[:, 0] = c * local[:, 0] - s * local[:, 1] + x
    pts[:, 1] = s * local[:, 0] + c * local[:, 1] + y
    pts[:, 2] = local[:, 2] + z
    # Front/back asymmetry (like real vehicles): intensity rises toward
    # the local +x (front) face. Without it a box's point cloud is
    # IDENTICAL under yaw -> yaw+pi, the (sin, cos) direction targets
    # for visually-equal scenes contradict each other, and a trained
    # direction head collapses to ~0 (= random yaw; found by the round-3
    # generalization run: centers/dims/class learned, yaw uniform).
    frontness = local[:, 0] / l + 0.5  # 0 at rear face, 1 at front
    pts[:, 3] = np.clip(
        rng.uniform(0.15, 0.35, m) + 0.55 * frontness, 0.0, 1.0
    )
    return pts


def synthetic_scene(
    seed: int = 0,
    n_ground: int = 20000,
    n_clutter: int = 6000,
    n_objects: int = 12,
    points_per_object: int = 800,
    range_falloff: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    # Defaults sized so the front-range filter keeps ~25-30k points —
    # matching real KITTI scans (raw ~120k, in-range 15-25k) and fitting the
    # MAX_POINTS_FILTERED padding budget without silent truncation.
    """Returns (points (N,4) float32 velodyne, labels (M,8) float32 rows
    [cls, x, y, z, h, w, l, yaw(velodyne rz)]).

    range_falloff > 0 scales each object's point count by the LiDAR
    1/r^2 return density, full density at r = range_falloff meters
    (floor 64 points) — far objects then carry genuinely fewer returns,
    so the KITTI Easy/Moderate/Hard buckets discriminate on this data.
    OFF by default: enabling it changes the rng call sequence, and the
    default scenes are pinned byte-for-byte by seeds recorded in
    parity/bench artifacts."""
    rng = np.random.default_rng(seed)

    ground = np.empty((n_ground, 4), np.float32)
    r = np.sqrt(rng.uniform(0.02, 1.0, n_ground))  # radial density falloff
    theta = rng.uniform(-np.pi, np.pi, n_ground)
    ground[:, 0] = r * 60.0 * np.abs(np.cos(theta))
    ground[:, 1] = r * 40.0 * np.sin(theta)
    ground[:, 2] = rng.normal(-1.73, 0.05, n_ground)
    ground[:, 3] = rng.uniform(0.0, 0.4, n_ground)

    clutter = np.empty((n_clutter, 4), np.float32)
    clutter[:, 0] = rng.uniform(-10, 60, n_clutter)
    clutter[:, 1] = rng.uniform(-30, 30, n_clutter)
    clutter[:, 2] = rng.uniform(-1.7, 1.2, n_clutter)
    clutter[:, 3] = rng.uniform(0, 1, n_clutter)

    dims_by_class = {
        0: (1.76, 0.66, 0.84),  # Pedestrian h,w,l
        1: (1.52, 1.63, 3.88),  # Car
        2: (1.73, 0.60, 1.76),  # Cyclist
    }
    obj_points = []
    labels = []
    for _ in range(n_objects):
        cls = int(rng.integers(0, 3))
        h, w, l = dims_by_class[cls]
        h *= rng.uniform(0.9, 1.1)
        w *= rng.uniform(0.9, 1.1)
        l *= rng.uniform(0.9, 1.1)
        x = rng.uniform(5, 45)
        y = rng.uniform(-20, 20)
        z = -1.73
        yaw = rng.uniform(-np.pi, np.pi)
        m = points_per_object
        if range_falloff > 0.0:
            r = float(np.hypot(x, y))
            m = max(64, int(points_per_object
                            * min(1.0, (range_falloff / r) ** 2)))
        obj_points.append(
            _box_surface_points(rng, h, w, l, x, y, z, yaw, m)
        )
        # label yaw convention: build_targets negates (kitti_dataset.py:181),
        # so store -yaw to make the heatmap target yaw equal `yaw`.
        labels.append([cls, x, y, z, h, w, l, -yaw])

    points = np.concatenate([ground, clutter] + obj_points).astype(np.float32)
    rng.shuffle(points, axis=0)
    return points, np.asarray(labels, np.float32)


def render_camera_image(points: np.ndarray, labels: np.ndarray,
                        P: np.ndarray, hw: Tuple[int, int] = (375, 1242)) -> np.ndarray:
    """Render a synthetic camera frame geometrically consistent with the
    scene: velodyne points become intensity-shaded 2x2 dots (texture with
    real parallax for feature matching) and each labeled box becomes a
    filled class-colored convex hull with a bright outline. `P` is a 3x4
    rect-frame projection — pass P2 for the left camera or a P3 carrying a
    stereo-baseline tx term for the right camera, and the disparity falls
    out of the projection. Returns (H, W, 3) uint8 BGR."""
    import cv2

    from sfa3d_tpu.geometry.transforms import lidar_to_camera_box
    from sfa3d_tpu.viz.draw import compute_box_3d, project_to_image

    h, w = hw
    P = np.asarray(P, np.float64).reshape(3, 4)
    img = np.full((h, w, 3), 28, np.uint8)

    V2C = np.asarray(cnf.Tr_velo_to_cam[:3], np.float64).reshape(3, 4)
    R0 = np.asarray(cnf.R0[:3, :3], np.float64)
    rect = (R0 @ (V2C[:, :3] @ points[:, :3].T.astype(np.float64)
                  + V2C[:, 3:4])).T
    infront = rect[:, 2] > 1.0
    rect, inten = rect[infront], points[infront, 3]
    uvz = (P[:, :3] @ rect.T + P[:, 3:4]).T
    uv = uvz[:, :2] / uvz[:, 2:3]
    ui = np.round(uv[:, 0]).astype(np.int64)
    vi = np.round(uv[:, 1]).astype(np.int64)
    inb = (ui >= 0) & (ui < w - 1) & (vi >= 0) & (vi < h - 1)
    ui, vi = ui[inb], vi[inb]
    shade = (70 + 180 * np.clip(inten[inb], 0, 1)).astype(np.uint8)
    for du in (0, 1):
        for dv in (0, 1):
            img[vi + dv, ui + du] = shade[:, None]

    bgr_colors = {0: (80, 80, 230), 1: (90, 200, 90), 2: (230, 160, 60)}
    if len(labels):
        cam = np.asarray(lidar_to_camera_box(labels[:, 1:8].astype(np.float64)))
        # far-to-near painter's order so near boxes occlude far ones
        for j in np.argsort(-cam[:, 2]):
            x, y, z, bh, bw, bl, ry = cam[j]
            corners = compute_box_3d((bh, bw, bl), (x, y, z), ry)
            if (corners[:, 2] <= 1.0).any():
                continue
            pts2d = project_to_image(corners, P)
            hull = cv2.convexHull(pts2d.reshape(-1, 1, 2).astype(np.int32))
            color = bgr_colors[int(labels[j, 0]) % 3]
            cv2.fillConvexPoly(img, hull, color)
            cv2.polylines(img, [hull], True,
                          tuple(min(255, c + 90) for c in color), 2)
    return img


def annotate_labels_camera(labels: np.ndarray, P: np.ndarray,
                           hw: Tuple[int, int] = (375, 1242),
                           grid: int = 4):
    """Derive the KITTI annotation fields the difficulty rules read
    (kitti_data_utils.py:54-68) from the scene geometry, per labeled box:

    - 2D bbox: the image-clipped bounds of the projected 3D corners (its
      height drives the Easy>=40px / Moderate,Hard>=25px rule);
    - truncation: the fraction of the full projected bbox clipped away by
      the image boundary (KITTI's "leaving image boundaries" fraction);
    - occlusion: 0/1/2 from the fraction of the box's image footprint
      covered by NEARER boxes, measured on a `grid`-px occupancy raster
      painted near-to-far (matches render_camera_image's painter order);
    - alpha: the observation angle ry - atan2(x_cam, z_cam).

    Returns a list of dicts {alpha, bbox (4,), truncation, occlusion};
    boxes fully outside the image get truncation 1.0 (level 4 territory).
    """
    from sfa3d_tpu.geometry.transforms import lidar_to_camera_box
    from sfa3d_tpu.viz.draw import compute_box_3d, project_to_image

    h_img, w_img = hw
    P = np.asarray(P, np.float64).reshape(3, 4)
    cam = np.asarray(lidar_to_camera_box(labels[:, 1:8].astype(np.float64)))
    gh, gw = (h_img + grid - 1) // grid, (w_img + grid - 1) // grid
    occupied = np.zeros((gh, gw), bool)

    out = [None] * len(cam)
    # near-to-far: each box's occlusion reads only NEARER boxes' footprint
    for j in np.argsort(cam[:, 2]):
        x, y, z, bh, bw, bl, ry = cam[j]
        corners = compute_box_3d((bh, bw, bl), (x, y, z), ry)
        alpha = float(ry - np.arctan2(x, z))
        if (corners[:, 2] <= 0.1).any():
            # clipped by the image plane: no stable projection
            out[j] = dict(alpha=alpha, bbox=np.zeros(4), truncation=1.0,
                          occlusion=0)
            continue
        uv = project_to_image(corners, P)
        x1f, y1f = uv[:, 0].min(), uv[:, 1].min()
        x2f, y2f = uv[:, 0].max(), uv[:, 1].max()
        x1, y1 = max(x1f, 0.0), max(y1f, 0.0)
        x2, y2 = min(x2f, w_img - 1.0), min(y2f, h_img - 1.0)
        full = (x2f - x1f) * (y2f - y1f)
        vis = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
        trunc = float(1.0 - vis / full) if full > 0 else 1.0
        if vis <= 0.0:
            out[j] = dict(alpha=alpha, bbox=np.zeros(4), truncation=1.0,
                          occlusion=0)
            continue
        gx1, gy1 = int(x1) // grid, int(y1) // grid
        gx2, gy2 = int(x2) // grid + 1, int(y2) // grid + 1
        cells = occupied[gy1:gy2, gx1:gx2]
        occ_frac = float(cells.mean()) if cells.size else 0.0
        occlusion = 0 if occ_frac < 0.15 else (1 if occ_frac < 0.5 else 2)
        cells[:] = True  # paint for the boxes behind this one
        out[j] = dict(alpha=alpha, bbox=np.array([x1, y1, x2, y2]),
                      truncation=trunc, occlusion=occlusion)
    return out


# KITTI color-pair stereo baseline (m); P3 tx = P2 tx - fx * baseline
STEREO_BASELINE_M = 0.54


def write_mini_kitti(root: str, n_frames: int = 4, seed: int = 0,
                     splits=("train", "val", "test"),
                     cameras: bool = True,
                     range_falloff: float = 0.0) -> str:
    """Materialize a tiny KITTI-layout dataset on disk from synthetic scenes
    (velodyne .bin + calib .txt + label_2 .txt + rendered image_2/image_3
    .png stereo camera frames + ImageSets), so the full dataset/loader/
    training/fusion/stereo path runs without the KITTI download. Extends the
    reference's dummy-fixture idea (data_process/main_script.py:42-76). The
    camera frames are geometrically consistent with the scans (points +
    labeled boxes projected through the calib), and image_3 is rendered
    through a P3 carrying the real 0.54 m KITTI stereo baseline."""
    import os

    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.geometry.transforms import lidar_to_camera_box

    for sub in ("training", "testing"):
        for d in ("velodyne", "calib", "label_2", "image_2", "image_3"):
            os.makedirs(os.path.join(root, sub, d), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)

    names = {0: "Pedestrian", 1: "Car", 2: "Cyclist"}
    calib_lines = []
    P2 = np.asarray(cnf.P2[:3], np.float64).reshape(3, 4)
    P3 = P2.copy()
    P3[0, 3] -= P2[0, 0] * STEREO_BASELINE_M  # tx = -fx * baseline offset
    R0 = np.asarray(cnf.R0[:3, :3]).reshape(-1)
    V2C = np.asarray(cnf.Tr_velo_to_cam[:3]).reshape(-1)
    zeros12 = " ".join(["0"] * 12)
    for key, vals in [("P0", P2.reshape(-1)), ("P1", P2.reshape(-1)),
                      ("P2", P2.reshape(-1)), ("P3", P3.reshape(-1))]:
        calib_lines.append(f"{key}: " + " ".join(f"{v:.12e}" for v in vals))
    calib_lines.insert(4, "R0_rect: " + " ".join(f"{v:.12e}" for v in R0))
    calib_lines.append("Tr_velo_to_cam: " + " ".join(f"{v:.12e}" for v in V2C))
    calib_lines.append(f"Tr_imu_to_velo: {zeros12}")
    # already in canonical order: P0 P1 P2 P3 R0_rect Tr_velo_to_cam Tr_imu_to_velo
    calib_txt = "\n".join(calib_lines) + "\n"

    # cameras=False skips the (relatively slow) frame rendering for
    # lidar-only consumers writing hundreds of scenes (generalize_check)
    try:
        import cv2
    except ImportError:  # pragma: no cover - cv2 is baked into this env
        cv2 = None
    if not cameras:
        cv2 = None

    for sub in ("training", "testing"):
        for i in range(n_frames):
            points, labels = synthetic_scene(
                seed=seed + i + (1000 if sub == "testing" else 0),
                range_falloff=range_falloff,
            )
            points.tofile(os.path.join(root, sub, "velodyne", f"{i:06d}.bin"))
            with open(os.path.join(root, sub, "calib", f"{i:06d}.txt"), "w") as f:
                f.write(calib_txt)
            if cv2 is not None:
                for cam_dir, P in (("image_2", P2), ("image_3", P3)):
                    cv2.imwrite(
                        os.path.join(root, sub, cam_dir, f"{i:06d}.png"),
                        render_camera_image(points, labels, P),
                    )
            if sub == "training":
                # genuine annotation fields (projected bbox / truncation /
                # occlusion / alpha): the KITTI difficulty rules then bucket
                # these labels non-degenerately (near+visible -> Easy, far/
                # clipped/covered -> Moderate/Hard/unknown)
                anns = annotate_labels_camera(labels, P2)
                with open(os.path.join(root, sub, "label_2", f"{i:06d}.txt"), "w") as f:
                    cam = np.asarray(lidar_to_camera_box(labels[:, 1:]))
                    for row, c, ann in zip(cam, labels[:, 0].astype(int), anns):
                        x, y, z, h, w, l, ry = row
                        bx1, by1, bx2, by2 = ann["bbox"]
                        f.write(
                            f"{names[int(c)]} {ann['truncation']:.2f} "
                            f"{ann['occlusion']} {ann['alpha']:.2f} "
                            f"{bx1:.2f} {by1:.2f} {bx2:.2f} {by2:.2f} "
                            f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}\n"
                        )
    if isinstance(splits, dict):
        # disjoint splits: {'train': range(0, 16), 'val': range(16, 24)}
        for split, id_range in splits.items():
            with open(os.path.join(root, "ImageSets", f"{split}.txt"), "w") as f:
                f.write("\n".join(f"{i:06d}" for i in id_range) + "\n")
    else:
        ids = "\n".join(f"{i:06d}" for i in range(n_frames)) + "\n"
        for split in splits:
            with open(os.path.join(root, "ImageSets", f"{split}.txt"), "w") as f:
                f.write(ids)
    return root


def moving_scene_sequence(
    n_frames: int,
    seed: int = 0,
    n_objects: int = 6,
    points_per_object: int = 800,
    n_ground: int = 20000,
    n_clutter: int = 6000,
):
    """A temporally-consistent drive: the SAME objects move with constant
    per-object velocities across frames (0.2-1.2 m/frame, boxes facing
    their motion), ground/clutter resampled per frame like a real sensor.

    Feeds the 3D MOT layer (sfa3d_tpu/tracking/): identities are only
    testable on scenes where frame t+1 is frame t moved, which
    synthetic_scene (independent draws) cannot provide.

    Returns a list of (points (N,4), labels (M,8), gt_ids (M,)) per frame;
    labels use the synthetic_scene convention (stored yaw = -geometric
    yaw, matching detections_to_real output and build_targets input).
    Objects sign-reverse their velocity when they would leave the BEV
    x in (6, 44) / y in (-19, 19) core, so every ground-truth id is
    observable in every frame.
    """
    rng = np.random.default_rng(seed)
    dims_by_class = {
        0: (1.76, 0.66, 0.84),
        1: (1.52, 1.63, 3.88),
        2: (1.73, 0.60, 1.76),
    }
    # per-frame (=0.1 s at KITTI's 10 Hz) speed ranges by class: walking
    # pedestrians, urban cars, cyclists. Also what IoU-gated association
    # needs: inter-frame displacement must not exceed the box footprint
    # (a pedestrian teleporting 1.2 m/frame has zero self-overlap).
    speed_by_class = {0: (0.05, 0.15), 1: (0.3, 1.2), 2: (0.2, 0.6)}
    objs = []
    for oid in range(n_objects):
        cls = int(rng.integers(0, 3))
        h, w, l = dims_by_class[cls]
        h *= rng.uniform(0.9, 1.1)
        w *= rng.uniform(0.9, 1.1)
        l *= rng.uniform(0.9, 1.1)
        x, y = rng.uniform(10, 40), rng.uniform(-15, 15)
        theta = rng.uniform(-np.pi, np.pi)
        speed = rng.uniform(*speed_by_class[cls])
        objs.append(dict(oid=oid, cls=cls, h=h, w=w, l=l, x=x, y=y,
                         vx=speed * np.cos(theta), vy=speed * np.sin(theta)))

    frames = []
    for _t in range(n_frames):
        ground = np.empty((n_ground, 4), np.float32)
        r = np.sqrt(rng.uniform(0.02, 1.0, n_ground))
        th = rng.uniform(-np.pi, np.pi, n_ground)
        ground[:, 0] = r * 60.0 * np.abs(np.cos(th))
        ground[:, 1] = r * 40.0 * np.sin(th)
        ground[:, 2] = rng.normal(-1.73, 0.05, n_ground)
        ground[:, 3] = rng.uniform(0.0, 0.4, n_ground)
        clutter = np.empty((n_clutter, 4), np.float32)
        clutter[:, 0] = rng.uniform(-10, 60, n_clutter)
        clutter[:, 1] = rng.uniform(-30, 30, n_clutter)
        clutter[:, 2] = rng.uniform(-1.7, 1.2, n_clutter)
        clutter[:, 3] = rng.uniform(0, 1, n_clutter)

        pts, labels, ids = [ground, clutter], [], []
        for o in objs:
            yaw = np.arctan2(o["vy"], o["vx"])  # face the motion
            pts.append(_box_surface_points(
                rng, o["h"], o["w"], o["l"], o["x"], o["y"], -1.73, yaw,
                points_per_object,
            ))
            labels.append([o["cls"], o["x"], o["y"], -1.73,
                           o["h"], o["w"], o["l"], -yaw])
            ids.append(o["oid"])
            # advance; bounce off the observable-core walls so the object
            # stays detectable in every frame
            o["x"] += o["vx"]
            o["y"] += o["vy"]
            if not (6.0 < o["x"] < 44.0):
                o["vx"] *= -1.0
                o["x"] += 2.0 * o["vx"]
            if not (-19.0 < o["y"] < 19.0):
                o["vy"] *= -1.0
                o["y"] += 2.0 * o["vy"]
        points = np.concatenate(pts).astype(np.float32)
        rng.shuffle(points, axis=0)
        frames.append((points, np.asarray(labels, np.float32),
                       np.asarray(ids, np.int32)))
    return frames


def write_mini_drive(root: str, n_frames: int = 2, seed: int = 0,
                     cameras: bool = True, motion: bool = False) -> str:
    """Materialize a tiny KITTI raw-drive layout (image_02/data +
    velodyne_points/data with 10-digit ids — the demo_dataset.py:32-99
    shape) from synthetic scenes, so the video-demo CLI runs without the
    raw-drive download. Each scan is a front scene plus an x-mirrored rear
    scene, giving `demo --two_sides` real content in BOTH detection
    windows. `motion=True` swaps the independent front scenes for a
    moving_scene_sequence (same objects, constant velocities) so the
    `track` CLI has identities to follow."""
    import os

    os.makedirs(os.path.join(root, "image_02", "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "velodyne_points", "data"), exist_ok=True)
    try:
        import cv2
    except ImportError:  # pragma: no cover - cv2 is baked into this env
        cv2 = None
    if not cameras:
        cv2 = None
    P2 = np.asarray(cnf.P2[:3], np.float64).reshape(3, 4)
    moving = moving_scene_sequence(n_frames, seed=seed) if motion else None
    for i in range(n_frames):
        if moving is not None:
            front, labels, _ids = moving[i]
        else:
            front, labels = synthetic_scene(seed=seed + i)
        back, _ = synthetic_scene(seed=seed + i + 500)
        back = back.copy()
        back[:, 0] *= -1.0  # mirror into the rear window (boundary_back)
        scan = np.concatenate([front, back]).astype(np.float32)
        scan.tofile(os.path.join(root, "velodyne_points", "data", f"{i:010d}.bin"))
        if cv2 is not None:
            cv2.imwrite(
                os.path.join(root, "image_02", "data", f"{i:010d}.png"),
                render_camera_image(front, labels, P2),
            )
    return root


def synthetic_batch_points(
    batch: int, max_points: int = cnf.MAX_POINTS, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """(B, N, 4) padded scans + (B, N) masks for benchmarking."""
    from sfa3d_tpu.ops.bev import _pad_raw

    pts = np.zeros((batch, max_points, 4), np.float32)
    valid = np.zeros((batch, max_points), bool)
    for b in range(batch):
        scan, _ = synthetic_scene(seed=seed + b)
        p, v = _pad_raw(scan, max_points)
        pts[b], valid[b] = p, v
    return pts, valid
