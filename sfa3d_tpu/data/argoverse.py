"""Argoverse v1 dataset reader (host-side) + synthetic fixture writer.

Parity with reference data_process/argoverse_dataset.py (paired
samplefile/lidar/*.bin + camera *.jpg by sorted order, single
track_label.json keyed by timestamp, per-log vehicle_calibration_info.json)
and data_process/argoverse_dataloader.py, emitting the same fixed-shape
padded sample tensors as the KITTI reader so the rest of the stack is
dataset-agnostic. PLY loading (argoverse_test.py:181-197) is supported for
lidar files without the argoverse-api/plydata dependency.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from sfa3d_tpu.config import argoverse as acnf
from sfa3d_tpu.data.loader import KittiTrainLoader
from sfa3d_tpu.geometry.argoverse_calib import ArgoverseCalibration
from sfa3d_tpu.geometry.se3 import quat2rotmat, yaw_from_quaternion


def load_ply_lidar(path: str) -> np.ndarray:
    """Minimal binary_little_endian PLY reader for Argoverse sweeps
    (x, y, z, intensity[, laser_number]) — replaces the reference's plydata
    dependency (argoverse_test.py:181-197)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vertex = 0
        props = []
        fmt = "binary_little_endian"
        for line in header:
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_vertex = int(line.split()[-1])
            elif line.startswith("property"):
                _, ptype, pname = line.split()
                props.append((pname, ptype))
        type_map = {
            "float": "<f4", "float32": "<f4", "double": "<f8",
            "uchar": "u1", "uint8": "u1", "int": "<i4", "uint32": "<u4",
            "short": "<i2", "ushort": "<u2",
        }
        if fmt != "binary_little_endian":
            data = np.loadtxt(f, max_rows=n_vertex)
            arr = {name: data[:, i] for i, (name, _) in enumerate(props)}
        else:
            dtype = np.dtype([(n, type_map[t]) for n, t in props])
            raw = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
            arr = {n: raw[n].astype(np.float64) for n, _ in props}
    x = arr.get("x")
    y = arr.get("y")
    z = arr.get("z")
    intensity = arr.get("intensity", np.zeros_like(x))
    return np.stack([x, y, z, intensity], axis=1).astype(np.float32)


def load_lidar(path: str) -> np.ndarray:
    if path.endswith(".ply"):
        return load_ply_lidar(path)
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


@dataclass
class ArgoverseSample:
    timestamp: str
    points: np.ndarray  # (max_points, 4) padded ego-frame points
    valid: np.ndarray
    labels: np.ndarray  # (max_objects, 8) [cls, x, y, z, h, w, l, yaw]
    n_labels: np.int32
    img_path: str
    lidar_path: str
    calib: Optional[ArgoverseCalibration]


class ArgoverseDataset:
    """(argoverse_dataset.py:29-193) with fixed-shape outputs."""

    def __init__(
        self,
        dataset_dir: str,
        mode: str = "train",
        target_camera: str = "ring_front_center",
        num_samples: Optional[int] = None,
        max_points: int = acnf.MAX_POINTS,
        max_objects: int = 50,
    ):
        assert mode in ("train", "val", "test")
        self.dataset_dir = dataset_dir
        self.mode = mode
        self.target_camera = target_camera
        self.max_points = max_points
        self.max_objects = max_objects

        lidar_dir = os.path.join(dataset_dir, "samplefile", "lidar")
        image_dir = os.path.join(dataset_dir, "samplefile", target_camera)
        self.lidar_files = sorted(
            glob.glob(os.path.join(lidar_dir, "*.bin"))
            + glob.glob(os.path.join(lidar_dir, "*.ply"))
        )
        self.image_files = sorted(glob.glob(os.path.join(image_dir, "*.jpg")))
        n = min(len(self.lidar_files), len(self.image_files)) or len(self.lidar_files)
        if num_samples is not None:
            n = min(n, num_samples)
        self.num_samples = n

        ann_path = os.path.join(dataset_dir, "annotations", "track_label.json")
        self.annotations = {}
        if os.path.isfile(ann_path):
            with open(ann_path) as f:
                self.annotations = json.load(f)

        calib_path = os.path.join(dataset_dir, "vehicle_calibration_info.json")
        self.calib = (
            ArgoverseCalibration(calib_path, target_camera=target_camera)
            if os.path.isfile(calib_path)
            else None
        )

    def __len__(self):
        return self.num_samples

    def _labels_for(self, timestamp: str) -> np.ndarray:
        frame = self.annotations.get(timestamp)
        if not frame:
            return np.zeros((0, 8), np.float32)
        rows = []
        for obj in frame.get("track_label_list", []):
            cls_name = obj.get("object_type", obj.get("label_class"))
            if cls_name not in acnf.CLASS_NAME_TO_ID:
                continue
            cls_id = acnf.CLASS_NAME_TO_ID[cls_name]
            x, y, z = (
                obj["translation"]
                if isinstance(obj["translation"], list)
                else [obj["translation"][k] for k in ("x", "y", "z")]
            )
            h, w, l = obj["height"], obj["width"], obj["length"]
            q = obj["rotation"]
            if isinstance(q, dict):
                q = q["coefficients"]
            # Real Argoverse labels store quaternions SCALAR-FIRST (w,x,y,z)
            # like argoverse-api; the reference's argoverse_dataset.py:142-148
            # misreads them as (x,y,z,w) — documented divergence, see
            # docs/TECHNICAL.md. yaw about +z.
            yaw = yaw_from_quaternion(q)
            rows.append([cls_id, x, y, z, h, w, l, yaw])
        return np.asarray(rows, np.float32) if rows else np.zeros((0, 8), np.float32)

    def __getitem__(self, index: int) -> ArgoverseSample:
        lidar_path = self.lidar_files[index]
        img_path = self.image_files[index] if index < len(self.image_files) else ""
        timestamp = os.path.splitext(os.path.basename(lidar_path))[0]
        points = load_lidar(lidar_path)

        from sfa3d_tpu.ops.bev import filter_and_pad_points

        pts, valid = filter_and_pad_points(
            points, max_points=self.max_points, boundary=acnf.boundary
        )

        labels = self._labels_for(timestamp)
        lab = np.zeros((self.max_objects, 8), np.float32)
        k = min(len(labels), self.max_objects)
        lab[:k] = labels[:k]
        return ArgoverseSample(
            timestamp, pts, valid, lab, np.int32(k), img_path, lidar_path, self.calib
        )


class ArgoverseTrainLoader(KittiTrainLoader):
    """Batched loader for the Argoverse pipeline (argoverse_dataloader.py
    parity): a KittiTrainLoader subclass parameterized with the Argoverse
    prepare function (Argoverse raster + center crop + geometry-matched
    targets), so sampler/collate/tail/process-sharding behavior stays
    identical across datasets."""

    def __init__(self, dataset, batch_size: int, subdivisions: int = 1,
                 shuffle: bool = True, seed: int = 2020, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 num_workers: int = 0, prefetch: int = 2):
        def prepare(points, valid, labels, n_labels, hflip):
            # hflip augmentation is a KITTI-path feature; Argoverse samples
            # carry no hflipped attr (always False)
            return _argo_prepare_batch(points, valid, labels, n_labels)

        super().__init__(
            dataset, batch_size, subdivisions, shuffle, seed, drop_last,
            process_index, process_count, prepare_fn=prepare,
            num_workers=num_workers, prefetch=prefetch,
        )


import functools


@functools.lru_cache(maxsize=1)
def _argo_prep_fn():
    """Build the jitted prep function ONCE (per-batch jax.jit construction
    would retrace and recompile every batch)."""

    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.ops.bev import argoverse_points_to_bev
    from sfa3d_tpu.ops.targets import build_targets

    half = 30.4  # (608 px * 0.1 m/px) / 2
    b = acnf.boundary
    crop_bound = (0.0, 2 * half, -half, half, b["minZ"], b["maxZ"])

    @jax.jit
    def prep_batch(pts, val, lab, nl):
        def one(p, v, la, n):
            bev = argoverse_points_to_bev(p, v) / 255.0
            h, w = bev.shape[:2]
            y0, x0 = (h - 608) // 2, (w - 608) // 2
            bev = jax.lax.dynamic_slice(bev, (y0, x0, 0), (608, 608, 3))
            la_crop = jnp.concatenate(
                [
                    la[:, 0:1],
                    half - la[:, 1:2],  # x' = 30.4 - x (mirrored row axis)
                    la[:, 2:3],
                    la[:, 3:7],
                    jnp.pi - la[:, 7:8],  # heading reflected by the x-mirror
                ],
                axis=1,
            )
            tg = build_targets(la_crop, n, jnp.bool_(False), bound=crop_bound)
            return bev, tg

        return jax.vmap(one)(pts, val, lab, nl)

    return prep_batch


def _argo_prepare_batch(points, valid, labels, n_labels):
    """Argoverse raster + center crop + geometry-matched targets.

    The 1000-px raster maps row = (maxX - x)/0.1 (x FLIPPED) and
    col = (y - minY)/0.1; the detector consumes the center 608-px crop,
    covering x, y in (-30.4, 30.4] at 2.5 heatmap px/m. To reuse the KITTI
    target builder (row increasing with x), labels are mirrored into that
    crop frame: x' = 30.4 - x (row' = (30.4 - x) * 2.5 == (raster_row-196)/4),
    y unchanged with bound (-30.4, 30.4), and yaw reflected (pi - yaw, since
    the x-mirror reverses heading). h/w/l and z are invariant.
    """
    return _argo_prep_fn()(points, valid, labels, n_labels)


def write_mini_argoverse(root: str, n_frames: int = 2, seed: int = 0) -> str:
    """Synthetic Argoverse-layout fixture: lidar .bin sweeps + dummy camera
    jpgs + track_label.json + vehicle_calibration_info.json + per-frame
    poses, so the full Argoverse path runs without the dataset."""
    import cv2

    from sfa3d_tpu.data.synthetic import synthetic_scene

    os.makedirs(os.path.join(root, "samplefile", "lidar"), exist_ok=True)
    os.makedirs(os.path.join(root, "samplefile", "ring_front_center"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "log0", "poses"), exist_ok=True)

    rng = np.random.default_rng(seed)
    annotations = {}
    base_ts = 315974052820626000
    for i in range(n_frames):
        ts = base_ts + i * 100_000_000
        pts, labels = synthetic_scene(seed=seed + i)
        pts.tofile(os.path.join(root, "samplefile", "lidar", f"{ts}.bin"))
        img = (rng.uniform(0, 255, (120, 192, 3))).astype(np.uint8)
        cv2.imwrite(
            os.path.join(root, "samplefile", "ring_front_center", f"{ts}.jpg"), img
        )
        track_list = []
        for cls, x, y, z, h, w, l, yaw in labels:
            yaw = -yaw  # synthetic labels store -yaw (see synthetic_scene)
            track_list.append(
                {
                    "object_type": ["PEDESTRIAN", "VEHICLE", "BICYCLE"][int(cls)],
                    "translation": [float(x), float(y), float(z)],
                    "height": float(h), "width": float(w), "length": float(l),
                    "rotation": [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))],
                }
            )
        annotations[str(ts)] = {"track_label_list": track_list}
        pose = {
            "rotation": [1.0, 0.0, 0.0, float(i) * 1e-4],  # (w, x, y, z)
            "translation": [float(i) * 0.5, 0.0, 0.0],
        }
        with open(
            os.path.join(root, "log0", "poses", f"city_SE3_egovehicle_{ts}.json"), "w"
        ) as f:
            json.dump(pose, f)

    with open(os.path.join(root, "annotations", "track_label.json"), "w") as f:
        json.dump(annotations, f)

    calib = {
        "camera_data": [
            {
                "key": "image_raw_ring_front_center",
                "value": {
                    "focal_length_x_px_": 1392.0,
                    "focal_length_y_px_": 1392.0,
                    "focal_center_x_px_": 980.0,
                    "focal_center_y_px_": 604.0,
                    "skew_": 0.0,
                    "vehicle_SE3_camera_": {
                        # camera looks along ego +x: cam z = ego x.
                        # coefficients are SCALAR-FIRST (w,x,y,z) like the
                        # real dataset (this particular quat is q ≡ -q
                        # convention-invariant, but w-first is the contract)
                        "rotation": {"coefficients": [0.5, -0.5, 0.5, -0.5]},
                        "translation": [1.6, 0.0, 1.4],
                    },
                },
            },
        ]
        # rectified stereo pair (exercises geometry.argoverse_calib.
        # load_stereo_calib, parity with ref_calib.py:229-257): same optical
        # frame as the front camera, separated by the nominal ~0.3 m
        # Argoverse stereo baseline along ego -y (left camera on +y)
        + [
            {
                "key": f"image_raw_{name}",
                "value": {
                    "focal_length_x_px_": 3660.0,
                    "focal_length_y_px_": 3660.0,
                    "focal_center_x_px_": 1232.0,
                    "focal_center_y_px_": 1028.0,
                    "skew_": 0.0,
                    "vehicle_SE3_camera_": {
                        "rotation": {"coefficients": [0.5, -0.5, 0.5, -0.5]},
                        "translation": [1.6, ty, 1.4],
                    },
                },
            }
            for name, ty in [
                ("stereo_front_left_rect", 0.1493),
                ("stereo_front_right_rect", -0.1493),
            ]
        ],
        "lidar_data": [
            {
                "key": "down_lidar",
                "value": {
                    "vehicle_SE3_down_lidar_": {
                        # identity rotation, scalar-first (w,x,y,z)
                        "rotation": {"coefficients": [1.0, 0.0, 0.0, 0.0]},
                        "translation": [1.35, 0.0, 1.68],
                    }
                },
            }
        ],
    }
    with open(os.path.join(root, "vehicle_calibration_info.json"), "w") as f:
        json.dump(calib, f)
    return root
