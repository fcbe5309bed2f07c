"""High-level detector facade — the one-object API for users switching from
the reference.

    from sfa3d_tpu import Detector

    det = Detector()                                  # random init
    det = Detector(checkpoint="Model_fpn_resnet_18_epoch_300.pth")  # torch
    det = Detector(checkpoint="checkpoints/Model_smoke_epoch_2")    # orbax

    boxes = det.detect(points)        # (N, 4) raw velodyne points
    boxes = det.detect_file("000001.bin")

Returns a list of dicts {'class_id', 'class_name', 'score', 'x', 'y', 'z',
'h', 'w', 'l', 'yaw'} in the metric velodyne frame.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from sfa3d_tpu.config import kitti as cnf


def format_detections(out: Dict, i: int) -> List[Dict]:
    """detect_frames output pytree -> list of detection dicts for frame i
    (the reference's convert_det_to_real_values rows as a friendly record)."""
    mask = np.asarray(out["mask"])[i]
    real = np.asarray(out["boxes_real"])[i]
    scores = np.asarray(out["detections"])[i, :, 0]
    dets = []
    for row, score in zip(real[mask], scores[mask]):
        cls = int(row[0])
        dets.append(
            {
                "class_id": cls,
                "class_name": cnf.ID_TO_CLASS_NAME.get(cls, str(cls)),
                "score": float(score),
                "x": float(row[1]), "y": float(row[2]), "z": float(row[3]),
                "h": float(row[4]), "w": float(row[5]), "l": float(row[6]),
                "yaw": float(row[7]),
            }
        )
    return dets


def write_kitti_results(dets: List[Dict], calib, path: str):
    """Write detections as a KITTI submission-format label file (one row per
    detection, camera-frame, score appended) — the layout the official
    devkit evaluates. Module-level so the eval CLI (--save_results) can use
    it without constructing a Detector."""
    from sfa3d_tpu.geometry.transforms import lidar_to_camera_box

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for d in dets:
            box = np.asarray(
                [[d["x"], d["y"], d["z"], d["h"], d["w"], d["l"], d["yaw"]]]
            )
            cam = np.asarray(
                lidar_to_camera_box(box, calib.V2C, calib.R0, calib.P2)
            )[0]
            x, y, z, h, w, l, ry = cam
            f.write(
                f"{d['class_name']} 0.00 0 0.00 0 0 50 50 "
                f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} "
                f"{ry:.2f} {d['score']:.4f}\n"
            )


class Detector:
    def __init__(
        self,
        arch: str = "fpn_resnet_18",
        checkpoint: Optional[str] = None,
        K: int = 50,
        peak_thresh: float = 0.2,
        dtype: str = "float32",
    ):
        # float32 is the parity-claiming default (detections match the torch
        # reference within 1e-3, tests/test_e2e_parity.py). dtype="bfloat16"
        # is the TPU fast mode: ~2x MXU throughput, but bf16's ~3 significant
        # digits move box coordinates by decimeters — outside 1e-3.
        import jax
        import jax.numpy as jnp

        from sfa3d_tpu.models import create_model
        from sfa3d_tpu.pipeline import init_detector

        jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.model = create_model(arch, dtype=jdtype)
        self.K = K
        self.peak_thresh = peak_thresh
        self.arch = arch

        if checkpoint is None:
            self.variables = init_detector(self.model, jax.random.PRNGKey(0))
        elif checkpoint.endswith(".pth"):
            from sfa3d_tpu.models.port import load_torch_checkpoint

            num_layers = int(arch.split("_")[-1])
            self.variables = load_torch_checkpoint(checkpoint, num_layers, arch)
        else:
            # orbax composite saved by runtime/checkpoint.py
            from sfa3d_tpu.runtime.checkpoint import load_params_only

            self.variables = load_params_only(checkpoint)

    def detect_batch(self, pts: np.ndarray, valid: np.ndarray) -> Dict:
        """(B, P, 4) padded scans + (B, P) masks -> host dict with the
        small output arrays only ('mask', 'boxes_real', 'detections').
        One fetch per batch; the (B, 608, 608, 3) bev raster stays on
        device — shipping it D2H costs ~4.4 MB/frame and was measured 3x
        slower than sequential on the tunneled chip."""
        import jax.numpy as jnp

        from sfa3d_tpu.pipeline import detect_frames

        out = detect_frames(
            self.model, self.variables, jnp.asarray(pts),
            jnp.asarray(valid), K=self.K, peak_thresh=self.peak_thresh,
        )
        return {k: np.asarray(out[k]) for k in ("mask", "boxes_real", "detections")}

    def detect(self, points: np.ndarray) -> List[Dict]:
        """(N, 4) raw velodyne scan -> list of detection dicts."""
        from sfa3d_tpu.ops.bev import filter_and_pad_points

        pts, valid = filter_and_pad_points(points, max_points=cnf.MAX_POINTS_FILTERED)
        out = self.detect_batch(pts[None], valid[None])
        return format_detections(out, 0)

    def detect_file(self, velodyne_bin: str) -> List[Dict]:
        points = np.fromfile(velodyne_bin, dtype=np.float32).reshape(-1, 4)
        return self.detect(points)

    def write_kitti_results(self, dets: List[Dict], calib, path: str):
        """Write detections as a KITTI submission-format label file (one row
        per detection, camera-frame, score appended)."""
        write_kitti_results(dets, calib, path)


class ArtifactDetector:
    """Detector facade over an AOT export (runtime/export.py): same
    `detect`/`detect_batch`/`detect_file` surface as `Detector`, but the
    compute comes from a serialized StableHLO artifact — no model code, no
    checkpoint. Plugs straight into `BatchingDetectorServer` (`cli serve
    --artifact model.sfa3dx`).

    Requires a `kind == 'detector'` artifact; symbolic-batch artifacts
    (the export default) serve every bucket size, while fixed-batch
    artifacts are served by padding every device batch up to their one
    size (BatchingDetectorServer handles this and clamps max_batch)."""

    def __init__(self, path: str):
        from sfa3d_tpu.runtime.export import load_exported

        self.artifact = load_exported(path)
        m = self.artifact.manifest
        if m.get("kind") != "detector":
            raise ValueError(
                f"{path}: artifact kind {m.get('kind')!r} cannot back the "
                "LiDAR detector server (need kind='detector'; fused "
                "artifacts take images+calib per request — use "
                "ArtifactFusedDetector / `cli serve --artifact` dispatches "
                "on kind / `cli fuse --artifact`)"
            )
        self.K = m["K"]
        self.peak_thresh = m["peak_thresh"]
        self.max_points = m["max_points"]
        self.fixed_batch = m["batch"]  # None == symbolic

    def detect_batch(self, pts: np.ndarray, valid: np.ndarray) -> Dict:
        if pts.shape[1] != self.max_points:
            raise ValueError(
                f"artifact was exported for max_points={self.max_points}, "
                f"got scans padded to {pts.shape[1]}"
            )
        if self.fixed_batch is not None and pts.shape[0] != self.fixed_batch:
            raise ValueError(
                f"fixed-batch artifact (batch={self.fixed_batch}) cannot "
                f"run batch {pts.shape[0]}; re-export without --batch for a "
                "symbolic-batch artifact"
            )
        out = self.artifact.call(pts.astype(np.float32), valid.astype(bool))
        return {k: np.asarray(out[k]) for k in ("mask", "boxes_real", "detections")}

    def detect(self, points: np.ndarray) -> List[Dict]:
        from sfa3d_tpu.ops.bev import filter_and_pad_points

        pts, valid = filter_and_pad_points(points, max_points=self.max_points)
        out = self.detect_batch(pts[None], valid[None])
        return format_detections(out, 0)

    def detect_file(self, velodyne_bin: str) -> List[Dict]:
        points = np.fromfile(velodyne_bin, dtype=np.float32).reshape(-1, 4)
        return self.detect(points)


class ArtifactFusedDetector:
    """FusedDetector facade over a FUSED AOT export (cli export --fused):
    the same `_run` seam `BatchingFusedServer` drives, with weights, fusion
    config, and camera/letterbox geometry baked into one StableHLO file.
    The letterbox scale/pad are compile-time constants in the artifact, so
    the per-request hw/scale/pad arguments are accepted-and-dropped; frames
    must match the baked `img_hw` (validated at submit time)."""

    def __init__(self, path: str):
        from sfa3d_tpu.runtime.export import load_exported

        self.artifact = load_exported(path)
        m = self.artifact.manifest
        if m.get("kind") != "fused":
            raise ValueError(
                f"{path}: artifact kind {m.get('kind')!r} cannot back the "
                "fused pipeline (need kind='fused'; export with "
                "`cli export --fused`)"
            )
        self.imgsz = m["letterbox"]
        self.max_points = m["max_points"]
        self.img_hw = tuple(m["img_hw"])
        self.fixed_batch = m["batch"]  # None == symbolic
        self.kvars = None  # weights live inside the artifact
        self.yvars = None

    def _run(self, kvars, yvars, pts, valid, img, V2C, R0, P2,
             hw=None, scale=None, pad=None):
        # hw/scale/pad are baked constants in the exported program
        return self.artifact.call(pts, valid, img, V2C, R0, P2)

    def detect(self, points: np.ndarray, image_rgb: np.ndarray, calib) -> Dict:
        """One frame through the artifact (FusedDetector.detect parity)."""
        from sfa3d_tpu.models.yolov8 import letterbox
        from sfa3d_tpu.ops.bev import filter_and_pad_points

        h, w = image_rgb.shape[:2]
        if (h, w) != self.img_hw:
            raise ValueError(
                f"frame is {h}x{w} but the artifact bakes img_hw="
                f"{list(self.img_hw)}; re-export for this camera"
            )
        pts, valid = filter_and_pad_points(points, max_points=self.max_points)
        img, _, _ = letterbox(image_rgb, self.imgsz)
        out = self._run(
            None, None, pts[None], valid[None],
            img[None].astype(np.float32),
            np.asarray(calib.V2C, np.float32)[None],
            np.asarray(calib.R0, np.float32)[None],
            np.asarray(calib.P2, np.float32)[None],
        )
        v = np.asarray(out["valid"])[0]
        m3 = np.asarray(out["mask_3d"])[0]
        return {
            "boxes": np.asarray(out["boxes"])[0][v].astype(int),
            "scores": np.asarray(out["scores"])[0][v],
            "classes": np.asarray(out["classes"])[0][v],
            "source": np.asarray(out["source"])[0][v],
            "boxes_3d": np.asarray(out["boxes_real"])[0][m3],
        }


class FusedDetector:
    """One-object API for the camera-LiDAR fusion path — the reference's
    test6 flow (SFA3D + YOLOv8 + Bayesian fusion + Gaussian NMS,
    test6.py:474-637) behind a single call, with the whole device side as
    ONE jit program per batch (fusion/batch.py).

        fd = FusedDetector()                            # random weights
        fd = FusedDetector(checkpoint="....pth",        # SFA3D weights
                           yolo_checkpoint="yolov8n.pt")  # ultralytics .pt
        out = fd.detect(points, image_rgb, calib)

    Returns {'boxes' (N, 4) int xywh image pixels, 'scores', 'classes',
    'source' (0=yolo, 1=sfa3d, 2=fused), 'boxes_3d' (M, 8) metric rows}.
    """

    def __init__(
        self,
        arch: str = "fpn_resnet_18",
        checkpoint: Optional[str] = None,
        yolo_scale: str = "n",
        yolo_checkpoint: Optional[str] = None,
        mode: str = "bayesian",
        use_gaussian_nms: bool = True,
        K: int = 50,
        max_yolo: int = 64,  # == fusion.DEFAULT_MAX_YOLO (pipeline parity)
        peak_thresh: float = 0.2,
        confidence_threshold: float = 0.25,
        fusion_iou_threshold: float = 0.7,
        gaussian_sigma: float = 0.5,
        imgsz: int = 640,
        dtype: str = "float32",
    ):
        import jax
        import jax.numpy as jnp

        from sfa3d_tpu.fusion.batch import build_fused_pipeline
        from sfa3d_tpu.models import create_model
        from sfa3d_tpu.models.yolov8 import YOLOv8
        from sfa3d_tpu.pipeline import init_detector

        jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        base = Detector(arch=arch, checkpoint=checkpoint, K=K,
                        peak_thresh=peak_thresh, dtype=dtype)
        self.kfpn, self.kvars = base.model, base.variables
        self.imgsz = imgsz

        if yolo_checkpoint:
            from sfa3d_tpu.models.yolov8 import load_yolo_variables

            self.yvars = load_yolo_variables(yolo_checkpoint, scale=yolo_scale)
            # class count comes from the checkpoint (COCO-80 or the
            # framework's own 3-class trained export)
            nc = self.yvars["params"]["detect"]["cv3_0_2"]["bias"].shape[0]
            self.yolo = YOLOv8(scale=yolo_scale, num_classes=int(nc),
                               dtype=jdtype)
        else:
            self.yolo = YOLOv8(scale=yolo_scale, dtype=jdtype)
            self.yvars = self.yolo.init(
                jax.random.PRNGKey(1),
                np.zeros((1, imgsz, imgsz, 3), np.float32), train=False,
            )

        self._run = build_fused_pipeline(
            self.kfpn, self.yolo, K=K, max_yolo=max_yolo, mode=mode,
            use_gaussian_nms=use_gaussian_nms, peak_thresh=peak_thresh,
            confidence_threshold=confidence_threshold,
            fusion_iou_threshold=fusion_iou_threshold,
            gaussian_sigma=gaussian_sigma,
        )

    def detect(self, points: np.ndarray, image_rgb: np.ndarray, calib) -> Dict:
        """One frame: (N, 4) raw velodyne scan + HxWx3 RGB + calibration."""
        import jax.numpy as jnp

        from sfa3d_tpu.models.yolov8 import letterbox
        from sfa3d_tpu.ops.bev import filter_and_pad_points

        pts, valid = filter_and_pad_points(points, max_points=cnf.MAX_POINTS_FILTERED)
        img, r, (pad_w, pad_h) = letterbox(image_rgb, self.imgsz)
        h, w = image_rgb.shape[:2]
        out = self._run(
            self.kvars, self.yvars,
            jnp.asarray(pts[None]), jnp.asarray(valid[None]),
            jnp.asarray(img[None]),
            jnp.asarray(np.asarray(calib.V2C, np.float32)[None]),
            jnp.asarray(np.asarray(calib.R0, np.float32)[None]),
            jnp.asarray(np.asarray(calib.P2, np.float32)[None]),
            jnp.asarray(np.float32([[h, w]])),
            jnp.asarray(np.float32([r])),
            jnp.asarray(np.float32([[pad_w, pad_h]])),
        )
        v = np.asarray(out["valid"])[0]
        m3 = np.asarray(out["mask_3d"])[0]
        return {
            "boxes": np.asarray(out["boxes"])[0][v].astype(int),
            "scores": np.asarray(out["scores"])[0][v],
            "classes": np.asarray(out["classes"])[0][v],
            "source": np.asarray(out["source"])[0][v],
            "boxes_3d": np.asarray(out["boxes_real"])[0][m3],
        }
