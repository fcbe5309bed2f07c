"""Full camera-LiDAR fusion frame pipeline.

The orchestrator the reference spreads over test4/5/6.py main loops
(test6.py:474-637): per frame, run YOLOv8 on the camera image and SFA3D on
the LiDAR scan, project the 3D detections into the image, confidence-gate
both sets, fuse with the selected strategy, then (optionally) hard-NMS the
fused set. Device work (both networks, decode, projection, fusion math) is
jit; only image letterboxing and the final ragged unpack run on the host.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from sfa3d_tpu.fusion.boxes2d import project_boxes_to_image
from sfa3d_tpu.fusion.fuse import (
    DetectionSet,
    filter_by_confidence,
    fuse_bayesian,
    fuse_union_nms,
    fuse_weighted,
)
from sfa3d_tpu.fusion.nms import hard_nms, soft_nms_gaussian


FUSION_MODES = ("nms", "weighted", "bayesian")


def fuse_frame(
    yolo_boxes_xywh,
    yolo_scores,
    yolo_classes,
    sfa_boxes_real,
    sfa_scores,
    sfa_mask,
    calib,
    img_shape,
    *,
    mode: str = "bayesian",
    confidence_threshold: float = 0.25,
    fusion_iou_threshold: float = 0.7,
    nms_threshold: float = 0.5,
    use_gaussian_nms: bool = False,
    gaussian_sigma: float = 0.5,
    sfa_conf_gate: float = 0.3,
    max_yolo: int = 64,  # == fusion.DEFAULT_MAX_YOLO (batched-pipeline parity)
) -> Dict[str, np.ndarray]:
    """Fuse one frame's detections.

    Args:
      yolo_*: host lists/arrays from YOLOv8Detector (original image pixels).
      sfa_boxes_real: (K, 8) metric rows [cls, x, y, z, h, w, l, yaw],
      sfa_scores/sfa_mask: (K,) from the SFA3D decode.
      calib: KittiCalibration (V2C/R0/P2).
      img_shape: (H, W) of the camera image.

    Returns dict with 'boxes' (N, 4) int xywh, 'scores' (N,), 'classes'
    (N,), 'source' (N,) {0: yolo, 1: sfa3d, 2: fused} after unpadding.
    """
    if mode not in FUSION_MODES:
        raise ValueError(f"mode must be one of {FUSION_MODES}")
    img_h, img_w = int(img_shape[0]), int(img_shape[1])

    # SFA3D -> 2D image boxes (device)
    sfa2d, sfa_valid = project_boxes_to_image(
        jnp.asarray(sfa_boxes_real, jnp.float32),
        jnp.asarray(sfa_scores, jnp.float32),
        jnp.asarray(sfa_mask),
        jnp.asarray(calib.V2C, jnp.float32),
        jnp.asarray(calib.R0, jnp.float32),
        jnp.asarray(calib.P2, jnp.float32),
        img_h=img_h,
        img_w=img_w,
        conf_gate=sfa_conf_gate,
    )
    sfa_set = DetectionSet(
        sfa2d,
        jnp.asarray(sfa_scores, jnp.float32),
        jnp.asarray(sfa_boxes_real, jnp.float32)[:, 0].astype(jnp.int32),
        sfa_valid,
    )

    # YOLO set: pad to fixed slots
    ky = max_yolo
    yb = np.zeros((ky, 4), np.float32)
    ys = np.zeros((ky,), np.float32)
    yc = np.zeros((ky,), np.int32)
    yv = np.zeros((ky,), bool)
    n = min(len(yolo_boxes_xywh), ky)
    if len(yolo_boxes_xywh) > ky:
        import warnings

        warnings.warn(
            f"fuse_frame: {len(yolo_boxes_xywh)} YOLO detections exceed the "
            f"{ky} fixed slots; keeping the first {ky} (sort by confidence "
            "or raise max_yolo)",
            RuntimeWarning,
            stacklevel=2,
        )
    if n:
        yb[:n] = np.asarray(yolo_boxes_xywh, np.float32)[:n]
        ys[:n] = np.asarray(yolo_scores, np.float32)[:n]
        yc[:n] = np.asarray(yolo_classes, np.int32)[:n]
        yv[:n] = True
    yolo_set = DetectionSet(
        jnp.asarray(yb), jnp.asarray(ys), jnp.asarray(yc), jnp.asarray(yv)
    )

    # confidence gate both sets (test6.py:310-348)
    yolo_set = filter_by_confidence(yolo_set, confidence_threshold)
    sfa_set = filter_by_confidence(sfa_set, confidence_threshold)

    if mode == "nms":
        fused, source = fuse_union_nms(yolo_set, sfa_set, nms_threshold)
    elif mode == "weighted":
        fused, source = fuse_weighted(yolo_set, sfa_set, fusion_iou_threshold)
        keep = hard_nms(fused.boxes, fused.scores, fused.valid, nms_threshold)
        fused = fused._replace(valid=fused.valid & keep)
    else:
        fused, source = fuse_bayesian(yolo_set, sfa_set, fusion_iou_threshold)
        if use_gaussian_nms:
            new_scores, surv = soft_nms_gaussian(
                fused.boxes, fused.scores, fused.valid, sigma=gaussian_sigma
            )
            fused = fused._replace(scores=new_scores, valid=surv)
        else:
            keep = hard_nms(fused.boxes, fused.scores, fused.valid, nms_threshold)
            fused = fused._replace(valid=fused.valid & keep)

    valid = np.asarray(fused.valid)
    return {
        "boxes": np.asarray(fused.boxes)[valid].astype(int),
        "scores": np.asarray(fused.scores)[valid],
        "classes": np.asarray(fused.classes)[valid],
        "source": np.asarray(source)[valid],
    }
