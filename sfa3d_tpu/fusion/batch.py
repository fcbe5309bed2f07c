"""The WHOLE fusion pipeline — LiDAR + camera — as one batched XLA program.

This is the end-to-end path BASELINE.md's headline metric names (reference
test6.py:474-637, per frame): SFA3D on the LiDAR scan (BEV raster -> KFPN ->
decode -> metric boxes), YOLOv8 on the camera image (backbone -> DFL decode
-> per-class NMS), 3D-to-2D projection, confidence gating, Bayesian fusion
and Gaussian soft-NMS. The reference runs each stage on a different engine
(numpy BEV, torch SFA3D, ultralytics YOLO, Python fusion loops) with host
hops between all of them; here every stage is fixed-shape jax and the batch
runs as ONE jit program per step — both networks share the MXU, the fusion
math fuses into the decode epilogue, and nothing touches the host.

Frame inputs per batch element:
  points (P, 4) + valid (P,)   raw padded velodyne scan
  image (S, S, 3) float [0,1]  letterboxed RGB (host letterbox, yolov8.py)
  V2C (3, 4), R0 (3, 3), P2 (3, 4)   calibration
  img_hw (2,)                  ORIGINAL camera image (h, w) in pixels
  lb_scale (), lb_pad (2,)     letterbox scale r and (pad_w, pad_h)

Fused outputs are in original camera pixels, fixed (max_yolo + K) slots.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from sfa3d_tpu.fusion.boxes2d import project_boxes_to_image
from sfa3d_tpu.fusion.fuse import (
    DetectionSet,
    filter_by_confidence,
    fuse_bayesian,
    fuse_union_nms,
    fuse_weighted,
)
from sfa3d_tpu.fusion.nms import hard_nms, soft_nms_gaussian
from sfa3d_tpu.models import clamped_sigmoid
from sfa3d_tpu.models.yolov8 import decode_predictions, select_detections
from sfa3d_tpu.ops.bev import points_to_bev
from sfa3d_tpu.ops.decode import decode, detections_to_real, post_processing


def _unletterbox_xywh(boxes_xyxy, scale, pad, img_hw):
    """Letterboxed xyxy -> original-pixel int-truncated xywh
    (YOLOv8Detector.__call__ epilogue, models/yolov8.py:366-376, in-jit)."""
    x1 = (boxes_xyxy[:, 0] - pad[0]) / scale
    y1 = (boxes_xyxy[:, 1] - pad[1]) / scale
    x2 = (boxes_xyxy[:, 2] - pad[0]) / scale
    y2 = (boxes_xyxy[:, 3] - pad[1]) / scale
    h, w = img_hw[0], img_hw[1]
    x1, x2 = jnp.clip(x1, 0, w), jnp.clip(x2, 0, w)
    y1, y2 = jnp.clip(y1, 0, h), jnp.clip(y2, 0, h)
    x1, y1, x2, y2 = map(jnp.trunc, (x1, y1, x2, y2))
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def _fuse_one(
    yolo_boxes,
    yolo_scores,
    yolo_classes,
    yolo_valid,
    sfa_boxes2d,
    sfa_scores,
    sfa_classes,
    sfa_valid,
    *,
    mode: str,
    confidence_threshold: float,
    fusion_iou_threshold: float,
    nms_threshold: float,
    use_gaussian_nms: bool,
    gaussian_sigma: float,
):
    """Per-frame strategy dispatch (fusion/pipeline.py:106-121 semantics)."""
    yolo_set = filter_by_confidence(
        DetectionSet(yolo_boxes, yolo_scores, yolo_classes, yolo_valid),
        confidence_threshold,
    )
    sfa_set = filter_by_confidence(
        DetectionSet(sfa_boxes2d, sfa_scores, sfa_classes, sfa_valid),
        confidence_threshold,
    )
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
    return fused, source


def build_fused_pipeline(
    kfpn_model,
    yolo_model,
    *,
    K: int = 50,
    max_yolo: int = 64,  # == fusion.DEFAULT_MAX_YOLO (host-pipeline parity)
    mode: str = "bayesian",
    use_gaussian_nms: bool = True,
    peak_thresh: float = 0.2,
    sfa_conf_gate: float = 0.2,
    yolo_conf: float = 0.25,
    yolo_iou: float = 0.45,
    confidence_threshold: float = 0.25,
    fusion_iou_threshold: float = 0.7,
    nms_threshold: float = 0.5,
    gaussian_sigma: float = 0.5,
    return_bev: bool = False,
    bev_size=(608, 608),
    mesh=None,
):
    """Build the jitted batched fusion step.

    Returns fn(kfpn_vars, yolo_vars, points, valid, images, V2C, R0, P2,
    img_hw, lb_scale, lb_pad) -> dict with:
      boxes (B, max_yolo+K, 4) int-valued xywh in original camera pixels
      scores / classes / valid / source (B, max_yolo+K)
      boxes_real (B, K, 8) metric 3D rows + mask_3d (B, K)  (SFA3D branch)
    `source`: 0 = YOLO pass-through, 1 = SFA3D pass-through, 2 = fused.

    `bev_size` shrinks the raster for compile/sharding dry-runs
    (__graft_entry__.dryrun_multichip); metric decode constants assume the
    production 608x608, so non-default sizes are for shape/compile checks
    only.

    `mesh`: an optional 2-D dp x sp `jax.sharding.Mesh` ('data', 'spatial').
    When given, the rasterized BEV and the camera images are sharded over
    ('data', 'spatial') — batch over dp, feature-map ROWS over sp — so both
    conv towers run as spatially-partitioned SPMD programs (XLA inserts the
    halo exchanges). Decode/NMS/fusion stay data-parallel (their fixed-K
    tensors have no spatial axis).
    """
    if mode not in ("nms", "weighted", "bayesian"):
        # match the host path's behavior (fusion/pipeline.py FUSION_MODES):
        # an unknown strategy must fail loudly, not silently run bayesian
        raise ValueError(f"unknown fusion mode: {mode!r}")
    fuse_one = functools.partial(
        _fuse_one,
        mode=mode,
        confidence_threshold=confidence_threshold,
        fusion_iou_threshold=fusion_iou_threshold,
        nms_threshold=nms_threshold,
        use_gaussian_nms=use_gaussian_nms,
        gaussian_sigma=gaussian_sigma,
    )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sfa3d_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS

        spatial_rows = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))

    @jax.jit
    def run(kfpn_vars, yolo_vars, points, valid, images, V2C, R0, P2,
            img_hw, lb_scale, lb_pad) -> Dict[str, Any]:
        # --- SFA3D (LiDAR) branch ---
        bev = jax.vmap(
            lambda p, v: points_to_bev(
                p, v, bev_height=bev_size[0], bev_width=bev_size[1]
            )
        )(points, valid)
        if mesh is not None:
            bev = jax.lax.with_sharding_constraint(bev, spatial_rows)
            images = jax.lax.with_sharding_constraint(images, spatial_rows)
        outputs = kfpn_model.apply(kfpn_vars, bev, train=False)
        dets = decode(
            clamped_sigmoid(outputs["hm_cen"]),
            clamped_sigmoid(outputs["cen_offset"]),
            outputs["direction"].astype(jnp.float32),
            outputs["z_coor"].astype(jnp.float32),
            outputs["dim"].astype(jnp.float32),
            K=K,
        )
        boxes_bev, mask = post_processing(dets, peak_thresh=peak_thresh)
        boxes_real, mask = detections_to_real(boxes_bev, mask)
        sfa_scores = boxes_bev[..., 1]

        sfa2d, sfa_valid = jax.vmap(
            lambda br, sc, m, v2c, r0, p2, hw: project_boxes_to_image(
                br, sc, m, v2c, r0, p2,
                img_h=hw[0], img_w=hw[1], conf_gate=sfa_conf_gate,
            )
        )(boxes_real, sfa_scores, mask, V2C, R0, P2,
          jnp.asarray(img_hw, jnp.float32))

        # --- YOLOv8 (camera) branch ---
        youts = yolo_model.apply(yolo_vars, images, train=False)
        yboxes_all, yscores_all = decode_predictions(youts)
        ysel = jax.vmap(
            lambda b, s: select_detections(
                b, s, conf_thresh=yolo_conf, iou_thresh=yolo_iou,
                max_det=max_yolo,
            )
        )(yboxes_all, yscores_all)
        yb_xyxy, ys, yc, yv = ysel
        yb = jax.vmap(_unletterbox_xywh)(
            yb_xyxy, jnp.asarray(lb_scale, jnp.float32),
            jnp.asarray(lb_pad, jnp.float32), jnp.asarray(img_hw, jnp.float32),
        )

        # --- fuse ---
        fused, source = jax.vmap(
            lambda *a: fuse_one(*a)
        )(yb, ys, yc.astype(jnp.int32), yv,
          sfa2d, sfa_scores, boxes_real[..., 0].astype(jnp.int32), sfa_valid)

        out = {
            "boxes": fused.boxes,
            "scores": fused.scores,
            "classes": fused.classes,
            "valid": fused.valid,
            "source": source,
            "boxes_real": boxes_real,
            "mask_3d": mask,
        }
        if return_bev:
            out["bev"] = bev
        return out

    return run
