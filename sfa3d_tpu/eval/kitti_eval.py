"""KITTI-style 3D average precision.

The reference has NO evaluation code — its README AP table ships without a
generating script (SURVEY.md section 2.6). This module provides the missing
capability: per-class AP with the standard KITTI protocol shape —
greedy score-ordered matching at class IoU thresholds (0.7 car, 0.5
pedestrian/cyclist), 40-point interpolated AP (R40), and optional
difficulty filtering when per-object difficulty levels are supplied. The
pairwise rotated 3D IoU matrices run on device (ops/rotated_iou.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from sfa3d_tpu.ops.rotated_iou import pairwise_iou_3d, pairwise_iou_bev_rotated

CLASS_IOU_THRESH = {0: 0.5, 1: 0.7, 2: 0.5}  # Pedestrian, Car, Cyclist


def _ap_r40(recall: np.ndarray, precision: np.ndarray) -> float:
    """40-point interpolated AP (KITTI R40)."""
    ap = 0.0
    for r in np.linspace(0.025, 1.0, 40):
        p = precision[recall >= r]
        ap += (p.max() if len(p) else 0.0) / 40.0
    return float(ap)


_PAD = 64  # fixed IoU problem size: one XLA compilation serves every frame


def _pad_rows(a, n):
    out = np.zeros((n,) + a.shape[1:], np.float32)
    k = min(len(a), n)
    out[:k] = a[:k]
    return out


def _match_frame(det_boxes, det_scores, gt_boxes, iou_thresh, metric):
    """Greedy matching of one frame's detections to GT. Returns
    (K,) int match indices into gt (-1 = unmatched)."""
    nd, ng = len(det_boxes), len(gt_boxes)
    if nd == 0 or ng == 0:
        return np.full(nd, -1, np.int64)
    # pad to a fixed shape: per-frame ragged (nd, ng) would recompile the
    # jitted pairwise kernels for every distinct size pair
    pad = max(_PAD, nd, ng)
    dpad = _pad_rows(np.asarray(det_boxes, np.float32), pad)
    gpad = _pad_rows(np.asarray(gt_boxes, np.float32), pad)
    if metric == "3d":
        iou = np.asarray(pairwise_iou_3d(dpad, gpad))[:nd, :ng]
    else:
        iou = np.asarray(
            pairwise_iou_bev_rotated(dpad[:, [0, 1, 4, 5, 6]], gpad[:, [0, 1, 4, 5, 6]])
        )[:nd, :ng]
    order = np.argsort(-det_scores)
    gt_used = np.zeros(ng, bool)
    match = np.full(nd, -1, np.int64)
    for i in order:
        j = int(np.argmax(np.where(gt_used, -1.0, iou[i])))
        if not gt_used[j] and iou[i, j] >= iou_thresh:
            match[i] = j
            gt_used[j] = True
    return match


DIFFICULTY_NAMES = {1: "Easy", 2: "Moderate", 3: "Hard"}


def evaluate_kitti_ap(
    detections: Sequence[Dict],
    ground_truths: Sequence[Dict],
    num_classes: int = 3,
    metric: str = "3d",
    iou_thresholds: Optional[Dict[int, float]] = None,
    difficulty: Optional[int] = None,
) -> Dict[str, float]:
    """Compute per-class AP over a set of frames.

    Args:
      detections: per frame {'boxes': (N, 7) [x,y,z,h,w,l,yaw] velodyne,
        'scores': (N,), 'classes': (N,)} numpy arrays (masked rows removed).
      ground_truths: per frame {'boxes': (M, 7), 'classes': (M,),
        optional 'difficulty': (M,) int levels 1=Easy 2=Moderate 3=Hard
        4=unknown (Object3d.get_obj_level)}.
      metric: '3d' (volume IoU) or 'bev' (rotated BEV IoU).
      difficulty: KITTI bucket (1/2/3). When set, GT with level <= difficulty
        count toward recall; HARDER GT are "ignored" per the KITTI protocol —
        detections matched to them are neither TP nor FP (frames without a
        'difficulty' array treat every GT as countable).

    Returns {'AP_<cls>': ap, ..., 'mAP': mean}.
    """
    matches = _collect_matches(
        detections, ground_truths, num_classes, metric,
        iou_thresholds or CLASS_IOU_THRESH,
    )
    return _score_bucket(matches, num_classes, difficulty)


def _collect_matches(detections, ground_truths, num_classes, metric,
                     iou_thresholds):
    """Run the (device-IoU) greedy matching ONCE per (frame, class) — the
    difficulty buckets only change which GT are countable, so all four AP
    tables re-score the same matches."""
    assert len(detections) == len(ground_truths)
    per_class: Dict[int, List] = {cls: [] for cls in range(num_classes)}
    for det, gt in zip(detections, ground_truths):
        det_classes = np.asarray(det["classes"])
        gt_classes = np.asarray(gt["classes"])
        levels_all = np.asarray(gt["difficulty"]) if "difficulty" in gt else None
        for cls in range(num_classes):
            dm = det_classes == cls
            gm = gt_classes == cls
            det_scores = np.asarray(det["scores"], np.float32)[dm]
            gt_boxes = np.asarray(gt["boxes"], np.float32)[gm]
            match = _match_frame(
                np.asarray(det["boxes"], np.float32)[dm], det_scores,
                gt_boxes, iou_thresholds[cls], metric,
            )
            levels = levels_all[gm] if levels_all is not None else None
            per_class[cls].append((det_scores, match, len(gt_boxes), levels))
    return per_class


def _score_bucket(per_class, num_classes, difficulty):
    results = {}
    aps = []
    for cls in range(num_classes):
        scores_all: List[np.ndarray] = []
        tp_all: List[np.ndarray] = []
        n_gt = 0
        for det_scores, match, ng, levels in per_class[cls]:
            if difficulty is not None and levels is not None:
                countable = levels <= difficulty
            else:
                countable = np.ones(ng, bool)
            n_gt += int(countable.sum())
            if ng:
                # detections matched to an out-of-bucket GT are dropped from
                # the PR curve entirely (KITTI "ignored": not FP, not TP)
                ignored = (match >= 0) & ~countable[np.maximum(match, 0)]
            else:
                ignored = np.zeros(len(match), bool)  # all unmatched -> FP
            scores_all.append(det_scores[~ignored])
            tp_all.append((match >= 0)[~ignored])
        scores = np.concatenate(scores_all) if scores_all else np.zeros(0)
        tps = np.concatenate(tp_all) if tp_all else np.zeros(0, bool)
        if n_gt == 0:
            continue
        order = np.argsort(-scores)
        tps = tps[order]
        cum_tp = np.cumsum(tps)
        cum_fp = np.cumsum(~tps)
        recall = cum_tp / n_gt
        precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
        ap = _ap_r40(recall, precision) if len(recall) else 0.0
        results[f"AP_{cls}"] = ap
        aps.append(ap)
    results["mAP"] = float(np.mean(aps)) if aps else 0.0
    return results


def evaluate_kitti_ap_by_difficulty(
    detections: Sequence[Dict],
    ground_truths: Sequence[Dict],
    num_classes: int = 3,
    metric: str = "3d",
    iou_thresholds: Optional[Dict[int, float]] = None,
) -> Dict[str, Dict[str, float]]:
    """Easy/Moderate/Hard AP table — the shape of the reference's published
    results (/root/reference/README.md:223-226). Matching runs once; the
    three buckets re-score the same matches."""
    matches = _collect_matches(
        detections, ground_truths, num_classes, metric,
        iou_thresholds or CLASS_IOU_THRESH,
    )
    return {
        name: _score_bucket(matches, num_classes, level)
        for level, name in DIFFICULTY_NAMES.items()
    }
