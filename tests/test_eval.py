"""Rotated IoU (Monte-Carlo oracle) + KITTI AP evaluator."""

import numpy as np
import pytest

import jax.numpy as jnp

from sfa3d_tpu.eval import evaluate_kitti_ap
from sfa3d_tpu.ops.rotated_iou import (
    box_corners_bev,
    iou_3d,
    iou_bev_rotated,
    pairwise_iou_3d,
)


def mc_iou_bev(b1, b2, n=200000, rng=None):
    """Monte-Carlo oracle for rotated-rect IoU."""
    rng = rng or np.random.default_rng(0)
    c1 = np.asarray(box_corners_bev(jnp.asarray(b1, jnp.float32)))
    c2 = np.asarray(box_corners_bev(jnp.asarray(b2, jnp.float32)))
    lo = np.minimum(c1.min(0), c2.min(0)) - 0.1
    hi = np.maximum(c1.max(0), c2.max(0)) + 0.1
    pts = rng.uniform(lo, hi, (n, 2))

    def inside(corners, p):
        res = np.ones(len(p), bool)
        for i in range(4):
            a, b = corners[i], corners[(i + 1) % 4]
            cross = (b[0] - a[0]) * (p[:, 1] - a[1]) - (b[1] - a[1]) * (p[:, 0] - a[0])
            res &= cross >= 0
        return res

    in1 = inside(c1, pts)
    in2 = inside(c2, pts)
    area = np.prod(hi - lo)
    inter = in1 & in2
    union = in1 | in2
    return inter.sum() / max(union.sum(), 1)


@pytest.mark.parametrize("case", [
    # identical boxes
    ([0, 0, 2, 4, 0.3], [0, 0, 2, 4, 0.3], 1.0),
    # disjoint
    ([0, 0, 2, 4, 0.0], [10, 10, 2, 4, 0.0], 0.0),
])
def test_rotated_iou_exact_cases(case):
    b1, b2, expect = case
    got = float(iou_bev_rotated(jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)))
    assert got == pytest.approx(expect, abs=1e-5)


def test_rotated_iou_vs_monte_carlo(rng):
    for _ in range(8):
        b1 = [rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 3),
              rng.uniform(2, 5), rng.uniform(-np.pi, np.pi)]
        b2 = [b1[0] + rng.uniform(-2, 2), b1[1] + rng.uniform(-2, 2),
              rng.uniform(1, 3), rng.uniform(2, 5), rng.uniform(-np.pi, np.pi)]
        got = float(iou_bev_rotated(jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)))
        oracle = mc_iou_bev(b1, b2, rng=np.random.default_rng(1))
        assert got == pytest.approx(oracle, abs=0.01), (b1, b2)


def test_iou3d_height_overlap():
    # same footprint, half height overlap
    b1 = jnp.asarray([0, 0, 0.0, 2.0, 2, 4, 0.0], jnp.float32)
    b2 = jnp.asarray([0, 0, 1.0, 2.0, 2, 4, 0.0], jnp.float32)
    # inter = area * 1.0, union = 2*vol - inter = 2*16-8=24 -> 1/3
    assert float(iou_3d(b1, b2)) == pytest.approx(1 / 3, abs=1e-5)
    # zero height overlap
    b3 = jnp.asarray([0, 0, 5.0, 2.0, 2, 4, 0.0], jnp.float32)
    assert float(iou_3d(b1, b3)) == 0.0


def test_ap_perfect_and_degraded(rng):
    gt_frames, det_frames_perfect, det_frames_half = [], [], []
    for f in range(4):
        m = 5
        boxes = np.zeros((m, 7), np.float32)
        boxes[:, 0] = rng.uniform(5, 45, m)
        boxes[:, 1] = rng.uniform(-20, 20, m)
        boxes[:, 2] = -1.7
        boxes[:, 3] = 1.5
        boxes[:, 4] = 1.6
        boxes[:, 5] = 3.9
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, m)
        classes = rng.integers(0, 3, m)
        gt_frames.append({"boxes": boxes, "classes": classes})
        det_frames_perfect.append(
            {"boxes": boxes.copy(), "scores": rng.uniform(0.5, 1.0, m), "classes": classes}
        )
        # half the detections shifted far away -> false positives + misses
        bad = boxes.copy()
        bad[::2, 0] += 20.0
        det_frames_half.append(
            {"boxes": bad, "scores": rng.uniform(0.5, 1.0, m), "classes": classes}
        )

    perfect = evaluate_kitti_ap(det_frames_perfect, gt_frames)
    assert perfect["mAP"] == pytest.approx(1.0, abs=1e-6)
    degraded = evaluate_kitti_ap(det_frames_half, gt_frames)
    assert 0.0 < degraded["mAP"] < 0.8

    empty = evaluate_kitti_ap(
        [{"boxes": np.zeros((0, 7)), "scores": np.zeros(0), "classes": np.zeros(0)}] * 4,
        gt_frames,
    )
    assert empty["mAP"] == 0.0
