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
    # sharing exactly one edge (touching, zero overlap): exercises the
    # near-collinear clip path where a sign-flipped degeneracy clamp
    # would extrapolate intersection points off the segment
    ([0, 0, 2, 4, 0.0], [4.0, 0, 2, 4, 0.0], 0.0),
    # axis-aligned half overlap through the same collinear-edge path
    ([0, 0, 2, 4, 0.0], [2.0, 0, 2, 4, 0.0], 1.0 / 3.0),
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


def test_aos_orientation_similarity(rng):
    """KITTI AOS: exact yaws -> AOS == AP; yaws flipped by pi -> AOS ~ 0
    while AP is untouched (a rotated-box pi-flip keeps the footprint, so
    the IoU matching is identical and only the orientation term collapses);
    90-degree errors land at similarity 0.5."""
    gt_frames, det_exact, det_flipped, det_quarter = [], [], [], []
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
        scores = rng.uniform(0.5, 1.0, m)
        gt_frames.append({"boxes": boxes, "classes": classes})
        det_exact.append({"boxes": boxes.copy(), "scores": scores, "classes": classes})
        flip = boxes.copy()
        flip[:, 6] += np.pi  # same footprint, reversed heading
        det_flipped.append({"boxes": flip, "scores": scores, "classes": classes})
        quarter = boxes.copy()
        quarter[:, 6] += np.pi / 2  # footprint rotates: use BEV-IoU-tolerant
        det_quarter.append({"boxes": quarter, "scores": scores, "classes": classes})

    exact = evaluate_kitti_ap(det_exact, gt_frames, with_aos=True)
    assert exact["mAOS"] == pytest.approx(exact["mAP"], abs=1e-6)
    assert exact["mAOS"] == pytest.approx(1.0, abs=1e-6)

    flipped = evaluate_kitti_ap(det_flipped, gt_frames, with_aos=True)
    assert flipped["mAP"] == pytest.approx(exact["mAP"], abs=1e-6)
    assert flipped["mAOS"] == pytest.approx(0.0, abs=1e-6)

    # without with_aos the result shape is unchanged (no AOS keys)
    plain = evaluate_kitti_ap(det_exact, gt_frames)
    assert not any(k.startswith("AOS") or k == "mAOS" for k in plain)


def _car_box(x):
    return [x, 0.0, -1.7, 1.5, 1.6, 3.9, 0.0]


def test_difficulty_buckets_follow_kitti_protocol():
    """Easy bucket: only Easy GT count toward recall; detections matched to
    harder GT are IGNORED (neither TP nor FP); unmatched stay FP."""
    from sfa3d_tpu.eval import evaluate_kitti_ap, evaluate_kitti_ap_by_difficulty

    gt = {
        "boxes": np.asarray([_car_box(10), _car_box(20), _car_box(30)], np.float32),
        "classes": np.asarray([1, 1, 1]),
        "difficulty": np.asarray([1, 2, 3]),  # Easy, Moderate, Hard
    }
    det = {
        "boxes": np.asarray(
            [_car_box(10), _car_box(20), _car_box(30)], np.float32
        ),
        "scores": np.asarray([0.9, 0.8, 0.7], np.float32),
        "classes": np.asarray([1, 1, 1]),
    }
    table = evaluate_kitti_ap_by_difficulty([det], [gt])
    # every bucket is perfect: in Easy, the Moderate/Hard matches are ignored
    # (not false positives), so precision stays 1.0 at full recall
    for bucket in ("Easy", "Moderate", "Hard"):
        assert table[bucket]["AP_1"] == pytest.approx(1.0, abs=1e-6), bucket

    # a detection matched to NOTHING is a real FP in every bucket
    det_fp = {
        "boxes": np.asarray([_car_box(10), _car_box(55)], np.float32),
        "scores": np.asarray([0.5, 0.9], np.float32),  # FP outscores the TP
        "classes": np.asarray([1, 1]),
    }
    easy = evaluate_kitti_ap([det_fp], [gt], difficulty=1)
    # 1 GT (easy), TP found at rank 2 behind an FP: precision at full recall
    # is 0.5 -> AP well below 1
    assert 0.2 < easy["AP_1"] < 0.8

    # without a 'difficulty' array every GT counts in every bucket
    gt_plain = {k: v for k, v in gt.items() if k != "difficulty"}
    hard_only_det = {
        "boxes": np.asarray([_car_box(30)], np.float32),
        "scores": np.asarray([0.9], np.float32),
        "classes": np.asarray([1]),
    }
    res = evaluate_kitti_ap([hard_only_det], [gt_plain], difficulty=1)
    assert res["AP_1"] == pytest.approx(_expected_recall_ap(1, 3), abs=1e-6)


def _expected_recall_ap(tp, n_gt):
    """AP_R40 for a single clean TP out of n_gt (precision 1 up to recall
    tp/n_gt, 0 beyond)."""
    return sum(1.0 for r in np.linspace(0.025, 1.0, 40) if r <= tp / n_gt) / 40.0


def test_bucket_matching_prefers_countable_gt():
    """KITTI devkit protocol: matching is per-bucket with countable-GT
    preference. A detection whose single BEST overlap is a harder
    (ignored) GT must still match an overlapping countable GT in the
    easier bucket — global one-pass matching would ignore the detection
    AND leave the Easy GT unmatched, deflating Easy AP to 0."""
    from sfa3d_tpu.eval import evaluate_kitti_ap_by_difficulty

    gt = {
        # two overlapping cars: Easy at x=10, Hard at x=10.4
        "boxes": np.asarray([_car_box(10.0), _car_box(10.4)], np.float32),
        "classes": np.asarray([1, 1]),
        "difficulty": np.asarray([1, 3]),
    }
    det = {
        # IoU ~0.95 with the Hard GT, ~0.86 with the Easy GT (both > 0.7)
        "boxes": np.asarray([_car_box(10.3)], np.float32),
        "scores": np.asarray([0.9], np.float32),
        "classes": np.asarray([1]),
    }
    table = evaluate_kitti_ap_by_difficulty([det], [gt])
    # Easy: only the Easy GT counts; the det must match it -> perfect AP
    assert table["Easy"]["AP_1"] == pytest.approx(1.0, abs=1e-6)
    # Hard: both count; the det takes its best (Hard) match, the Easy GT
    # stays unmatched -> recall tops out at 1/2
    assert table["Hard"]["AP_1"] == pytest.approx(
        _expected_recall_ap(1, 2), abs=1e-6
    )


def test_detection_with_zero_gt_of_class_is_fp_not_crash():
    """Regression: a frame with >=1 detection of a class but ZERO ground
    truths of that class must count the detection as a false positive (it
    used to IndexError on the empty countable mask)."""
    from sfa3d_tpu.eval.kitti_eval import (
        evaluate_kitti_ap,
        evaluate_kitti_ap_by_difficulty,
    )

    box = np.asarray([[10.0, 0.0, -1.0, 1.5, 1.6, 3.9, 0.0]], np.float32)
    dets = [{"boxes": box, "scores": np.asarray([0.9]), "classes": np.asarray([2])}]
    gts = [{
        "boxes": box, "classes": np.asarray([1]),  # only a Car GT
        "difficulty": np.asarray([1]),
    }]
    res = evaluate_kitti_ap(dets, gts)
    assert res["AP_1"] == 0.0  # the Car GT is missed (only a Cyclist det)
    assert "AP_2" not in res  # no Cyclist GT anywhere -> class skipped
    table = evaluate_kitti_ap_by_difficulty(dets, gts)
    assert table["Easy"]["AP_1"] == 0.0

    # same frame but WITH a Cyclist GT elsewhere: the unmatched Cyclist
    # detection must now depress Cyclist AP as an FP
    far = box.copy()
    far[0, 0] = 40.0
    gts2 = [{
        "boxes": np.concatenate([box, far]),
        "classes": np.asarray([1, 2]),
        "difficulty": np.asarray([1, 1]),
    }]
    res2 = evaluate_kitti_ap(dets, gts2)
    assert res2["AP_2"] == 0.0  # detection is at the Car's pose, not the bike's


def test_min_height_detection_ignore_follows_devkit():
    """Devkit MIN_HEIGHT rule (evaluate_object.cpp: {40, 25, 25} px): a
    small/far detection is removed from a bucket's PR curve, so a high-score
    far FP cannot poison the Easy bucket — without this rule the full FP
    population penalizes every bucket and inverts Easy >= Mod >= Hard
    whenever score and difficulty decorrelate (round-4 finding)."""
    import numpy as np

    from sfa3d_tpu.eval import evaluate_kitti_ap

    gt = {
        "boxes": np.asarray([[10.0, 0, -1, 1.5, 1.6, 3.9, 0.0]], np.float32),
        "classes": np.asarray([1]),
        "difficulty": np.asarray([1]),  # one Easy GT
    }
    det = {
        "boxes": np.asarray(
            [
                [10.0, 0, -1, 1.5, 1.6, 3.9, 0.0],   # exact TP
                [40.0, 10, -1, 1.5, 1.6, 3.9, 0.0],  # far FP, outranks TP
            ],
            np.float32,
        ),
        "scores": np.asarray([0.6, 0.9], np.float32),
        "classes": np.asarray([1, 1]),
        "heights": np.asarray([60.0, 30.0], np.float32),  # far det is small
    }
    # Easy: the 30-px FP is ignored (< 40) -> perfect PR -> AP 1
    easy = evaluate_kitti_ap([det], [gt], difficulty=1)
    assert easy["AP_1"] == pytest.approx(1.0)
    # Moderate: 30 px >= 25 -> the FP counts and outranks the TP -> AP < 1
    mod = evaluate_kitti_ap([det], [gt], difficulty=2)
    assert mod["AP_1"] < 1.0
    # no heights supplied -> rule off -> FP poisons Easy too
    det_nh = {k: v for k, v in det.items() if k != "heights"}
    easy_nh = evaluate_kitti_ap([det_nh], [gt], difficulty=1)
    assert easy_nh["AP_1"] < 1.0
    # undifficultied mAP ignores heights entirely
    overall = evaluate_kitti_ap([det], [gt])
    assert overall["AP_1"] == easy_nh["AP_1"]
