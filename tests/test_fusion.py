"""Fusion-layer parity.

The reference fusion scripts (test4/5/6.py) import ultralytics/easydict at
module level and cannot be imported here, so the oracles below re-derive the
documented algorithms (greedy IoU match, weighted average, inverse-variance
fusion, greedy NMS) in plain numpy, following test5.py:213-282 and
test6.py:212-309 semantics exactly (dict lists, int truncation, tie rules).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sfa3d_tpu.fusion.fuse import DetectionSet


def _pad_set(boxes, scores, classes, k):
    b = np.zeros((k, 4), np.float32)
    s = np.zeros((k,), np.float32)
    c = np.zeros((k,), np.int32)
    v = np.zeros((k,), bool)
    n = len(boxes)
    if n:
        b[:n] = boxes
        s[:n] = scores
        c[:n] = classes
        v[:n] = True
    return DetectionSet(jnp.asarray(b), jnp.asarray(s), jnp.asarray(c), jnp.asarray(v))


def ref_iou(b1, b2):
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    xl = max(x1, x2)
    yt = max(y1, y2)
    xr = min(x1 + w1, x2 + w2)
    yb = min(y1 + h1, y2 + h2)
    if xr < xl or yb < yt:
        return 0.0
    inter = (xr - xl) * (yb - yt)
    union = w1 * h1 + w2 * h2 - inter
    return inter / union if union > 0 else 0.0


def ref_greedy_fuse(yolo, sfa, thresh, mode):
    """Oracle for test5 (mode='weighted') / test6 (mode='bayesian')."""
    fused = []
    matched = [False] * len(sfa)
    for yb, yc in yolo:
        best, best_iou = -1, 0.0
        for i, (sb, sc) in enumerate(sfa):
            if matched[i]:
                continue
            iou = ref_iou(yb, sb)
            if iou > best_iou and iou >= thresh:
                best_iou, best = iou, i
        if best >= 0:
            sb, sc = sfa[best]
            if mode == "weighted":
                total = yc + sc
                wy = 0.5 if total == 0 else yc / total
                ws = 0.5 if total == 0 else sc / total
                fb = [int(wy * yb[i] + ws * sb[i]) for i in range(4)]
            else:
                def c2v(c, mx):
                    return mx * 100.0 if c < 0.1 else mx * (1.0 - c) / (c + 0.01)

                def g(m1, v1, m2, v2):
                    v1, v2 = max(v1, 1e-6), max(v2, 1e-6)
                    return (m1 / v1 + m2 / v2) / (1 / v1 + 1 / v2)

                fb = [
                    int(g(yb[0], c2v(yc, 100.0), sb[0], c2v(sc, 100.0))),
                    int(g(yb[1], c2v(yc, 100.0), sb[1], c2v(sc, 100.0))),
                    int(g(yb[2], c2v(yc, 50.0), sb[2], c2v(sc, 50.0))),
                    int(g(yb[3], c2v(yc, 50.0), sb[3], c2v(sc, 50.0))),
                ]
            fused.append((fb, max(yc, sc), "fused"))
            matched[best] = True
        else:
            fused.append((list(yb), yc, "yolo"))
    for i, (sb, sc) in enumerate(sfa):
        if not matched[i]:
            fused.append((list(sb), sc, "sfa"))
    return fused


def ref_hard_nms(dets, thresh):
    """Oracle for apply_nms_to_fused_detections (test4.py:103-125)."""
    order = sorted(range(len(dets)), key=lambda i: -dets[i][1])
    kept = []
    for i in order:
        if all(ref_iou(dets[i][0], dets[j][0]) <= thresh for j in kept):
            kept.append(i)
    return sorted(kept)


def random_sets(rng, ny=6, ns=5, overlap=3):
    yolo = []
    for _ in range(ny):
        yolo.append((
            [float(rng.uniform(0, 800)), float(rng.uniform(0, 300)),
             float(rng.uniform(40, 150)), float(rng.uniform(40, 120))],
            float(rng.uniform(0.2, 0.99)),
        ))
    sfa = []
    for i in range(ns):
        if i < overlap:  # jittered copy of a yolo box -> high IoU
            b, _ = yolo[i]
            jit = [b[0] + rng.uniform(-5, 5), b[1] + rng.uniform(-5, 5),
                   b[2] * rng.uniform(0.9, 1.1), b[3] * rng.uniform(0.9, 1.1)]
            sfa.append(([float(x) for x in jit], float(rng.uniform(0.2, 0.99))))
        else:
            sfa.append((
                [float(rng.uniform(800, 1100)), float(rng.uniform(0, 300)),
                 float(rng.uniform(40, 150)), float(rng.uniform(40, 120))],
                float(rng.uniform(0.2, 0.99)),
            ))
    return yolo, sfa


@pytest.mark.parametrize("mode", ["weighted", "bayesian"])
@pytest.mark.parametrize("thresh", [0.5, 0.8])
def test_fusion_matches_oracle(rng, mode, thresh):
    from sfa3d_tpu.fusion.fuse import fuse_bayesian, fuse_weighted

    yolo, sfa = random_sets(rng)
    k = 8
    yset = _pad_set([b for b, _ in yolo], [c for _, c in yolo], [0] * len(yolo), k)
    sset = _pad_set([b for b, _ in sfa], [c for _, c in sfa], [1] * len(sfa), k)

    fn = fuse_weighted if mode == "weighted" else fuse_bayesian
    out, source = fn(yset, sset, thresh)

    ref = ref_greedy_fuse(yolo, sfa, thresh, mode)
    got_boxes = np.asarray(out.boxes)[np.asarray(out.valid)]
    got_scores = np.asarray(out.scores)[np.asarray(out.valid)]
    assert len(ref) == len(got_boxes)
    # match by sorting rows (output order: yolo slots then sfa slots; the
    # oracle interleaves unmatched-sfa at the end too)
    ref_rows = sorted([tuple(b) + (round(c, 5),) for b, c, _ in ref])
    got_rows = sorted(
        [tuple(map(float, b)) + (round(float(c), 5),) for b, c in zip(got_boxes, got_scores)]
    )
    for r, g in zip(ref_rows, got_rows):
        np.testing.assert_allclose(g, r, atol=1e-4)


def test_hard_nms_matches_oracle(rng):
    from sfa3d_tpu.fusion.nms import hard_nms

    yolo, sfa = random_sets(rng, ny=8, ns=6, overlap=4)
    dets = yolo + sfa
    boxes = np.asarray([b for b, _ in dets], np.float32)
    scores = np.asarray([c for _, c in dets], np.float32)
    k = 16
    bp = np.zeros((k, 4), np.float32)
    sp = np.zeros((k,), np.float32)
    vp = np.zeros((k,), bool)
    bp[: len(dets)] = boxes
    sp[: len(dets)] = scores
    vp[: len(dets)] = True

    keep = np.asarray(hard_nms(jnp.asarray(bp), jnp.asarray(sp), jnp.asarray(vp), 0.5))
    ref_kept = ref_hard_nms(dets, 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == ref_kept


def test_soft_nms_decays_overlapping(rng):
    from sfa3d_tpu.fusion.nms import soft_nms_gaussian

    boxes = jnp.asarray(
        [[0, 0, 100, 100], [5, 5, 100, 100], [500, 500, 80, 80], [0, 0, 0, 0]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.5])
    valid = jnp.asarray([True, True, True, False])
    out, surv = soft_nms_gaussian(boxes, scores, valid, sigma=0.5)
    out = np.asarray(out)
    assert out[0] == pytest.approx(0.9)  # top box untouched
    assert out[1] < 0.8  # overlapping box decayed
    assert out[2] == pytest.approx(0.7)  # isolated box untouched
    assert out[3] == 0.0 and not bool(np.asarray(surv)[3])


def test_behind_camera_detection_dropped(rng):
    """A 3D box with corners at/behind the camera plane must be INVALID:
    the perspective divide flips sign for z<=0 corners and would span a
    spurious near-full-image 2D box with the detection's real score
    (divergence from the reference, which projects it — TECHNICAL.md)."""
    from sfa3d_tpu.fusion.boxes2d import project_boxes_to_image
    from sfa3d_tpu.config import kitti as cnf

    k = 4
    boxes = np.zeros((k, 8), np.float32)
    # row 0: box hugging the sensor — rear corners land behind the camera
    boxes[0] = [1, 1.2, 0.0, -1.7, 1.5, 1.6, 3.9, 0.0]
    # row 1: normal box well in front
    boxes[1] = [1, 15.0, 0.0, -1.7, 1.5, 1.6, 3.9, 0.0]
    scores = np.asarray([0.9, 0.9, 0, 0], np.float32)
    mask = np.asarray([True, True, False, False])

    b2d, valid = project_boxes_to_image(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask),
        jnp.asarray(cnf.Tr_velo_to_cam[:3]), jnp.asarray(cnf.R0[:3, :3]),
        jnp.asarray(cnf.P2[:3]), img_h=375, img_w=1242, conf_gate=0.3,
    )
    valid = np.asarray(valid)
    assert not valid[0], "behind-camera box must be dropped"
    assert valid[1], "normal box must survive"


def test_projection_matches_reference_recipe(rng):
    """project_boxes_to_image vs a numpy oracle following test6.py:129-186."""
    from sfa3d_tpu.fusion.boxes2d import project_boxes_to_image
    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.geometry.transforms import lidar_to_camera_box

    k = 10
    boxes = np.zeros((k, 8), np.float32)
    n = 6
    boxes[:n, 0] = rng.integers(0, 3, n)
    boxes[:n, 1] = rng.uniform(5, 45, n)
    boxes[:n, 2] = rng.uniform(-15, 15, n)
    boxes[:n, 3] = rng.uniform(-2, 0, n)
    boxes[:n, 4] = rng.uniform(1.4, 1.8, n)
    boxes[:n, 5] = rng.uniform(1.5, 1.8, n)
    boxes[:n, 6] = rng.uniform(3.5, 4.5, n)
    boxes[:n, 7] = rng.uniform(-np.pi, np.pi, n)
    scores = np.zeros(k, np.float32)
    scores[:n] = rng.uniform(0.31, 0.99, n)
    mask = np.zeros(k, bool)
    mask[:n] = True

    V2C = cnf.Tr_velo_to_cam[:3]
    R0 = cnf.R0[:3, :3]
    P2 = cnf.P2[:3]
    b2d, valid = project_boxes_to_image(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask),
        jnp.asarray(V2C), jnp.asarray(R0), jnp.asarray(P2),
        img_h=375, img_w=1242, conf_gate=0.3,
    )
    b2d, valid = np.asarray(b2d), np.asarray(valid)

    for i in range(n):
        cam = np.asarray(lidar_to_camera_box(boxes[i : i + 1, 1:8], V2C, R0, P2))[0]
        x, y, z, h, w, l, ry = cam
        c3d = np.array(
            [
                [-l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2],
                [0, 0, 0, 0, -h, -h, -h, -h],
                [-w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2],
            ]
        )
        R = np.array(
            [
                [np.cos(ry), 0, np.sin(ry)],
                [0, 1, 0],
                [-np.sin(ry), 0, np.cos(ry)],
            ]
        )
        c3d = R @ c3d + np.array([[x], [y], [z]])
        uv = P2 @ np.vstack([c3d, np.ones((1, 8))])
        uv = uv[:2] / uv[2]
        mnx, mxx = max(0, uv[0].min()), min(1242, uv[0].max())
        mny, mxy = max(0, uv[1].min()), min(375, uv[1].max())
        if mxx > mnx and mxy > mny:
            assert valid[i]
            np.testing.assert_allclose(
                b2d[i],
                [int(mnx), int(mny), int(mxx - mnx), int(mxy - mny)],
                atol=1.0,  # int truncation at float32 boundaries
            )
        else:
            assert not valid[i]


def test_rescore_3d_from_camera():
    """Hand-built oracle: a camera-confirmed 3D detection takes
    max(conf_3d, conf_2d); unconfirmed and invalid detections pass through;
    a camera box below the IoU threshold confirms nothing."""
    from sfa3d_tpu.fusion.fuse import rescore_3d_from_camera

    # 3 SFA detections projected to the image plane (xywh)
    sfa2d = DetectionSet(
        boxes=jnp.asarray([[100.0, 100, 50, 40],
                           [400.0, 120, 60, 50],
                           [800.0, 90, 40, 30]]),
        scores=jnp.asarray([0.30, 0.60, 0.25]),
        classes=jnp.asarray([1, 1, 0], jnp.int32),
        valid=jnp.asarray([True, True, False]),
    )
    scores3d = jnp.asarray([0.30, 0.60, 0.25])
    cam = DetectionSet(
        # box 0 overlaps sfa det 0 heavily (IoU ~0.82); box 1 overlaps
        # nothing above threshold (far corner of det 1, IoU ~0.09)
        boxes=jnp.asarray([[102.0, 102, 50, 40],
                           [450.0, 160, 60, 50]]),
        scores=jnp.asarray([0.90, 0.95]),
        classes=jnp.asarray([1, 1], jnp.int32),
        valid=jnp.asarray([True, True]),
    )
    out = np.asarray(rescore_3d_from_camera(cam, sfa2d, scores3d, 0.7))
    assert out[0] == pytest.approx(0.90)   # confirmed -> max(0.30, 0.90)
    assert out[1] == pytest.approx(0.60)   # unconfirmed -> unchanged
    assert out[2] == pytest.approx(0.25)   # invalid slot -> unchanged

    # a second camera box on the SAME target must not double-claim: the
    # greedy match consumes sfa det 0, so an identical second box matches
    # nothing and changes nothing
    cam2 = DetectionSet(
        boxes=jnp.asarray([[102.0, 102, 50, 40], [102.0, 102, 50, 40]]),
        scores=jnp.asarray([0.70, 0.99]),
        classes=jnp.asarray([1, 1], jnp.int32),
        valid=jnp.asarray([True, True]),
    )
    out2 = np.asarray(rescore_3d_from_camera(cam2, sfa2d, scores3d, 0.7))
    assert out2[0] == pytest.approx(0.70)  # first (input-order) box wins

    # mode="demote" (the monotone repair): confirmed detections KEEP the
    # detector's score, unconfirmed in-frustum ones are scaled by `demote`,
    # out-of-frustum (valid=False) ones are unjudgeable and pass through
    out3 = np.asarray(rescore_3d_from_camera(cam, sfa2d, scores3d, 0.7,
                                             mode="demote", demote=0.5))
    assert out3[0] == pytest.approx(0.30)   # confirmed -> own score kept
    assert out3[1] == pytest.approx(0.30)   # unconfirmed in-frustum -> x0.5
    assert out3[2] == pytest.approx(0.25)   # out-of-frustum -> unchanged

    with pytest.raises(ValueError):
        rescore_3d_from_camera(cam, sfa2d, scores3d, 0.7, mode="bogus")
