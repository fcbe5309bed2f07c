"""YOLOv8 (JAX) structure and decode tests.

Numeric parity against ultralytics weights is gated on a yolov8n.pt file
being present (none ships in this environment); the architecture is instead
validated by shape/anchor-math/NMS invariants and a parameter-count check
against the published yolov8n size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfa3d_tpu.models.yolov8 import (
    REG_MAX,
    STRIDES,
    YOLOv8,
    YOLOv8Detector,
    decode_predictions,
    dfl_expectation,
    select_detections,
)


@pytest.fixture(scope="module")
def yolo_n():
    model = YOLOv8(scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)), train=False
    )
    return model, variables


def test_level_shapes(yolo_n):
    model, variables = yolo_n
    outs = model.apply(variables, jnp.zeros((2, 160, 160, 3)), train=False)
    assert len(outs) == 3
    for (box, cls), stride in zip(outs, STRIDES):
        assert box.shape == (2, 160 // stride, 160 // stride, 4 * REG_MAX)
        assert cls.shape == (2, 160 // stride, 160 // stride, 80)


def test_param_count_matches_published_yolov8n(yolo_n):
    from sfa3d_tpu.models import get_num_parameters

    _, variables = yolo_n
    n = get_num_parameters(variables["params"])
    # yolov8n: 3.157M params (3,157,200 incl. the fixed DFL conv we realize
    # analytically: 16 of those). Allow the published tolerance band.
    assert abs(n - 3_157_184) < 20_000, n


def test_dfl_expectation_math(rng):
    logits = rng.normal(0, 2, (5, 4 * REG_MAX)).astype(np.float32)
    out = np.asarray(dfl_expectation(jnp.asarray(logits)))
    assert out.shape == (5, 4)
    assert (out >= 0).all() and (out <= REG_MAX - 1).all()
    # a one-hot logit spike selects its bin exactly
    spike = np.full((1, 4 * REG_MAX), -1e9, np.float32)
    for side, b in enumerate([3, 7, 0, 15]):
        spike[0, side * REG_MAX + b] = 0.0
    np.testing.assert_allclose(
        np.asarray(dfl_expectation(jnp.asarray(spike)))[0], [3, 7, 0, 15], atol=1e-5
    )


def test_decode_anchor_geometry():
    """Zero DFL logits -> expectation 7.5 bins; check box centers land on
    anchor points scaled by stride."""
    levels = []
    for stride in STRIDES:
        hw = 64 // stride
        box = jnp.zeros((1, hw, hw, 4 * REG_MAX))
        cls = jnp.zeros((1, hw, hw, 80))
        levels.append((box, cls))
    boxes, scores = decode_predictions(levels)
    b = np.asarray(boxes)[0]
    a0 = 64 // STRIDES[0]
    # first anchor of level 0: center (0.5, 0.5), ltrb = 7.5 each
    np.testing.assert_allclose(
        b[0], [(0.5 - 7.5) * 8, (0.5 - 7.5) * 8, (0.5 + 7.5) * 8, (0.5 + 7.5) * 8]
    )
    assert scores.shape == (1, sum((64 // s) ** 2 for s in STRIDES), 80)
    np.testing.assert_allclose(np.asarray(scores), 0.5)


def test_select_detections_nms(rng):
    a = 300
    boxes = np.zeros((a, 4), np.float32)
    scores = np.zeros((a, 80), np.float32)
    # two overlapping car dets + one person det elsewhere
    boxes[0] = [100, 100, 200, 200]
    boxes[1] = [105, 105, 205, 205]
    boxes[2] = [400, 400, 450, 450]
    scores[0, 2] = 0.9
    scores[1, 2] = 0.8
    scores[2, 0] = 0.7
    b, s, c, v = select_detections(jnp.asarray(boxes), jnp.asarray(scores))
    v = np.asarray(v)
    assert v.sum() == 2
    kept = np.asarray(b)[v]
    assert [100, 100, 200, 200] in kept.tolist()
    assert [400, 400, 450, 450] in kept.tolist()
    assert set(np.asarray(c)[v].tolist()) == {0, 2}


def test_detector_end_to_end_random_weights(rng):
    det = YOLOv8Detector(scale="n", imgsz=160)
    img = (rng.uniform(0, 255, (120, 200, 3))).astype(np.uint8)
    boxes, confs, classes = det(img, conf=0.0)
    assert isinstance(boxes, list)
    for (x, y, w, h), cf, cl in zip(boxes, confs, classes):
        assert 0 <= x <= 200 and 0 <= y <= 120
        assert w >= 0 and h >= 0
        assert 0 <= cl < 80
