"""YOLOv8 training-loss tests: anchor/decode consistency, CIoU properties,
a hand-built task-aligned-assigner oracle, DFL two-hot behavior, and a
tiny-image overfit (the gradient sanity check).

The reference consumes a *trained* yolov8n.pt (/root/reference/test3.py:470)
and ships no training code; losses/yolo_loss.py supplies the training math
these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfa3d_tpu.losses.yolo_loss import (
    _dfl_loss,
    iou_xyxy,
    make_anchors,
    task_aligned_assign,
    yolo_loss,
)
from sfa3d_tpu.models.yolov8 import (
    REG_MAX,
    STRIDES,
    YOLOv8,
    decode_predictions,
    dfl_expectation,
)


def test_anchors_match_decode_flattening():
    """make_anchors' (grid-units) anchor order must match
    decode_predictions' per-level row-major flattening: decoding the same
    head outputs through both paths gives identical pixel boxes."""
    imgsz = 64
    rng = np.random.default_rng(0)
    level_outputs = []
    for s in STRIDES:
        n = imgsz // s
        level_outputs.append((
            jnp.asarray(rng.normal(size=(1, n, n, 4 * REG_MAX)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, n, n, 3)), jnp.float32),
        ))
    boxes_ref, _ = decode_predictions(level_outputs)

    anc, strides = make_anchors(imgsz)
    box_logits = jnp.concatenate(
        [b.reshape(1, -1, 4 * REG_MAX) for b, _ in level_outputs], axis=1
    )
    ltrb = dfl_expectation(box_logits)
    boxes_anchor = jnp.concatenate(
        [anc[None] - ltrb[..., :2], anc[None] + ltrb[..., 2:]], axis=-1
    ) * strides[None, :, None]
    np.testing.assert_allclose(
        np.asarray(boxes_anchor), np.asarray(boxes_ref), rtol=0, atol=1e-4
    )


def test_ciou_properties():
    a = jnp.array([10.0, 10.0, 30.0, 50.0])
    # identical boxes: IoU = CIoU = 1
    assert float(iou_xyxy(a, a, kind="iou")) == pytest.approx(1.0, abs=1e-5)
    assert float(iou_xyxy(a, a, kind="ciou")) == pytest.approx(1.0, abs=1e-5)
    # disjoint boxes: IoU = 0 but CIoU < 0 (distance penalty keeps gradient)
    b = jnp.array([100.0, 100.0, 120.0, 140.0])
    assert float(iou_xyxy(a, b, kind="iou")) == pytest.approx(0.0, abs=1e-6)
    assert float(iou_xyxy(a, b, kind="ciou")) < -0.1
    # hand value: half-overlap shift
    c = jnp.array([10.0, 30.0, 30.0, 70.0])  # shifted by half the height
    inter = 20.0 * 20.0
    union = 800.0 + 800.0 - inter
    assert float(iou_xyxy(a, c, kind="iou")) == pytest.approx(
        inter / union, abs=1e-4)
    # CIoU <= IoU always (penalties subtract)
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.sort(rng.uniform(0, 100, (64, 2, 2)), axis=-1)
                    .transpose(0, 2, 1).reshape(64, 4), jnp.float32)
    y = jnp.asarray(np.sort(rng.uniform(0, 100, (64, 2, 2)), axis=-1)
                    .transpose(0, 2, 1).reshape(64, 4), jnp.float32)
    # build proper xyxy: (x1, y1, x2, y2) with x1<x2, y1<y2
    x = jnp.concatenate([jnp.minimum(x[:, :2], x[:, 2:]),
                         jnp.maximum(x[:, :2], x[:, 2:]) + 1.0], axis=-1)
    y = jnp.concatenate([jnp.minimum(y[:, :2], y[:, 2:]),
                         jnp.maximum(y[:, :2], y[:, 2:]) + 1.0], axis=-1)
    assert np.all(np.asarray(iou_xyxy(x, y, kind="ciou"))
                  <= np.asarray(iou_xyxy(x, y, kind="iou")) + 1e-5)


def _toy_assign(pd_scores, pd_boxes, anchors, gt_labels, gt_boxes, gt_mask,
                **kw):
    return jax.tree.map(
        np.asarray,
        task_aligned_assign(
            jnp.asarray(pd_scores, jnp.float32),
            jnp.asarray(pd_boxes, jnp.float32),
            jnp.asarray(anchors, jnp.float32),
            jnp.asarray(gt_labels, jnp.int32),
            jnp.asarray(gt_boxes, jnp.float32),
            jnp.asarray(gt_mask, bool),
            **kw,
        ),
    )


def test_assigner_oracle_single_gt():
    """One GT box, 4 anchors: only anchors strictly inside the GT become
    positives, they regress that GT, and padded GT slots assign nothing."""
    anchors = np.array([[5.0, 5.0], [15.0, 15.0], [25.0, 25.0], [50.0, 50.0]])
    gt_boxes = np.array([[[10.0, 10.0, 30.0, 30.0], [0, 0, 0, 0]]])
    gt_labels = np.array([[1, 0]])
    gt_mask = np.array([[True, False]])
    # predictions: perfect box at every anchor, confident class 1
    pd_boxes = np.tile(gt_boxes[0, 0], (1, 4, 1))
    pd_scores = np.full((1, 4, 3), 0.1)
    pd_scores[..., 1] = 0.9
    out = _toy_assign(pd_scores, pd_boxes, anchors, gt_labels, gt_boxes,
                      gt_mask, topk=4)
    np.testing.assert_array_equal(out["fg_mask"][0],
                                  [False, True, True, False])
    assert np.all(out["target_gt_idx"][0][out["fg_mask"][0]] == 0)
    np.testing.assert_allclose(
        out["target_bboxes"][0, 1], gt_boxes[0, 0], atol=1e-6)
    # soft cls target lands on class 1 only, positive where fg
    assert out["target_scores"][0, 1, 1] > 0
    assert out["target_scores"][0, 1, 0] == 0
    assert np.all(out["target_scores"][0, 0] == 0)
    assert np.all(out["target_scores"][0, 3] == 0)


def test_assigner_conflict_goes_to_max_overlap():
    """An anchor inside two GTs is claimed by the one its predicted box
    overlaps more (ultralytics' select_highest_overlaps)."""
    anchors = np.array([[20.0, 20.0]])
    gt_boxes = np.array([[[0.0, 0.0, 40.0, 40.0], [10.0, 10.0, 30.0, 30.0]]])
    gt_labels = np.array([[0, 2]])
    gt_mask = np.array([[True, True]])
    # prediction matches the SECOND (smaller) gt exactly
    pd_boxes = np.array([[[10.0, 10.0, 30.0, 30.0]]])
    pd_scores = np.full((1, 1, 3), 0.9)
    out = _toy_assign(pd_scores, pd_boxes, anchors, gt_labels, gt_boxes,
                      gt_mask, topk=1)
    assert out["fg_mask"][0, 0]
    assert out["target_gt_idx"][0, 0] == 1
    np.testing.assert_allclose(out["target_bboxes"][0, 0],
                               gt_boxes[0, 1], atol=1e-6)


def test_assigner_topk_limits_positives():
    """With many anchors inside one GT, at most topk become positives."""
    g = np.arange(2.0, 38.0, 4.0)
    ax, ay = np.meshgrid(g, g)
    anchors = np.stack([ax.ravel(), ay.ravel()], -1)  # 81 anchors in [0,40]
    gt_boxes = np.array([[[0.0, 0.0, 40.0, 40.0]]])
    pd_boxes = np.tile(gt_boxes[0, 0], (1, len(anchors), 1))
    pd_scores = np.full((1, len(anchors), 3), 0.5)
    out = _toy_assign(pd_scores, pd_boxes, anchors, np.array([[0]]), gt_boxes,
                      np.array([[True]]), topk=10)
    assert out["fg_mask"].sum() == 10


def test_dfl_two_hot():
    """Integer target with all predicted mass on the right bin -> ~0 loss;
    fractional targets interpolate the two neighbour bins; mass on a wrong
    bin costs much more."""
    logits = np.full((1, 4, REG_MAX), -10.0, np.float32)
    for side in range(4):
        logits[0, side, 7] = 10.0
    t_exact = jnp.full((1, 4), 7.0)
    loss_exact = float(_dfl_loss(jnp.asarray(logits), t_exact)[0])
    assert loss_exact < 1e-3
    # halfway target needs mass on both bins: pure-7 prediction pays ~CE/2
    t_half = jnp.full((1, 4), 7.5)
    loss_half = float(_dfl_loss(jnp.asarray(logits), t_half)[0])
    assert loss_half > loss_exact + 1.0
    # two-hot prediction at 7.5 beats the pure-7 one
    logits2 = np.full((1, 4, REG_MAX), -10.0, np.float32)
    logits2[0, :, 7] = 5.0
    logits2[0, :, 8] = 5.0
    assert float(_dfl_loss(jnp.asarray(logits2), t_half)[0]) < loss_half


def test_yolo_loss_masks_padded_gt():
    """All-padded GT (gt_mask False): no positives, box/dfl losses exactly
    zero, cls loss finite (pure negatives)."""
    imgsz = 64
    model = YOLOv8(scale="n", num_classes=3)
    x = jnp.zeros((1, imgsz, imgsz, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    losses = yolo_loss(
        outs,
        jnp.zeros((1, 8, 4)),
        jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), bool),
        imgsz=imgsz,
    )
    assert float(losses["num_fg"]) == 0
    assert float(losses["box"]) == 0
    assert float(losses["dfl"]) == 0
    assert np.isfinite(float(losses["total"]))


@pytest.mark.slow
def test_overfit_single_image():
    """200 Adam steps on one 64x64 image with one box: the loss collapses
    and the top decoded detection recovers the GT box (the end-to-end
    gradient sanity check for assigner + CIoU + DFL + BCE)."""
    import optax

    imgsz = 64
    model = YOLOv8(scale="n", num_classes=3)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, imgsz, imgsz, 3)), jnp.float32)
    gt_boxes = jnp.array([[[12.0, 20.0, 44.0, 52.0]]])
    gt_labels = jnp.array([[1]], jnp.int32)
    gt_mask = jnp.array([[True]])

    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            outs, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, train=True,
                mutable=["batch_stats"],
            )
            losses = yolo_loss(outs, gt_boxes, gt_labels, gt_mask,
                               imgsz=imgsz)
            return losses["total"], (losses, updates["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, total

    first = None
    for i in range(200):
        params, batch_stats, opt_state, total = step(
            params, batch_stats, opt_state)
        if first is None:
            first = float(total)
    last = float(total)
    assert np.isfinite(last)
    assert last < first * 0.2, (first, last)

    outs = model.apply({"params": params, "batch_stats": batch_stats}, img,
                       train=False)
    boxes, scores = decode_predictions(outs)
    best = int(jnp.argmax(scores[0].max(-1)))
    iou = float(iou_xyxy(boxes[0, best], gt_boxes[0, 0], kind="iou"))
    cls = int(jnp.argmax(scores[0, best]))
    assert iou > 0.5, iou
    assert cls == 1
