"""YOLOv8 training loss: task-aligned assignment + CIoU + DFL + BCE.

The reference consumes YOLOv8 as a black box — a *trained* `yolov8n.pt`
(/root/reference/test3.py:470-472) — and ships no way to produce one. This
module supplies the missing training math so the framework's camera branch
can be trained end to end on TPU: the TOOD-style task-aligned assigner
(align metric s^alpha * IoU^beta, top-k candidates per GT, max-overlap
conflict resolution), complete-IoU box loss, distribution-focal-loss over
the 16 DFL bins, and BCE classification against the normalized align
metric — the v8 detection loss (box 7.5 / cls 0.5 / dfl 1.5).

TPU-native shape discipline: ground truth is padded to a fixed number of
slots with a validity mask, every assigner tensor is dense (B, G, A), and
the whole loss is one fused jit program — no ragged batching, no
data-dependent control flow.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from sfa3d_tpu.models.yolov8 import REG_MAX, STRIDES

# v8 detection loss gains
BOX_GAIN = 7.5
CLS_GAIN = 0.5
DFL_GAIN = 1.5


def make_anchors(
    imgsz, strides: Sequence[int] = STRIDES
) -> Tuple[jax.Array, jax.Array]:
    """-> (anchor centers (A, 2) in per-level GRID units [x, y],
    stride per anchor (A,)). Levels concatenate in `strides` order, matching
    models.yolov8.decode_predictions' level flattening (row-major H*W).
    `imgsz` is an int (square) or (h, w) — KITTI camera frames train on
    rectangular (192, 640) canvases (data/yolo2d.py)."""
    h, w = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    points, strs = [], []
    for s in strides:
        nh, nw = h // s, w // s
        ys = jnp.arange(nh, dtype=jnp.float32) + 0.5
        xs = jnp.arange(nw, dtype=jnp.float32) + 0.5
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        points.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strs.append(jnp.full((nh * nw,), float(s), jnp.float32))
    return jnp.concatenate(points, axis=0), jnp.concatenate(strs, axis=0)


def iou_xyxy(box1: jax.Array, box2: jax.Array, kind: str = "ciou",
             eps: float = 1e-7) -> jax.Array:
    """Elementwise IoU between broadcastable xyxy boxes -> (...,).

    kind: "iou" plain, "ciou" complete IoU (adds center-distance and
    aspect-ratio penalties — the box-regression objective that keeps a
    gradient signal when boxes don't overlap)."""
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    inter = (
        jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
        * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if kind == "iou":
        return iou
    # enclosing box diagonal + center distance (DIoU term)
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw * cw + ch * ch + eps
    rho2 = (
        (b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2
    ) / 4.0
    # aspect-ratio consistency (CIoU term)
    v = (4.0 / jnp.pi**2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    ) ** 2
    alpha = v / (v - iou + (1.0 + eps))
    alpha = jax.lax.stop_gradient(alpha)  # ultralytics detaches the trade-off
    return iou - (rho2 / c2 + v * alpha)


def _topk_mask(metric: jax.Array, k: int) -> jax.Array:
    """(B, G, A) metric -> boolean mask of each (b, g)'s top-k anchors
    (scatter of top-k indices, so exact ties never over-select)."""
    _, idx = jax.lax.top_k(metric, k)  # (B, G, k)
    mask = jnp.zeros(metric.shape, jnp.bool_)
    b_ix = jnp.arange(metric.shape[0])[:, None, None]
    g_ix = jnp.arange(metric.shape[1])[None, :, None]
    mask = mask.at[b_ix, g_ix, idx].set(True)
    # top_k on an all-masked row still returns k indices: require metric > 0
    return mask & (metric > 0)


def task_aligned_assign(
    pd_scores: jax.Array,   # (B, A, C) sigmoid class probabilities
    pd_bboxes: jax.Array,   # (B, A, 4) xyxy, SAME units as gt_bboxes
    anc_points: jax.Array,  # (A, 2) anchor centers, same units
    gt_labels: jax.Array,   # (B, G) int class ids
    gt_bboxes: jax.Array,   # (B, G, 4) xyxy
    gt_mask: jax.Array,     # (B, G) bool — padded slots False
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> Dict[str, jax.Array]:
    """TOOD/ultralytics task-aligned assigner, dense fixed-shape.

    Returns dict:
      fg_mask        (B, A)   anchor is a positive
      target_gt_idx  (B, A)   which GT slot each positive regresses
      target_bboxes  (B, A, 4)
      target_scores  (B, A, C) soft cls targets (one-hot * normalized metric)
    """
    B, A, C = pd_scores.shape
    G = gt_labels.shape[1]

    # candidates: anchor center strictly inside the GT box
    lt = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]  # (B,G,A,2)
    rb = gt_bboxes[:, :, None, 2:] - anc_points[None, None, :, :]
    in_gts = jnp.concatenate([lt, rb], axis=-1).min(axis=-1) > eps  # (B,G,A)

    overlaps = jnp.clip(
        iou_xyxy(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]), 0.0
    )  # (B, G, A)
    cls_score = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1),            # (B, C, A)
        jnp.clip(gt_labels, 0, C - 1)[:, :, None],
        axis=1,
    )  # (B, G, A)
    align = (cls_score**alpha) * (overlaps**beta)

    gate = in_gts & gt_mask[:, :, None]
    mask_pos = _topk_mask(jnp.where(gate, align, 0.0), topk) & gate

    # an anchor claimed by several GTs keeps the max-overlap one
    n_claims = mask_pos.sum(axis=1)  # (B, A)
    best_gt = jnp.argmax(jnp.where(mask_pos, overlaps, -1.0), axis=1)  # (B, A)
    single_gt = jnp.argmax(mask_pos, axis=1)
    target_gt_idx = jnp.where(n_claims > 1, best_gt, single_gt)
    fg_mask = n_claims > 0

    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[:, :, None], axis=1
    )  # (B, A, 4)
    target_labels = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)
    one_hot = jax.nn.one_hot(target_labels, C, dtype=pd_scores.dtype)
    one_hot = one_hot * fg_mask[:, :, None]

    # normalize: each GT's positives rescaled so its best align-metric anchor
    # carries that GT's best overlap (ultralytics' norm_align_metric)
    align_pos = jnp.where(mask_pos, align, 0.0)
    pos_align = align_pos.max(axis=-1, keepdims=True)            # (B, G, 1)
    pos_overlap = jnp.where(mask_pos, overlaps, 0.0).max(axis=-1, keepdims=True)
    norm = (align_pos * pos_overlap / (pos_align + eps)).max(axis=1)  # (B, A)
    target_scores = one_hot * norm[:, :, None]

    return {
        "fg_mask": fg_mask,
        "target_gt_idx": target_gt_idx,
        "target_bboxes": target_bboxes,
        "target_scores": target_scores,
    }


def _dfl_loss(pred_dist: jax.Array, target: jax.Array) -> jax.Array:
    """Distribution focal loss. pred_dist (..., 4, REG_MAX) logits,
    target (..., 4) continuous distances in [0, REG_MAX-1]. -> (...,) mean
    over the 4 sides of the two-hot cross-entropy."""
    tl = jnp.floor(target).astype(jnp.int32)
    tl = jnp.clip(tl, 0, REG_MAX - 2)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, tr[..., None], axis=-1)[..., 0]
    return (ce_l * wl + ce_r * wr).mean(axis=-1)


def yolo_loss(
    level_outputs,            # list of (box_logits, cls_logits) per level
    gt_bboxes: jax.Array,     # (B, G, 4) xyxy in INPUT pixels
    gt_labels: jax.Array,     # (B, G) int
    gt_mask: jax.Array,       # (B, G) bool
    imgsz=640,                # int or (h, w)
    topk: int = 10,
) -> Dict[str, jax.Array]:
    """v8 detection loss over the head's raw per-level outputs.

    Internally works like ultralytics: boxes decode in per-level GRID units
    (DFL distances are bin counts), assignment runs in pixels, box + DFL
    losses in grid units. Returns {"total", "box", "cls", "dfl",
    "num_fg"} scalars (all f32; "total" is gain-weighted)."""
    from sfa3d_tpu.models.yolov8 import dfl_expectation

    B = level_outputs[0][0].shape[0]
    C = level_outputs[0][1].shape[-1]
    anc_points, anc_strides = make_anchors(imgsz)  # grid units / (A,)

    box_logits = jnp.concatenate(
        [b.reshape(B, -1, 4 * REG_MAX) for b, _ in level_outputs], axis=1
    ).astype(jnp.float32)  # (B, A, 64)
    cls_logits = jnp.concatenate(
        [c.reshape(B, -1, C) for _, c in level_outputs], axis=1
    ).astype(jnp.float32)  # (B, A, C)

    ltrb = dfl_expectation(box_logits)  # (B, A, 4) grid units
    pd_grid = jnp.concatenate(
        [anc_points[None] - ltrb[..., :2], anc_points[None] + ltrb[..., 2:]],
        axis=-1,
    )  # (B, A, 4) xyxy grid units

    # The assignment is a TARGET, not a function being optimized: without
    # stop_gradient the optimizer minimizes (1-iou)*weight by driving the
    # assigner's weight to zero (collapsing cls scores and overlaps) instead
    # of improving boxes — measured as exactly that collapse on a 1-image
    # overfit. Ultralytics runs its assigner under torch.no_grad() for the
    # same reason.
    assign = jax.tree.map(
        jax.lax.stop_gradient,
        task_aligned_assign(
            jax.nn.sigmoid(cls_logits),
            pd_grid * anc_strides[None, :, None],
            anc_points * anc_strides[:, None],
            gt_labels,
            gt_bboxes,
            gt_mask,
            topk=topk,
        ),
    )
    fg = assign["fg_mask"]
    target_scores = assign["target_scores"]
    tss = jnp.maximum(target_scores.sum(), 1.0)

    # cls: BCE against the soft targets, every anchor
    cls_bce = optax_sigmoid_bce(cls_logits, target_scores)
    loss_cls = cls_bce.sum() / tss

    # box + dfl on positives, in grid units
    tgt_grid = assign["target_bboxes"] / anc_strides[None, :, None]
    weight = target_scores.sum(-1)  # (B, A)
    iou = iou_xyxy(pd_grid, tgt_grid, kind="ciou")
    loss_box = (jnp.where(fg, (1.0 - iou) * weight, 0.0)).sum() / tss

    # DFL target distances clamped inside the bin range
    tgt_ltrb = jnp.concatenate(
        [anc_points[None] - tgt_grid[..., :2], tgt_grid[..., 2:] - anc_points[None]],
        axis=-1,
    )
    tgt_ltrb = jnp.clip(tgt_ltrb, 0.0, REG_MAX - 1 - 0.01)
    dfl = _dfl_loss(
        box_logits.reshape(B, -1, 4, REG_MAX), tgt_ltrb
    )  # (B, A)
    loss_dfl = (jnp.where(fg, dfl * weight, 0.0)).sum() / tss

    total = BOX_GAIN * loss_box + CLS_GAIN * loss_cls + DFL_GAIN * loss_dfl
    return {
        "total": total,
        "box": loss_box,
        "cls": loss_cls,
        "dfl": loss_dfl,
        "num_fg": fg.sum().astype(jnp.float32),
    }


def optax_sigmoid_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable elementwise BCE-with-logits (the log1p(exp) form
    torch's BCEWithLogitsLoss uses)."""
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
