"""NMS family over fixed-K masked detection sets.

- `hard_nms`: greedy confidence-ordered suppression, parity with reference
  apply_nms_to_fused_detections (test4.py:103-125): a detection is dropped
  when its IoU with any already-KEPT higher-confidence detection exceeds the
  threshold (strictly '>').
- `soft_nms_gaussian`: Gaussian score-decay soft-NMS
  (score *= exp(-iou^2 / sigma)), the "Gaussian NMS" enhancement advertised
  in the reference README.md:29-33 (no code ships in the reference; this is
  the standard Bodla et al. 2017 formulation).

Both are bounded lax.fori_loop programs over the K slots — the reference's
O(N^2) Python loops with identical tie-breaking (stable confidence sort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfa3d_tpu.fusion.iou import pairwise_iou_xywh


def _stable_desc_order(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Indices sorting valid detections by confidence desc, stable (Python
    list.sort parity); invalid slots go last."""
    key = jnp.where(valid, -scores, jnp.inf)
    return jnp.argsort(key, stable=True)


def hard_nms(boxes: jax.Array, scores: jax.Array, valid: jax.Array, nms_threshold: float = 0.5):
    """(K,4) xywh + (K,) scores/valid -> keep mask (K,) in INPUT order."""
    order = _stable_desc_order(scores, valid)
    b = boxes[order]
    v = valid[order]
    iou = pairwise_iou_xywh(b, b)
    k = boxes.shape[0]

    def body(i, keep):
        # suppressed if any kept j<i has IoU > threshold
        earlier = (jnp.arange(k) < i) & keep
        hit = jnp.any(earlier & (iou[i] > nms_threshold))
        return keep.at[i].set(v[i] & ~hit)

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.zeros(k, bool))
    # scatter back to input order
    keep = jnp.zeros(k, bool).at[order].set(keep_sorted)
    return keep


@jax.jit
def soft_nms_gaussian(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    sigma: float = 0.5,
    score_thresh: float = 0.001,
):
    """Gaussian soft-NMS: returns decayed scores (K,) in input order and the
    surviving mask (decayed score > score_thresh).

    Classic formulation: repeatedly select the highest remaining (decayed)
    score, freeze it, and decay every unprocessed score by
    exp(-iou(selected, .)^2 / sigma). Runs in the original slot order —
    no reordering, so box<->score alignment is preserved by construction.
    """
    iou = pairwise_iou_xywh(boxes, boxes)
    k = boxes.shape[0]
    s0 = jnp.where(valid, scores, -jnp.inf)

    def body(_, carry):
        s_cur, processed = carry
        cand = jnp.where(processed, -jnp.inf, s_cur)
        m = jnp.argmax(cand)
        any_left = jnp.isfinite(cand[m])
        decay = jnp.exp(-(iou[m] ** 2) / sigma)
        unprocessed = ~processed & (jnp.arange(k) != m)
        s_new = jnp.where(unprocessed & any_left, s_cur * decay, s_cur)
        processed = processed.at[m].set(processed[m] | any_left)
        return s_new, processed

    s_final, _ = jax.lax.fori_loop(0, k, body, (s0, ~valid))
    out = jnp.where(valid, s_final, 0.0)
    surv = valid & (out > score_thresh)
    return out, surv
