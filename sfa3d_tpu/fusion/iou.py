"""Pairwise IoU for [x, y, w, h] boxes.

Parity with reference calculate_iou (test4.py:75-100 / test6.py:76-101),
vectorized to an (N, M) matrix: the reference's "if x_right < x_left return
0" maps to clamping the intersection extent at 0 (note `<`, not `<=`:
degenerate touching boxes produce area 0 either way).
"""

from __future__ import annotations

import jax.numpy as jnp


def iou_xywh(box1, box2):
    """Scalar IoU of two [x, y, w, h] boxes (arrays broadcastable)."""
    b1 = jnp.asarray(box1, jnp.float32)
    b2 = jnp.asarray(box2, jnp.float32)
    return pairwise_iou_xywh(b1[None, :], b2[None, :])[0, 0]


def pairwise_iou_xywh(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) [x, y, w, h] -> (N, M) IoU matrix."""
    x1, y1, w1, h1 = [boxes1[:, i] for i in range(4)]
    x2, y2, w2, h2 = [boxes2[:, i] for i in range(4)]

    left = jnp.maximum(x1[:, None], x2[None, :])
    top = jnp.maximum(y1[:, None], y2[None, :])
    right = jnp.minimum((x1 + w1)[:, None], (x2 + w2)[None, :])
    bottom = jnp.minimum((y1 + h1)[:, None], (y2 + h2)[None, :])

    inter = jnp.maximum(right - left, 0.0) * jnp.maximum(bottom - top, 0.0)
    union = (w1 * h1)[:, None] + (w2 * h2)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
