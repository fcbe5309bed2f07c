"""Detection decode: heatmap peaks -> fixed-K 7-DOF boxes, fully inside jit.

Parity with reference utils/evaluation_utils.py:
- `heat_nms`      <-> `_nms` (:21-26): 3x3 max-pool peak suppression.
- `topk_detections` <-> `_topk` (:47-62): per-class top-K then global top-K.
- `decode`        <-> `decode` (:77-105): gather heads at peak indices,
  producing (B, K, 10) rows [score, x, y, z, h, w, l, sin, cos, cls].
- `post_processing` <-> `post_processing` (:112-163) — but instead of ragged
  per-class Python lists, returns fixed-(B, K) masked arrays so the whole
  frame pipeline stays compiled. The reference's single-batch `ret` indent
  bug at :158 is NOT replicated.
- `detections_to_real` <-> `convert_det_to_real_values` (:177-193).

Layout note: heatmaps are NHWC here (the reference is NCHW).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sfa3d_tpu.config import kitti as cnf


def heat_nms(heat: jax.Array, kernel: int = 3) -> jax.Array:
    """Keep only local maxima: heat * (maxpool3x3(heat) == heat).

    `heat`: (B, H, W, C). Matches `_nms` (evaluation_utils.py:21-26).
    """
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return heat * (hmax == heat).astype(heat.dtype)


def topk_detections(scores: jax.Array, K: int = 50):
    """Per-class top-K then global top-K over C*K (evaluation_utils.py:47-62).

    `scores`: (B, H, W, C). Returns (score, inds, clses, ys, xs), each (B, K);
    `inds` are flat y*W+x positions into the H*W plane.
    """
    b, h, w, c = scores.shape
    # (B, C, H*W): per-class flattened planes.
    per_class = jnp.transpose(scores, (0, 3, 1, 2)).reshape(b, c, h * w)
    topk_scores, topk_inds = jax.lax.top_k(per_class, K)  # (B, C, K)
    topk_inds = topk_inds % (h * w)
    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)

    topk_score, topk_ind = jax.lax.top_k(topk_scores.reshape(b, c * K), K)  # (B, K)
    topk_clses = (topk_ind // K).astype(jnp.int32)
    gather = lambda t: jnp.take_along_axis(t.reshape(b, c * K), topk_ind, axis=1)
    return (
        topk_score,
        gather(topk_inds).astype(jnp.int32),
        topk_clses,
        gather(topk_ys),
        gather(topk_xs),
    )


def _gather_feat(feat: jax.Array, inds: jax.Array) -> jax.Array:
    """Gather (B, H*W, D) rows at (B, K) flat indices -> (B, K, D)
    (`_transpose_and_gather_feat`, evaluation_utils.py:40-44, minus the
    transpose since we are already NHWC)."""
    b, _, d = feat.shape
    return jnp.take_along_axis(feat, inds[:, :, None].astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("K",))
def decode(
    hm_cen: jax.Array,
    cen_offset: jax.Array,
    direction: jax.Array,
    z_coor: jax.Array,
    dim: jax.Array,
    K: int = 50,
) -> jax.Array:
    """Heads (NHWC, post-sigmoid hm/offset) -> detections (B, K, 10):
    [score, x, y, z, h, w, l, sin(im), cos(re), cls] in heatmap pixels
    (evaluation_utils.py:77-105)."""
    b, h, w, _ = hm_cen.shape
    heat = heat_nms(hm_cen)
    scores, inds, clses, ys, xs = topk_detections(heat, K=K)

    flat = lambda t: t.reshape(b, h * w, t.shape[-1])
    off = _gather_feat(flat(cen_offset), inds)  # (B, K, 2)
    xs = xs[..., None] + off[:, :, 0:1]
    ys = ys[..., None] + off[:, :, 1:2]
    drt = _gather_feat(flat(direction), inds)  # (B, K, 2)
    z = _gather_feat(flat(z_coor), inds)  # (B, K, 1)
    dims = _gather_feat(flat(dim), inds)  # (B, K, 3)

    return jnp.concatenate(
        [
            scores[..., None],
            xs,
            ys,
            z,
            dims,
            drt,
            clses[..., None].astype(jnp.float32),
        ],
        axis=2,
    )


@functools.partial(jax.jit, static_argnames=("down_ratio",))
def post_processing(
    detections: jax.Array,
    peak_thresh: float = 0.2,
    down_ratio: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """(B, K, 10) decode output -> (B, K, 9) BEV-pixel boxes + validity mask.

    Rows: [cls, score, x_bev, y_bev, z, h, w_bev, l_bev, yaw] where x/y are
    input-resolution BEV pixels (heatmap coords * down_ratio), w/l converted
    from meters to BEV pixels, yaw = arctan2(sin, cos)
    (evaluation_utils.py:112-163 without the ragged per-class dict).
    """
    score = detections[..., 0]
    x = detections[..., 1] * down_ratio
    y = detections[..., 2] * down_ratio
    z = detections[..., 3]
    h = detections[..., 4]
    w = detections[..., 5] / cnf.bound_size_y * cnf.BEV_WIDTH
    l = detections[..., 6] / cnf.bound_size_x * cnf.BEV_HEIGHT
    yaw = jnp.arctan2(detections[..., 7], detections[..., 8])
    cls = detections[..., 9]
    boxes = jnp.stack([cls, score, x, y, z, h, w, l, yaw], axis=-1)
    mask = score > peak_thresh
    return boxes, mask


@jax.jit
def detections_to_real(boxes: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, K, 9) BEV-pixel boxes -> (B, K, 8) metric velodyne-frame rows
    [cls, x, y, z, h, w, l, yaw] (convert_det_to_real_values,
    evaluation_utils.py:177-193: BEV px -> meters, yaw negated)."""
    cls = boxes[..., 0]
    score = boxes[..., 1]
    x_bev, y_bev = boxes[..., 2], boxes[..., 3]
    z = boxes[..., 4] + cnf.boundary["minZ"]
    h = boxes[..., 5]
    w = boxes[..., 6] / cnf.BEV_WIDTH * cnf.bound_size_y
    l = boxes[..., 7] / cnf.BEV_HEIGHT * cnf.bound_size_x
    yaw = -boxes[..., 8]
    x = y_bev / cnf.BEV_HEIGHT * cnf.bound_size_x + cnf.boundary["minX"]
    y = x_bev / cnf.BEV_WIDTH * cnf.bound_size_y + cnf.boundary["minY"]
    real = jnp.stack([cls, x, y, z, h, w, l, yaw], axis=-1)
    return real, mask & (score > 0)


def masked_detections_to_numpy(boxes, mask):
    """Host-side: strip padding to the reference's ragged per-class layout
    {cls: (n, 8) [score, x, y, z, h, w, l, yaw]} for drawing code parity."""
    import numpy as np

    boxes = np.asarray(boxes)
    mask = np.asarray(mask)
    out = {}
    for c in range(cnf.NUM_CLASSES):
        sel = mask & (boxes[..., 0].astype(int) == c)
        out[c] = boxes[sel][:, 1:]
    return out
