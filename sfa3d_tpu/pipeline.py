"""End-to-end jit-compiled frame pipelines.

The reference splits the frame path across host numpy (BEV), torch (model,
decode) and Python loops (post-processing). Here the WHOLE path —
raw padded points -> BEV raster -> KFPN -> sigmoid -> peak decode ->
metric 7-DOF boxes — is one XLA program per batch (SURVEY.md section 7.2).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sfa3d_tpu.models import clamped_sigmoid
from sfa3d_tpu.ops.bev import points_to_bev
from sfa3d_tpu.ops.decode import decode, detections_to_real, post_processing


def forward_heads(model, variables, bev: jax.Array, train: bool = False):
    """Apply the detector to a (B, H, W, 3) BEV batch -> raw head dict."""
    return model.apply(variables, bev, train=train)


@functools.partial(
    jax.jit, static_argnames=("model", "K", "peak_thresh", "return_heads")
)
def detect_frames(
    model,
    variables,
    points: jax.Array,
    valid: jax.Array,
    *,
    K: int = 50,
    peak_thresh: float = 0.2,
    return_heads: bool = False,
) -> Dict[str, jax.Array]:
    """Raw padded scans -> detections, fully on device.

    Args:
      points: (B, N, 4) float32 velodyne scans (unfiltered, unshifted z).
      valid:  (B, N) bool padding mask.
      return_heads: also return the raw head dict (e.g. for the staged
        heatmap dumps) so visualization never pays a second forward.

    Returns dict with:
      bev:        (B, 608, 608, 3) raster (for visualization reuse)
      detections: (B, K, 10) raw decode rows
      boxes_bev:  (B, K, 9)  [cls, score, x, y, z, h, w, l, yaw] BEV pixels
      boxes_real: (B, K, 8)  [cls, x, y, z, h, w, l, yaw] metric velodyne
      mask:       (B, K) bool validity (score > peak_thresh)
      heads:      raw head dict (only when return_heads)
    """
    bev = jax.vmap(lambda p, v: points_to_bev(p, v))(points, valid)
    outputs = model.apply(variables, bev, train=False)
    dets = decode(
        clamped_sigmoid(outputs["hm_cen"]),
        clamped_sigmoid(outputs["cen_offset"]),
        outputs["direction"].astype(jnp.float32),
        outputs["z_coor"].astype(jnp.float32),
        outputs["dim"].astype(jnp.float32),
        K=K,
    )
    boxes_bev, mask = post_processing(dets, peak_thresh=peak_thresh)
    boxes_real, mask = detections_to_real(boxes_bev, mask)
    out = {
        "bev": bev,
        "detections": dets,
        "boxes_bev": boxes_bev,
        "boxes_real": boxes_real,
        "mask": mask,
    }
    if return_heads:
        out["heads"] = outputs
    return out


@functools.partial(jax.jit, static_argnames=("model", "K", "peak_thresh"))
def detect_bev(
    model,
    variables,
    bev: jax.Array,
    *,
    K: int = 50,
    peak_thresh: float = 0.2,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(B, H, W, 3) BEV batch -> (detections, boxes_bev, boxes_real, mask).
    The `do_detect` analog (utils/demo_utils.py:109-127) without host hops;
    boxes_bev are the drawing-ready BEV-pixel boxes so callers never need a
    second post-processing pass."""
    outputs = model.apply(variables, bev, train=False)
    dets = decode(
        clamped_sigmoid(outputs["hm_cen"]),
        clamped_sigmoid(outputs["cen_offset"]),
        outputs["direction"].astype(jnp.float32),
        outputs["z_coor"].astype(jnp.float32),
        outputs["dim"].astype(jnp.float32),
        K=K,
    )
    boxes_bev, mask = post_processing(dets, peak_thresh=peak_thresh)
    boxes_real, mask = detections_to_real(boxes_bev, mask)
    return dets, boxes_bev, boxes_real, mask


def init_detector(model, rng: jax.Array, input_size=(608, 608)) -> Any:
    """Initialize model variables for a (1, H, W, 3) BEV input."""
    dummy = jnp.zeros((1, input_size[0], input_size[1], 3), jnp.float32)
    return model.init(rng, dummy, train=False)
