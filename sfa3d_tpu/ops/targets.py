"""CenterNet-style training target generation, vectorized for TPU.

Replaces the reference's per-object Python loop `KittiDataset.build_targets`
(data_process/kitti_dataset.py:157-244) and the Gaussian splat helpers
`compute_radius` / `gaussian2D` / `gen_hm_radius`
(data_process/kitti_data_utils.py:176-225) with fixed-slot array math that
runs under jit/vmap on device: every object paints a full-resolution Gaussian
masked to its radius window, and the heatmap is the max over object slots.

Known reference bugs NOT replicated (SURVEY.md section 7.3): none here, but
one deliberate divergence: for ignore-class objects the reference's 0.9999
center overwrite is order-dependent w.r.t. later positive objects; ours is
order-independent (positive Gaussians can still exceed 0.9999 via max).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfa3d_tpu.config import kitti as cnf


def compute_radius(det_size, min_overlap: float = 0.7):
    """CenterNet 3-case minimum-overlap Gaussian radius
    (kitti_data_utils.py:176-197, including its non-standard /2 denominators).
    Works on scalars or arrays (height, width)."""
    height, width = det_size

    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(b1 ** 2 - 4 * c1)
    r1 = (b1 + sq1) / 2

    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(b2 ** 2 - 4 * 4 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2

    return jnp.minimum(jnp.minimum(r1, r2), r3)


def _gaussian_splat(center_int, radius, hm_h: int, hm_w: int):
    """One object's Gaussian over the full (hm_h, hm_w) grid, zero outside
    the [-r, r] square window (gen_hm_radius semantics: grid centered at the
    truncated integer center, sigma = (2r+1)/6)."""
    cy, cx = center_int[1], center_int[0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (hm_h, hm_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (hm_h, hm_w), 1)
    dy = ys - cy
    dx = xs - cx
    diameter = 2 * radius + 1
    sigma = diameter.astype(jnp.float32) / 6.0
    g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2) / (2.0 * sigma * sigma))
    window = (jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius)
    return jnp.where(window, g, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "hm_size", "max_objects", "bound"),
)
def build_targets(
    labels: jax.Array,
    n_valid: jax.Array,
    hflipped: jax.Array,
    *,
    num_classes: int = 3,
    hm_size: Tuple[int, int] = (152, 152),
    max_objects: int = 50,
    bound: Tuple[float, float, float, float, float, float] = (
        cnf.boundary["minX"], cnf.boundary["maxX"],
        cnf.boundary["minY"], cnf.boundary["maxY"],
        cnf.boundary["minZ"], cnf.boundary["maxZ"],
    ),
) -> Dict[str, jax.Array]:
    """Build training targets for one sample.

    Args:
      labels: (max_objects, 8) float32 rows (cls_id, x, y, z, h, w, l, yaw)
        in the VELODYNE frame (yaw = rz, pre-negation — exactly what the
        reference passes into build_targets after camera_to_lidar_box).
        Padded rows are ignored via `n_valid`.
      n_valid: scalar int32 — number of real label rows.
      hflipped: scalar bool — BEV raster was flipped along W.

    Returns dict (layouts chosen for NHWC model outputs):
      hm_cen: (H, W, num_classes) float32 Gaussian heatmap.
      cen_offset: (max_objects, 2), direction: (max_objects, 2) [sin, cos],
      z_coor: (max_objects, 1), dim: (max_objects, 3),
      indices_center: (max_objects,) int32 flat y*W+x, obj_mask: (max_objects,)
    """
    hm_h, hm_w = hm_size
    min_x, max_x, min_y, max_y, min_z, max_z = bound
    bsx, bsy = max_x - min_x, max_y - min_y

    slot_ids = jnp.arange(max_objects)
    in_slot = slot_ids < n_valid

    cls_id = labels[:, 0].astype(jnp.int32)
    x, y, z = labels[:, 1], labels[:, 2], labels[:, 3]
    h, w, l = labels[:, 4], labels[:, 5], labels[:, 6]
    yaw = -labels[:, 7]  # reference negates yaw (kitti_dataset.py:181)

    in_bounds = (
        (x >= min_x) & (x <= max_x)
        & (y >= min_y) & (y <= max_y)
        & (z >= min_z) & (z <= max_z)
    )
    pos_dims = (h > 0) & (w > 0) & (l > 0)
    active = in_slot & in_bounds & pos_dims  # object contributes at all
    is_ignore = active & (cls_id < 0)
    is_pos = active & (cls_id >= 0)

    # Radius from the BEV-projected box footprint (kitti_dataset.py:187-190).
    bbox_l = l / bsx * hm_h
    bbox_w = w / bsy * hm_w
    radius_f = compute_radius((jnp.ceil(bbox_l), jnp.ceil(bbox_w)))
    radius = jnp.maximum(0, radius_f.astype(jnp.int32))

    center_x = (y - min_y) / bsy * hm_w
    center_y = (x - min_x) / bsx * hm_h
    # hflip mirrors the raster by ARRAY REVERSAL (bev[:, ::-1]), which maps
    # continuous coordinates c -> W - c (pixel i spans [i, i+1); reversal
    # sends intra-pixel fraction f to 1-f). The reference flips targets as
    # `hm_w - center_x - 1` (kitti_dataset.py:196-197) — one FULL cell off,
    # so half its training batches teach a contradictory sub-cell offset
    # and the trained net splits the difference: a systematic -0.5-cell
    # (-0.16 m) y bias on every detection, measured on held-out scenes
    # (median dy/cell = -0.53, dx unbiased). Deliberate divergence: we use
    # the exact mirror (docs/TECHNICAL.md "Known divergences").
    center_x_preflip = center_x
    center_x = jnp.where(hflipped, hm_w - center_x, center_x)
    center = jnp.stack([center_x, center_y], axis=-1)  # (M, 2)
    center_int = center.astype(jnp.int32)  # truncation == reference astype

    # A label EXACTLY on the max boundary (in_bounds is inclusive) lands on
    # the guard cell center == hm size, which the raster also drops;
    # without this gate indices_center would address the wrong head pixel
    # (the reference IndexErrors on the same edge case). Gate on the FLOAT
    # center, and on the PRE-flip x as well: the exact mirror maps the
    # boundary guard cell hm_w to 0, which would otherwise turn a label the
    # raster drops into a positive at the leftmost column under hflip only.
    in_grid = (
        (center[:, 0] >= 0) & (center[:, 0] < hm_w)
        & (center_x_preflip < hm_w)
        & (center[:, 1] >= 0) & (center[:, 1] < hm_h)
    )
    is_pos = is_pos & in_grid
    is_ignore = is_ignore & in_grid

    # --- heatmap: per-object full-grid Gaussian, max-combined per class ---
    splat = jax.vmap(lambda ci, r: _gaussian_splat(ci, r, hm_h, hm_w))(
        center_int, radius
    )  # (M, H, W)

    # Positive objects paint their own class channel.
    cls_safe = jnp.clip(cls_id, 0, num_classes - 1)
    pos_onehot = (
        jax.nn.one_hot(cls_safe, num_classes, dtype=jnp.float32)
        * is_pos[:, None]
    )  # (M, C)
    hm_pos = jnp.max(
        splat[:, :, :, None] * pos_onehot[:, None, None, :], axis=0
    )

    # Ignore objects: cls_id == -1 paints all channels, else channel -cls-2
    # (kitti_dataset.py:200-206).
    ig_channel = -cls_id - 2
    ig_onehot = jnp.where(
        (cls_id == -1)[:, None],
        jnp.ones((max_objects, num_classes), jnp.float32),
        jax.nn.one_hot(jnp.clip(ig_channel, 0, num_classes - 1), num_classes, dtype=jnp.float32),
    ) * is_ignore[:, None]
    hm_ig = jnp.max(
        splat[:, :, :, None] * ig_onehot[:, None, None, :], axis=0
    )
    # Cap at 0.9999 so ignore centers never read as focal-loss positives
    # (the reference pins centers to exactly 0.9999, kitti_dataset.py:205).
    hm_ig = jnp.minimum(hm_ig, 0.9999)

    hm = jnp.maximum(hm_pos, hm_ig)

    # --- per-slot regression targets (only positive objects) ---
    obj_mask = is_pos
    cen_offset = (center - center_int.astype(jnp.float32)) * obj_mask[:, None]
    sin_yaw = jnp.sin(yaw)
    sin_yaw = jnp.where(hflipped, -sin_yaw, sin_yaw)
    direction = jnp.stack([sin_yaw, jnp.cos(yaw)], axis=-1) * obj_mask[:, None]
    z_coor = ((z - min_z) * obj_mask)[:, None]
    dim = jnp.stack([h, w, l], axis=-1) * obj_mask[:, None]
    indices_center = jnp.where(
        obj_mask, center_int[:, 1] * hm_w + center_int[:, 0], 0
    ).astype(jnp.int32)

    return {
        "hm_cen": hm,
        "cen_offset": cen_offset.astype(jnp.float32),
        "direction": direction.astype(jnp.float32),
        "z_coor": z_coor.astype(jnp.float32),
        "dim": dim.astype(jnp.float32),
        "indices_center": indices_center,
        "obj_mask": obj_mask.astype(jnp.float32),
    }


build_targets_batch = jax.jit(
    jax.vmap(lambda lab, n, hf: build_targets(lab, n, hf)),
)
