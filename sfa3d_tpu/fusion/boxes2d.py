"""Project metric 3D detections to camera-image 2D AABBs, fixed-K masked.

Parity with reference convert_sfa3d_to_2d_boxes (test6.py:129-186 /
test4.py:128-186): metric velodyne box -> camera frame (yaw ry) -> 8 corners
-> P2 projection -> clipped axis-aligned box [x, y, w, h], keeping
detections with confidence >= conf_gate and positive clipped area. The
reference's per-detection Python loop becomes one batched einsum chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sfa3d_tpu.geometry.transforms import lidar_to_camera_box


@jax.jit
def project_boxes_to_image(
    boxes_real: jax.Array,
    scores: jax.Array,
    mask: jax.Array,
    V2C: jax.Array,
    R0: jax.Array,
    P2: jax.Array,
    *,
    img_h=375,
    img_w=1242,
    conf_gate: float = 0.3,
):
    """(K, 8) metric rows [cls, x, y, z, h, w, l, yaw] + (K,) scores/mask ->
    ((K, 4) [x, y, w, h] int-truncated 2D boxes, (K,) valid mask).

    `img_h`/`img_w` may be Python ints or traced scalars (the batched fusion
    pipeline, fusion/batch.py, threads per-frame image sizes through vmap)."""
    cam = lidar_to_camera_box(boxes_real[:, 1:8], V2C, R0, P2)  # (K,7)
    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    h, w, l = cam[:, 3], cam[:, 4], cam[:, 5]
    ry = cam[:, 6]

    # 8 corners in the object frame (test6.py:149-154 layout: y up is -h).
    xc = jnp.stack([-l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2], -1)
    yc = jnp.stack([jnp.zeros_like(h)] * 4 + [-h] * 4, -1)
    zc = jnp.stack([-w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2], -1)

    c, s = jnp.cos(ry), jnp.sin(ry)
    cx = c[:, None] * xc + s[:, None] * zc + x[:, None]
    cy = yc + y[:, None]
    cz = -s[:, None] * xc + c[:, None] * zc + z[:, None]
    corners = jnp.stack([cx, cy, cz, jnp.ones_like(cx)], axis=-1)  # (K,8,4)

    uvw = jnp.einsum("ij,kcj->kci", jnp.asarray(P2, jnp.float32), corners)  # (K,8,3)
    uv = uvw[..., :2] / uvw[..., 2:3]

    # Corners AT or BEHIND the image plane (camera z <= ~0) flip sign under
    # the perspective divide and would span a spurious near-full-image box
    # that passes the area gate with the detection's real score. Drop such
    # detections outright — a box that close to the camera has no valid
    # image-plane AABB. (Divergence from the reference, which shares this
    # flaw: test6.py:129-186 projects without any depth check; documented
    # in docs/TECHNICAL.md.)
    in_front = jnp.all(uvw[..., 2] > 0.1, axis=-1)  # (K,)

    w_lim = jnp.asarray(img_w, jnp.float32)
    h_lim = jnp.asarray(img_h, jnp.float32)
    min_x = jnp.clip(jnp.min(uv[..., 0], axis=-1), 0.0, None)
    max_x = jnp.clip(jnp.max(uv[..., 0], axis=-1), None, w_lim)
    min_y = jnp.clip(jnp.min(uv[..., 1], axis=-1), 0.0, None)
    max_y = jnp.clip(jnp.max(uv[..., 1], axis=-1), None, h_lim)

    valid = (mask & in_front & (scores >= conf_gate)
             & (max_x > min_x) & (max_y > min_y))
    boxes2d = jnp.stack(
        [
            jnp.trunc(min_x),
            jnp.trunc(min_y),
            jnp.trunc(max_x - min_x),
            jnp.trunc(max_y - min_y),
        ],
        axis=-1,
    )
    # NOTE int() on the already-clipped float differences matches the
    # reference's `int(max_x - min_x)` truncation (test6.py:183).
    return jnp.where(valid[:, None], boxes2d, 0.0), valid
