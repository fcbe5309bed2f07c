"""Raster-variant shootout on the local chip (batch 128, chained timing).

V0: current points_to_bev (packed key; 2 unsorted scatters: max + add)
V1: same but indices sorted on device first (indices_are_sorted=True)
V2: sort-based: one lax.sort (cid, key), run-length math via cumulative ops,
    ONE unique+sorted scatter-set writing (key_max, count) rows
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sfa3d_tpu.config import kitti as cnf
from bench import make_points

H, W = cnf.BEV_HEIGHT, cnf.BEV_WIDTH
NC = H * W
BOUND = (
    cnf.boundary["minX"], cnf.boundary["maxX"],
    cnf.boundary["minY"], cnf.boundary["maxY"],
    cnf.boundary["minZ"], cnf.boundary["maxZ"],
)


def common(points, valid):
    min_x, max_x, min_y, max_y, min_z, max_z = BOUND
    disc = (max_x - min_x) / H
    x, y, z, r = points[:, 0], points[:, 1], points[:, 2], points[:, 3]
    r = jnp.nan_to_num(r)
    ok = (
        valid
        & (x >= min_x) & (x <= max_x)
        & (y >= min_y) & (y <= max_y)
        & (z >= min_z) & (z <= max_z)
    )
    zs = z - min_z
    row = jnp.floor((x - min_x) / disc).astype(jnp.int32)
    col = jnp.floor(y / disc).astype(jnp.int32) + W // 2
    ok = ok & (row >= 0) & (row < H) & (col >= 0) & (col < W)
    cid = jnp.where(ok, row * W + col, NC)
    z_range = abs(max_z - min_z)
    qz = jnp.clip((zs / z_range * 131071.0 + 0.5).astype(jnp.int32), 0, 131071)
    qr = jnp.clip((r * 8191.0 + 0.5).astype(jnp.int32), 0, 8191)
    key = jnp.where(ok, qz * 8192 + qr, -1)
    return cid, key, ok


def finish(key_max, count):
    occupied = key_max >= 0
    key_max = jnp.maximum(key_max, 0)
    height = jnp.where(occupied, (key_max >> 13).astype(jnp.float32) / 131071.0, 0.0)
    inten = jnp.where(occupied, (key_max & 8191).astype(jnp.float32) / 8191.0, 0.0)
    dens = jnp.minimum(1.0, jnp.log(count + 1.0) / np.log(64.0))
    return jnp.stack([inten, height, dens], -1).reshape(H, W, 3)


def v0(points, valid):
    cid, key, ok = common(points, valid)
    key_max = jax.ops.segment_max(key, cid, num_segments=NC + 1)[:NC]
    count = jax.ops.segment_sum(ok.astype(jnp.float32), cid, num_segments=NC + 1)[:NC]
    return finish(key_max, count)


def v1(points, valid):
    cid, key, ok = common(points, valid)
    cid_s, key_s, ok_s = jax.lax.sort((cid, key, ok.astype(jnp.int32)), num_keys=1)
    key_max = jax.ops.segment_max(
        key_s, cid_s, num_segments=NC + 1, indices_are_sorted=True
    )[:NC]
    count = jax.ops.segment_sum(
        ok_s.astype(jnp.float32), cid_s, num_segments=NC + 1, indices_are_sorted=True
    )[:NC]
    return finish(key_max, count)


def v2(points, valid):
    cid, key, ok = common(points, valid)
    n = cid.shape[0]
    # lexicographic sort by (cid, key): within a cell the LAST entry holds
    # the max key
    cid_s, key_s = jax.lax.sort((cid, key), num_keys=2)
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    last = jnp.concatenate([cid_s[1:] != cid_s[:-1], jnp.ones((1,), bool)])
    # run start index propagates forward (cid_s ascending -> cummax works)
    start = jax.lax.cummax(jnp.where(first, pos, -1))
    run_len = pos - start + 1
    # one scatter-set of int32 (key_max, count) rows — int32 table: the
    # 30-bit packed key does not survive a float32 round trip. Non-last rows
    # aim at the dump cell.
    idx = jnp.where(last, cid_s, NC)
    table = jnp.full((NC + 1, 2), -1, jnp.int32)
    rows = jnp.stack([key_s, run_len], -1)
    table = table.at[idx].set(rows, mode="drop")
    key_max = table[:NC, 0]
    count = jnp.maximum(table[:NC, 1], 0).astype(jnp.float32)
    return finish(key_max, count)


def time_variant(fn, pts, valid, iters=8):
    batched = jax.jit(jax.vmap(fn))

    @jax.jit
    def step(pts, valid, fb):
        bev = batched(pts + fb, valid)
        return bev, bev[0, 0, 0, 0] * 0.0

    _, fb = step(pts, valid, jnp.float32(0))
    _ = float(fb)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, fb = step(pts, valid, fb)
    _ = float(fb)
    return time.perf_counter() - t0


def main():
    b = 128
    pts, valid = make_points(b)
    # correctness vs v0 first (on 4 frames)
    r0 = np.asarray(jax.vmap(v0)(pts[:4], valid[:4]))
    for name, fn in (("v1", v1), ("v2", v2)):
        r = np.asarray(jax.vmap(fn)(pts[:4], valid[:4]))
        err = np.abs(r - r0).max()
        print(f"{name} max-abs err vs v0: {err:.2e}")
        assert err < 1e-5, name
    out = {}
    for name, fn in (("v0_current", v0), ("v1_sorted_segops", v1), ("v2_one_scatter", v2)):
        dt = time_variant(fn, pts, valid)
        out[name] = round(dt / 8 / b * 1000.0, 4)
    print(json.dumps({"per_frame_ms": out, "batch": b, "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
