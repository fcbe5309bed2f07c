"""Raster-variant shootout on the local chip (batch 128, chained timing).

V0: current points_to_bev (packed key; 2 unsorted scatters: max + add)
V1: same but indices sorted on device first (indices_are_sorted=True)
V2: sort-based: one lax.sort (cid, key), run-length math via cumulative ops,
    ONE unique+sorted scatter-set writing (key_max, count) rows
V3: SCATTER-FREE: 2-key sort (cid, key) then invert with
    searchsorted(cid_s, arange(NC+1)) — per-cell count = run-length diff,
    per-cell max key = gather at the run end (sorted by key within the run).
    Binary search = 15 rounds of gathers from a 128 KB VMEM-resident array.
V4: hybrid: 1-key sort + sorted segment_max for the key, searchsorted for
    the count (replaces only the segment_sum scatter)
probes: sort1/sort2 (the lax.sort alone), ssearch (searchsorted alone)
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


def v3(points, valid):
    cid, key, ok = common(points, valid)
    n = cid.shape[0]
    cid_s, key_s = jax.lax.sort((cid, key), num_keys=2)
    # run boundaries for every cell id at once: starts[c] = first sorted
    # position with cid >= c. Sorted queries over a sorted 32k array; the
    # unrolled binary search is 15 rounds of gathers.
    starts = jnp.searchsorted(
        cid_s, jnp.arange(NC + 1, dtype=jnp.int32), side="left",
        method="scan_unrolled",
    )
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], starts.dtype)])
    count = (ends - starts).astype(jnp.float32)
    # within a run the LAST element has the max key (2-key sort)
    key_max = jnp.where(
        count > 0, key_s[jnp.clip(ends - 1, 0, n - 1)], -1
    )[:NC]
    return finish(key_max, count[:NC])


def v4(points, valid):
    cid, key, ok = common(points, valid)
    n = cid.shape[0]
    cid_s, key_s = jax.lax.sort((cid, key), num_keys=1)
    key_max = jax.ops.segment_max(
        key_s, cid_s, num_segments=NC + 1, indices_are_sorted=True
    )[:NC]
    starts = jnp.searchsorted(
        cid_s, jnp.arange(NC + 1, dtype=jnp.int32), side="left",
        method="scan_unrolled",
    )
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], starts.dtype)])
    count = (ends - starts).astype(jnp.float32)[:NC]
    return finish(key_max, count)


def v5(points, valid):
    """ONE 2-wide segment_max for both channels: after sorting by cid, the
    running within-run count (pos - run_start + 1) is monotonically
    increasing, so its per-cell max IS the run length — count and key ride
    the same scatter."""
    cid, key, ok = common(points, valid)
    n = cid.shape[0]
    cid_s, key_s = jax.lax.sort((cid, key), num_keys=1)
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    start = jax.lax.cummax(jnp.where(first, pos, -1))
    count_here = pos - start + 1
    both = jnp.stack([key_s, count_here], axis=-1)  # (n, 2) int32
    seg = jax.ops.segment_max(
        both, cid_s, num_segments=NC + 1, indices_are_sorted=True
    )
    key_max = seg[:NC, 0]
    count = jnp.maximum(seg[:NC, 1], 0).astype(jnp.float32)
    count = jnp.where(key_max >= 0, count, 0.0)  # dump/empty cells
    return finish(key_max, count)


def v6(points, valid):
    """ONE scalar scatter: 2-key sort (cid, key) makes the within-run order
    ascend by key, so the run's LAST element simultaneously holds the max
    key AND the running count == run length. Repack (qz13 | qr12 | cnt6)
    into 31 bits and segment_max once. cnt saturates at 63, where the
    density channel min(1, log(n+1)/log64) saturates at 1.0 anyway —
    density stays bit-exact; height/intensity requantize to 6.1e-5/1.2e-4
    resolution (13-bit/12-bit packing; parity budget 1e-3)."""
    cid, key, ok = common(points, valid)
    n = cid.shape[0]
    cid_s, key_s = jax.lax.sort((cid, key), num_keys=2)
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    start = jax.lax.cummax(jnp.where(first, pos, -1))
    cnt6 = jnp.minimum(pos - start + 1, 63)
    # key = qz17 * 8192 + qr13  ->  qz13 = key >> 17, qr12 = (key >> 1) & 0xFFF
    qz13 = key_s >> 17
    qr12 = (key_s >> 1) & 0xFFF
    packed = jnp.where(key_s >= 0, (((qz13 << 12) | qr12) << 6) | cnt6, -1)
    seg = jax.ops.segment_max(
        packed, cid_s, num_segments=NC + 1, indices_are_sorted=True
    )[:NC]
    occ = seg >= 0
    seg = jnp.maximum(seg, 0)
    height = jnp.where(occ, ((seg >> 18) & 0x1FFF).astype(jnp.float32) / 8191.0, 0.0)
    inten = jnp.where(occ, ((seg >> 6) & 0xFFF).astype(jnp.float32) / 4095.0, 0.0)
    count = jnp.where(occ, (seg & 63).astype(jnp.float32), 0.0)
    dens = jnp.minimum(1.0, jnp.log(count + 1.0) / np.log(64.0))
    return jnp.stack([inten, height, dens], -1).reshape(H, W, 3)


def probe_sort1(points, valid):
    cid, key, ok = common(points, valid)
    cid_s, key_s, ok_s = jax.lax.sort((cid, key, ok.astype(jnp.int32)), num_keys=1)
    return (cid_s + key_s + ok_s).astype(jnp.float32).reshape(-1, 1, 1)


def probe_sort2(points, valid):
    cid, key, ok = common(points, valid)
    cid_s, key_s = jax.lax.sort((cid, key), num_keys=2)
    return (cid_s + key_s).astype(jnp.float32).reshape(-1, 1, 1)


def probe_ssearch(points, valid):
    cid, key, ok = common(points, valid)
    cid_s, key_s = jax.lax.sort((cid, key), num_keys=2)
    starts = jnp.searchsorted(
        cid_s, jnp.arange(NC + 1, dtype=jnp.int32), side="left",
        method="scan_unrolled",
    )
    return starts.astype(jnp.float32).reshape(-1, 1, 1)


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
    # Recorded results (TPU v5e, batch 128, per-frame ms):
    #   v0 0.689  v1 0.535  v2 2.943  v3 67.26  v4 63.51  v5 2.967  v6 0.301
    #   probe_sort1 0.060  probe_sort2 0.049  probe_ssearch 63.25
    # -> the SORT is ~10% of v1; the two scalar scatters dominate.
    #    searchsorted (gathers at CELL granularity, 369k-wide) and any
    #    scatter with 2-wide update rows (v2 set / v5 2-wide segment_max)
    #    fall off XLA's fast sorted-scatter path entirely.
    r0 = np.asarray(jax.vmap(v0)(pts[:4], valid[:4]))
    variants = {"v1": v1, "v2": v2, "v3": v3, "v4": v4, "v5": v5, "v6": v6}
    timed = {"v0_current": v0, "v1_sorted_segops": v1, "v6_packed_one_scatter": v6}
    if "--all" not in sys.argv:
        variants = {"v1": v1, "v6": v6}
    tol = {"v6": 5e-4}  # v6 requantizes height/intensity (6.1e-5 / 1.2e-4)
    for name, fn in variants.items():
        r = np.asarray(jax.vmap(fn)(pts[:4], valid[:4]))
        err = np.abs(r - r0).max()
        print(f"{name} max-abs err vs v0: {err:.2e}")
        assert err < tol.get(name, 1e-5), name
        # density channel must be bit-exact in every variant
        np.testing.assert_array_equal(r[..., 2], r0[..., 2])
    out = {}
    if "--all" in sys.argv:
        timed.update({
            "v2_one_scatter": v2, "v3_searchsorted": v3, "v4_hybrid": v4,
            "v5_one_segmax": v5,
            "probe_sort1": probe_sort1, "probe_sort2": probe_sort2,
            "probe_ssearch": probe_ssearch,
        })
    for name, fn in timed.items():
        dt = time_variant(fn, pts, valid)
        out[name] = round(dt / 8 / b * 1000.0, 4)
    print(json.dumps({"per_frame_ms": out, "batch": b, "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
