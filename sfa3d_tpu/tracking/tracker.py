"""TPU-native 3D multi-object tracking over per-frame detections.

BEYOND the reference: the reference's demo videos re-detect every frame
independently (demo_2_sides.py, test*.py) with no identity or temporal
smoothing. This module adds an AB3DMOT-style tracker (Weng et al. 2020,
"3D Multi-Object Tracking: A Baseline") re-designed for TPU execution:

- FIXED track slots (`max_tracks`), alive/confirmed masks instead of a
  dynamic track list — the whole per-frame update is one fixed-shape jit
  program, and a sequence is one `lax.scan`.
- Constant-velocity Kalman filter per slot on [x, y, z, yaw, h, w, l]
  with velocity states [vx, vy, vz]; the (7,7) innovation solve is
  vmapped over slots (tiny dense algebra — negligible next to the
  detector, and it keeps the tracker on-device so a detect->track
  pipeline never leaves the chip).
- Association: BEV rotated-IoU (ops/rotated_iou.py) between the
  PREDICTED track boxes and the frame's detections, class-gated, greedy
  by descending detection score (a fori_loop, same pattern as
  fusion.fuse.greedy_match).
- AB3DMOT's orientation correction: when the matched detection's yaw
  disagrees with the track by more than pi/2, the innovation is flipped
  by pi before the update (a box is pi-symmetric in BEV extent, so the
  detector may report either facing).
- Births fill free slots from unmatched detections (stable ids from a
  running counter); deaths after `max_age` consecutive misses; tracks
  report as confirmed once `min_hits` matches accumulate.

Input format matches ops/decode.detections_to_real: metric velodyne-frame
rows [cls, x, y, z_bottom, h, w, l, yaw] + a validity mask + scores.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfa3d_tpu.ops.rotated_iou import pairwise_iou_bev_rotated

# state layout: [x, y, z, yaw, h, w, l, vx, vy, vz]
DIM_X = 10
DIM_Z = 7
_POS = slice(0, 3)  # x, y, z
_VEL = slice(7, 10)  # vx, vy, vz
_YAW = 3

# constant-velocity transition: pos += vel (dt = 1 frame)
_F = np.eye(DIM_X, dtype=np.float32)
_F[0, 7] = _F[1, 8] = _F[2, 9] = 1.0
# observe the first 7 state dims
_H = np.zeros((DIM_Z, DIM_X), dtype=np.float32)
_H[:DIM_Z, :DIM_Z] = np.eye(DIM_Z)
# AB3DMOT covariance recipe: huge initial velocity uncertainty, modest
# process noise on velocity only, unit measurement noise
_P0 = np.eye(DIM_X, dtype=np.float32)
_P0[_VEL, _VEL] *= 1000.0
_P0 *= 10.0
_Q = np.zeros((DIM_X, DIM_X), dtype=np.float32)
_Q[7, 7] = _Q[8, 8] = _Q[9, 9] = 0.01
_R = np.eye(DIM_Z, dtype=np.float32)


class TrackState(NamedTuple):
    """Fixed-slot tracker state (a pytree; every leaf is fixed-shape)."""

    mean: jax.Array  # (T, 10)
    cov: jax.Array  # (T, 10, 10)
    alive: jax.Array  # (T,) bool
    track_id: jax.Array  # (T,) int32, -1 when free
    cls: jax.Array  # (T,) int32
    score: jax.Array  # (T,) f32 — last matched detection score
    hits: jax.Array  # (T,) int32 — total matches
    misses: jax.Array  # (T,) int32 — consecutive misses
    next_id: jax.Array  # () int32


def init_tracks(max_tracks: int = 64) -> TrackState:
    t = max_tracks
    return TrackState(
        mean=jnp.zeros((t, DIM_X), jnp.float32),
        cov=jnp.tile(jnp.asarray(_P0)[None], (t, 1, 1)),
        alive=jnp.zeros((t,), bool),
        track_id=jnp.full((t,), -1, jnp.int32),
        cls=jnp.zeros((t,), jnp.int32),
        score=jnp.zeros((t,), jnp.float32),
        hits=jnp.zeros((t,), jnp.int32),
        misses=jnp.zeros((t,), jnp.int32),
        next_id=jnp.int32(0),
    )


def _wrap_pi(a):
    """Wrap angles to [-pi, pi)."""
    return (a + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def _predict(state: TrackState) -> TrackState:
    F = jnp.asarray(_F)
    Q = jnp.asarray(_Q)
    mean = state.mean @ F.T
    cov = jnp.einsum("ij,tjk,lk->til", F, state.cov, F) + Q
    return state._replace(mean=mean, cov=cov)


def _associate(state: TrackState, det_boxes, det_scores, det_cls, det_valid,
               iou_min: float):
    """Greedy match by descending detection score. Returns
    (det_match (K,) int32 slot index or -1, track_matched (T,) bool)."""
    trk = state.mean
    trk5 = jnp.stack(
        [trk[:, 0], trk[:, 1], trk[:, 5], trk[:, 6], trk[:, 3]], axis=-1
    )  # (T, 5) [x, y, w, l, yaw]
    det5 = jnp.stack(
        [det_boxes[:, 1], det_boxes[:, 2], det_boxes[:, 5], det_boxes[:, 6],
         det_boxes[:, 7]], axis=-1
    )  # (K, 5)
    iou = pairwise_iou_bev_rotated(det5, trk5)  # (K, T)
    ok = (
        det_valid[:, None]
        & state.alive[None, :]
        & (det_cls[:, None] == state.cls[None, :])
    )
    iou = jnp.where(ok, iou, -1.0)

    k = det_boxes.shape[0]
    order = jnp.argsort(-det_scores)  # highest-confidence detections first

    def body(i, carry):
        det_match, trk_used = carry
        d = order[i]
        row = jnp.where(trk_used, -1.0, iou[d])
        j = jnp.argmax(row)
        hit = row[j] >= iou_min
        det_match = det_match.at[d].set(jnp.where(hit, j, -1))
        trk_used = trk_used.at[j].set(trk_used[j] | hit)
        return det_match, trk_used

    init = (jnp.full((k,), -1, jnp.int32), jnp.zeros(state.alive.shape, bool))
    return jax.lax.fori_loop(0, k, body, init)


def _kf_update(mean, cov, z):
    """One KF measurement update. mean (10,), cov (10,10), z (7,) with the
    yaw innovation already orientation-corrected by the caller."""
    H = jnp.asarray(_H)
    R = jnp.asarray(_R)
    y = z - H @ mean
    y = y.at[_YAW].set(_wrap_pi(y[_YAW]))
    # AB3DMOT orientation correction: a BEV box is pi-symmetric, so a yaw
    # reading ~pi away is the same box facing "backwards" — fold the
    # innovation into [-pi/2, pi/2] instead of dragging yaw half a turn
    dy = y[_YAW]
    dy = jnp.where(dy > jnp.pi / 2, dy - jnp.pi, dy)
    dy = jnp.where(dy < -jnp.pi / 2, dy + jnp.pi, dy)
    y = y.at[_YAW].set(dy)
    S = H @ cov @ H.T + R
    K = jnp.linalg.solve(S, H @ cov).T  # (10, 7)
    mean = mean + K @ y
    mean = mean.at[_YAW].set(_wrap_pi(mean[_YAW]))
    cov = (jnp.eye(DIM_X) - K @ H) @ cov
    return mean, cov


@partial(jax.jit, static_argnames=("iou_min", "max_age", "min_hits"))
def tracker_step(
    state: TrackState,
    boxes_real: jax.Array,  # (K, 8) [cls, x, y, z, h, w, l, yaw]
    scores: jax.Array,  # (K,)
    valid: jax.Array,  # (K,) bool
    *,
    iou_min: float = 0.01,
    max_age: int = 3,
    min_hits: int = 2,
) -> Tuple[TrackState, Dict[str, jax.Array]]:
    """Advance the tracker one frame. Returns (new_state, outputs) where
    outputs reports every slot with masks:
      ids (T,), boxes (T, 8) (same row layout as the input), scores (T,),
      velocities (T, 3), alive (T,), confirmed (T,) — confirmed means
      alive AND hits >= min_hits.
    """
    det_cls = boxes_real[:, 0].astype(jnp.int32)
    state = _predict(state)
    det_match, trk_matched = _associate(
        state, boxes_real, scores, det_cls, valid, iou_min
    )

    # --- update matched tracks ------------------------------------------
    # per-slot: which detection matched it (-1 if none)
    t = state.alive.shape[0]
    k = boxes_real.shape[0]
    slot_det = jnp.full((t,), -1, jnp.int32)
    det_idx = jnp.arange(k, dtype=jnp.int32)
    slot_det = slot_det.at[jnp.where(det_match >= 0, det_match, t)].set(
        det_idx, mode="drop"
    )
    has_det = slot_det >= 0
    safe_det = jnp.maximum(slot_det, 0)
    z = boxes_real[safe_det][:, 1:8]  # (T, 7) [x, y, z, h, w, l, yaw] ->
    # state observation order is [x, y, z, yaw, h, w, l]
    z = jnp.stack(
        [z[:, 0], z[:, 1], z[:, 2], z[:, 6], z[:, 3], z[:, 4], z[:, 5]],
        axis=-1,
    )
    upd_mean, upd_cov = jax.vmap(_kf_update)(state.mean, state.cov, z)
    mean = jnp.where(has_det[:, None], upd_mean, state.mean)
    cov = jnp.where(has_det[:, None, None], upd_cov, state.cov)
    score = jnp.where(has_det, scores[safe_det], state.score)
    hits = state.hits + has_det.astype(jnp.int32)
    misses = jnp.where(has_det, 0, state.misses + state.alive.astype(jnp.int32))

    # --- deaths -----------------------------------------------------------
    alive = state.alive & (misses < max_age)

    # --- births -----------------------------------------------------------
    is_birth = valid & (det_match < 0)  # unmatched real detections
    free = ~alive
    # stable assignment: r-th birth -> r-th free slot
    free_slots = jnp.argsort(~free)  # free slot indices first (stable)
    birth_rank = jnp.cumsum(is_birth.astype(jnp.int32)) - 1  # (K,)
    n_free = jnp.sum(free.astype(jnp.int32))
    can_place = is_birth & (birth_rank < n_free)
    target = jnp.where(can_place, free_slots[jnp.minimum(birth_rank, t - 1)], t)

    init_mean = jnp.zeros((k, DIM_X), jnp.float32)
    init_mean = init_mean.at[:, 0:3].set(boxes_real[:, 1:4])
    init_mean = init_mean.at[:, _YAW].set(boxes_real[:, 7])
    init_mean = init_mean.at[:, 4:7].set(boxes_real[:, 4:7])

    mean = mean.at[target].set(init_mean, mode="drop")
    cov = cov.at[target].set(jnp.asarray(_P0), mode="drop")
    score = score.at[target].set(scores, mode="drop")
    hits = hits.at[target].set(1, mode="drop")
    misses = misses.at[target].set(0, mode="drop")
    cls = state.cls.at[target].set(det_cls, mode="drop")
    new_ids = state.next_id + birth_rank
    track_id = state.track_id.at[target].set(new_ids, mode="drop")
    alive = alive.at[target].set(True, mode="drop")
    n_births = jnp.sum(can_place.astype(jnp.int32))
    next_id = state.next_id + n_births

    new_state = TrackState(
        mean=mean, cov=cov, alive=alive, track_id=track_id, cls=cls,
        score=score, hits=hits, misses=misses, next_id=next_id,
    )

    out_boxes = jnp.concatenate(
        [
            cls[:, None].astype(jnp.float32),
            mean[:, 0:3],  # x, y, z
            mean[:, 4:7],  # h, w, l
            mean[:, _YAW:_YAW + 1],
        ],
        axis=-1,
    )
    confirmed = alive & (hits >= min_hits)
    outputs = {
        "ids": track_id,
        "boxes": out_boxes,
        "scores": score,
        "velocities": mean[:, _VEL],
        "alive": alive,
        "confirmed": confirmed,
    }
    return new_state, outputs


def track_sequence(
    boxes_seq: jax.Array,  # (F, K, 8)
    scores_seq: jax.Array,  # (F, K)
    valid_seq: jax.Array,  # (F, K) bool
    *,
    max_tracks: int = 64,
    iou_min: float = 0.01,
    max_age: int = 3,
    min_hits: int = 2,
) -> Dict[str, jax.Array]:
    """Track a whole detection sequence in ONE jit program (lax.scan over
    frames). Returns the per-frame outputs stacked on a leading F axis."""

    def step(state, frame):
        b, s, v = frame
        state, out = tracker_step(
            state, b, s, v, iou_min=iou_min, max_age=max_age,
            min_hits=min_hits,
        )
        return state, out

    state = init_tracks(max_tracks)
    _, outs = jax.lax.scan(step, state, (boxes_seq, scores_seq, valid_seq))
    return outs
