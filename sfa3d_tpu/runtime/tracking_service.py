"""Per-stream stateful 3D MOT for the serving layer (beyond-reference).

The batching servers (runtime/serving.py) are stateless: every request is
an independent frame. Real deployments consume ORDERED frames from one or
more sensors, and what they want back is identities — "car #7 is still
car #7, moving at 1.1 m/frame". `TrackingSessions` adds that as a pure
post-processing layer over the detection replies: one fixed-slot Kalman
tracker (sfa3d_tpu/tracking/) per stream key, advanced once per frame,
with the compiled `tracker_step` shared by every stream (same shapes ->
one XLA program).

Design constraints:
- Per-stream mutual exclusion (a striped lock pool): tracker state is the
  one piece of order-dependent state in the server. Frames of one stream
  must be submitted in order on one connection; the serve CLI's writer
  thread resolves replies in request order, which preserves that order.
  Locks come from a FIXED pool indexed by stream-key hash: a per-stream
  lock dict would either grow without bound or have to drop locks on
  eviction — and dropping a lock another thread currently holds breaks
  the mutual exclusion. Stripe collisions only over-serialize two
  unlucky streams.
- Bounded memory: streams are LRU-evicted beyond `max_streams` (a public
  endpoint fed random stream keys must not grow without bound). An
  evicted stream that RETURNS restarts with fresh tracker state — but
  its ids resume from a service-wide floor (the max next_id ever
  evicted), so a track_id is never reused within one logical stream:
  the consumer sees a scene cut, never two objects sharing an id.
- The device work is O(max_tracks * K) per frame and tiny next to the
  detector itself (64x50 rotated-IoU + Kalman update).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from functools import partial
from typing import Dict, List

import numpy as np

from sfa3d_tpu.config import kitti as cnf


class TrackingSessions:
    """stream key -> tracker state; `update` advances one stream by one
    frame of detection dicts (detector.format_detections layout) and
    returns the confirmed tracks as wire-ready dicts."""

    def __init__(
        self,
        K: int = 50,
        max_tracks: int = 64,
        iou_min: float = 0.01,
        max_age: int = 3,
        min_hits: int = 2,
        max_streams: int = 256,
        include_coasting: bool = False,
        lock_stripes: int = 64,
    ):
        from sfa3d_tpu.tracking import init_tracks, tracker_step

        self.K = int(K)
        self.max_tracks = int(max_tracks)
        self.max_streams = int(max_streams)
        self.include_coasting = bool(include_coasting)
        self._init_tracks = init_tracks
        # tracker_step is already jitted with these as static kwargs — a
        # plain partial hits the same compiled cache
        self._step = partial(
            tracker_step, iou_min=iou_min, max_age=max_age, min_hits=min_hits
        )
        self._states: "OrderedDict[str, object]" = OrderedDict()
        self._lock_pool = [threading.Lock() for _ in range(lock_stripes)]
        self._registry = threading.Lock()  # guards _states + _id_floor
        # max next_id ever LRU-evicted: a returning evicted stream resumes
        # ids from here, never from 0 (see module docstring)
        self._id_floor = 0

    # -- stream registry --------------------------------------------------
    def _acquire(self, stream: str) -> threading.Lock:
        return self._lock_pool[hash(stream) % len(self._lock_pool)]

    def reset(self, stream: str) -> None:
        """Drop a stream's tracks (scene cut / new recording). The id
        counter carries over: post-cut tracks get FRESH ids, so a consumer
        never sees one track_id span two scenes."""
        with self._registry:
            old = self._states.pop(stream, None)
            if old is not None:
                self._states[stream] = self._init_tracks(
                    self.max_tracks)._replace(next_id=old.next_id)

    def _get_state(self, stream: str):
        import jax.numpy as jnp

        with self._registry:
            if stream in self._states:
                self._states.move_to_end(stream)
                return self._states[stream]
            floor = self._id_floor
        return self._init_tracks(self.max_tracks)._replace(
            next_id=jnp.int32(floor))

    def _put_state(self, stream: str, state) -> None:
        evicted_states = []
        with self._registry:
            self._states[stream] = state
            self._states.move_to_end(stream)
            while len(self._states) > self.max_streams:
                evicted_states.append(self._states.popitem(last=False)[1])
        # materialize the evicted counters OUTSIDE the registry lock (a
        # device->host scalar fetch; rare — only on eviction) and raise the
        # service-wide id floor so the evicted streams' ids are never reused
        if evicted_states:
            high = max(int(s.next_id) for s in evicted_states)
            with self._registry:
                self._id_floor = max(self._id_floor, high)

    @property
    def n_streams(self) -> int:
        with self._registry:
            return len(self._states)

    # -- the frame step ----------------------------------------------------
    def update(self, stream: str, detections: List[Dict]) -> List[Dict]:
        """Advance `stream` by one frame. `detections` is the detection-dict
        list a server future resolves to; returns the track list for the
        wire. Caller-order = frame-order (see module docstring)."""
        import jax.numpy as jnp

        boxes = np.zeros((self.K, 8), np.float32)
        scores = np.zeros((self.K,), np.float32)
        valid = np.zeros((self.K,), bool)
        dets = sorted(detections, key=lambda d: -d["score"])[: self.K]
        for i, d in enumerate(dets):
            boxes[i] = [d["class_id"], d["x"], d["y"], d["z"],
                        d["h"], d["w"], d["l"], d["yaw"]]
            scores[i] = d["score"]
            valid[i] = True

        lock = self._acquire(stream)
        with lock:
            state = self._get_state(stream)
            state, out = self._step(
                state, jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(valid))
            self._put_state(stream, state)

        out = {k: np.asarray(v) for k, v in out.items()}
        which = out["alive"] if self.include_coasting else out["confirmed"]
        tracks = []
        for t in np.nonzero(which)[0]:
            row = out["boxes"][t]
            cls = int(row[0])
            tracks.append({
                "track_id": int(out["ids"][t]),
                "class_id": cls,
                "class_name": cnf.ID_TO_CLASS_NAME.get(cls, str(cls)),
                "score": float(out["scores"][t]),
                "x": float(row[1]), "y": float(row[2]), "z": float(row[3]),
                "h": float(row[4]), "w": float(row[5]), "l": float(row[6]),
                "yaw": float(row[7]),
                "velocity": [round(float(v), 6) for v in out["velocities"][t][:2]],
                "confirmed": bool(out["confirmed"][t]),
            })
        return tracks
