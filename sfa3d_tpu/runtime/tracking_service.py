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
- Per-stream mutual exclusion (a lock per stream): tracker state is the
  one piece of order-dependent state in the server. Frames of one stream
  must be submitted in order on one connection; the serve CLI's writer
  thread resolves replies in request order, which preserves that order.
- Bounded memory: streams are LRU-evicted beyond `max_streams` (a public
  endpoint fed random stream keys must not grow without bound).
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
    ):
        import jax

        from sfa3d_tpu.tracking import init_tracks, tracker_step

        self.K = int(K)
        self.max_tracks = int(max_tracks)
        self.max_streams = int(max_streams)
        self.include_coasting = bool(include_coasting)
        self._init_tracks = init_tracks
        self._step = jax.jit(partial(
            tracker_step, iou_min=iou_min, max_age=max_age, min_hits=min_hits
        ))
        self._states: "OrderedDict[str, object]" = OrderedDict()
        self._locks: Dict[str, threading.Lock] = {}
        self._registry = threading.Lock()  # guards the two dicts above

    # -- stream registry --------------------------------------------------
    def _acquire(self, stream: str) -> threading.Lock:
        with self._registry:
            if stream not in self._locks:
                self._locks[stream] = threading.Lock()
            return self._locks[stream]

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
        with self._registry:
            if stream in self._states:
                self._states.move_to_end(stream)
                return self._states[stream]
        return self._init_tracks(self.max_tracks)

    def _put_state(self, stream: str, state) -> None:
        with self._registry:
            self._states[stream] = state
            self._states.move_to_end(stream)
            while len(self._states) > self.max_streams:
                evicted, _ = self._states.popitem(last=False)
                self._locks.pop(evicted, None)

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
