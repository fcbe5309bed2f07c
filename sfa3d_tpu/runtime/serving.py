"""Batched serving runtime — dynamic request batching over the jit pipeline.

Capability BEYOND the reference (SURVEY.md §1: "There is no service/serving
layer" in the reference tree): concurrent callers submit single scans and
the server coalesces them into device batches, trading up to `max_delay_ms`
of latency for MXU utilization. Batches run at power-of-two bucket sizes so
the jit cache stays small (one compile per bucket); short batches are
zero-padded and the padding frames cost nothing to callers.

    server = BatchingDetectorServer(Detector(...), max_batch=8)
    fut = server.submit(points)          # returns concurrent.futures.Future
    dets = fut.result()                  # list of detection dicts
    server.stop()

Threading model: ONE dispatch thread owns all device calls (JAX dispatch is
not thread-safe from many threads against one program cache); request
threads only enqueue and wait on futures. The host-side filter+pad
(native/preproc.cpp when built) runs on the CALLER's thread, so it
parallelizes across clients and stays off the dispatch thread.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

from sfa3d_tpu.config import kitti as cnf


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class BatchingDetectorServer:
    """Dynamic batcher around a `Detector` (LiDAR-only path)."""

    def __init__(self, detector, max_batch: int = 8, max_delay_ms: float = 5.0):
        self.det = detector
        self.max_batch = max(1, int(max_batch))
        self.max_delay_s = max_delay_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # serializes submit()'s (check stopped, enqueue) against stop()'s
        # (mark stopped, final drain): without it a submit racing stop could
        # enqueue after the drain and leave its Future unresolved forever
        self._submit_lock = threading.Lock()
        # served = requests answered; batches = device calls;
        # padded = zero frames added to reach the bucket size
        self.stats: Dict[str, int] = {"served": 0, "batches": 0, "padded": 0}
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="serving-dispatch"
        )
        self._thread.start()

    # -- client API -------------------------------------------------------
    def submit(self, points: np.ndarray) -> Future:
        """(N, 4) raw velodyne scan -> Future of a detection-dict list."""
        from sfa3d_tpu.ops.bev import filter_and_pad_points

        pts, valid = filter_and_pad_points(
            points, max_points=cnf.MAX_POINTS_FILTERED
        )
        return self._enqueue(pts, valid)

    def _enqueue(self, pts, valid) -> Future:
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("server stopped")
            self._q.put((pts, valid, fut))
        return fut

    def submit_file(self, velodyne_bin: str) -> Future:
        from sfa3d_tpu import native

        res = native.read_velodyne_filtered(
            velodyne_bin, cnf.MAX_POINTS_FILTERED, cnf.boundary
        )
        if res is not None:
            return self._enqueue(res[0], res[1])
        points = np.fromfile(velodyne_bin, dtype=np.float32).reshape(-1, 4)
        return self.submit(points)

    def stop(self, timeout: float = 30.0):
        """Drain in-flight work, then stop the dispatch thread. If the
        dispatch thread fails to retire within `timeout` (e.g. a compile in
        flight), remaining requests are cancelled rather than left hanging."""
        self._q.put(None)  # sentinel: finish everything queued before it
        self._thread.join(timeout=timeout)
        with self._submit_lock:
            self._stop.set()
            # anything enqueued after the sentinel (or still queued after a
            # join timeout) is cancelled, never left unresolved
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item[2].cancel()

    # -- dispatch thread ---------------------------------------------------
    def _loop(self):
        while True:
            try:
                item = self._q.get(timeout=0.05)
            except queue.Empty:
                if self._stop.is_set():
                    return
                continue
            if item is None:
                return
            batch = [item]
            deadline = time.monotonic() + self.max_delay_s
            sentinel_seen = False
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    sentinel_seen = True
                    break
                batch.append(nxt)
            try:
                self._run_batch(batch)
            except BaseException as e:  # propagate to the callers
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
            if sentinel_seen:
                return

    def _run_batch(self, batch):
        import jax.numpy as jnp

        from sfa3d_tpu.detector import format_detections
        from sfa3d_tpu.pipeline import detect_frames

        n = len(batch)
        bucket = min(_next_pow2(n), self.max_batch)
        P = batch[0][0].shape[0]
        pts = np.zeros((bucket, P, 4), np.float32)
        valid = np.zeros((bucket, P), bool)
        for i, (p, v, _) in enumerate(batch):
            pts[i], valid[i] = p, v
        out = detect_frames(
            self.det.model, self.det.variables, jnp.asarray(pts),
            jnp.asarray(valid), K=self.det.K, peak_thresh=self.det.peak_thresh,
        )
        # one host fetch for the whole batch, then fan results out
        out = {k: np.asarray(v) for k, v in out.items()}
        for i, (_, _, fut) in enumerate(batch):
            fut.set_result(format_detections(out, i))
        self.stats["served"] += n
        self.stats["batches"] += 1
        self.stats["padded"] += bucket - n
