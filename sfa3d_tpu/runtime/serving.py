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
import sys
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
        # ArtifactDetector carries its export-time point budget; live
        # detectors use the production constant
        self._P = getattr(detector, "max_points", cnf.MAX_POINTS_FILTERED)
        # a fixed-batch artifact runs exactly ONE batch size: every bucket
        # is padded to it, and max_batch can't exceed it
        self._fixed_bucket = getattr(detector, "fixed_batch", None)
        if self._fixed_bucket is not None and max_batch > self._fixed_bucket:
            print(
                f"serving: clamping max_batch {max_batch} -> "
                f"{self._fixed_bucket} (fixed-batch artifact)",
                file=sys.stderr,
            )
            max_batch = self._fixed_bucket
        self.max_batch = max(1, int(max_batch))
        self.max_delay_s = max_delay_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # serializes submit()'s (check stopped, enqueue) against stop()'s
        # (mark stopped, final drain): without it a submit racing stop could
        # enqueue after the drain and leave its Future unresolved forever
        self._submit_lock = threading.Lock()
        # serializes warmup()'s device calls against the dispatch thread's
        # (the single-dispatch-thread invariant above)
        self._device_lock = threading.Lock()
        # served = requests answered; batches = device calls;
        # padded = zero frames added to reach the bucket size
        self.stats: Dict[str, int] = {"served": 0, "batches": 0, "padded": 0}
        self._warmed = False  # stop() widens its join budget when False
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="serving-dispatch"
        )
        self._thread.start()

    # -- client API -------------------------------------------------------
    def submit(self, points: np.ndarray) -> Future:
        """(N, 4) raw velodyne scan -> Future of a detection-dict list."""
        from sfa3d_tpu.ops.bev import filter_and_pad_points

        pts, valid = filter_and_pad_points(points, max_points=self._P)
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
            velodyne_bin, self._P, cnf.boundary
        )
        if res is not None:
            return self._enqueue(res[0], res[1])
        points = np.fromfile(velodyne_bin, dtype=np.float32).reshape(-1, 4)
        return self.submit(points)

    def warmup(self):
        """Compile every runtime bucket (powers of two capped at max_batch,
        plus max_batch itself when it is not a power of two) before traffic
        arrives — a mid-traffic bucket compile stalls that batch for the
        full XLA compile time (tens of seconds on a cold chip). Safe to
        call while traffic flows: warm compiles serialize with dispatch on
        the device lock."""
        if self._fixed_bucket is not None:
            buckets = [self._fixed_bucket]  # the only size that can run
        else:
            buckets = []
            b = 1
            while b < self.max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(self.max_batch)
        for b in buckets:
            with self._device_lock:
                self._warm_bucket(b)
        self._warmed = True

    def _warm_bucket(self, bucket: int):
        P = self._P
        self.det.detect_batch(
            np.zeros((bucket, P, 4), np.float32), np.zeros((bucket, P), bool)
        )  # detect_batch fetches host arrays, forcing compile + execute

    _DEFAULT_STOP_TIMEOUT = object()  # sentinel: "caller didn't choose"

    def stop(self, timeout=_DEFAULT_STOP_TIMEOUT):
        """Drain in-flight work, then stop the dispatch thread. If the
        dispatch thread fails to retire within `timeout` (e.g. a compile in
        flight), remaining requests are cancelled rather than left hanging.

        Compile interaction: a cold-bucket XLA compile on the tunneled chip
        can take 5-10 MINUTES (CLAUDE.md), far past the 30 s default — a
        stop during a first-request compile would cancel requests that were
        about to succeed. Call `warmup()` before traffic, or pass
        `timeout=None` to wait for the drain unconditionally. When the
        caller doesn't choose a timeout, the default is 30 s after warmup()
        and one compile budget (600 s) otherwise; an EXPLICIT timeout —
        even 30.0 — is always honored as given."""
        if timeout is self._DEFAULT_STOP_TIMEOUT:
            timeout = 30.0 if self._warmed else 600.0
        self._q.put(None)  # sentinel: finish everything queued before it
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            print(
                f"serving: dispatch thread still busy after {timeout}s "
                "(compile in flight?); cancelling queued requests",
                file=sys.stderr,
            )
        with self._submit_lock:
            self._stop.set()
            # anything enqueued after the sentinel (or still queued after a
            # join timeout) is cancelled, never left unresolved
            cancelled = 0
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item[2].cancel()
                    cancelled += 1
            if cancelled:
                self.stats["cancelled"] = (
                    self.stats.get("cancelled", 0) + cancelled
                )
                print(
                    f"serving: cancelled {cancelled} queued request(s) at stop",
                    file=sys.stderr,
                )

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
                try:
                    # past the deadline, a non-blocking drain still takes
                    # whatever is ALREADY queued — it costs no latency and
                    # raises bucket fill (requests that arrived during the
                    # blocking wait used to be left behind at timeout)
                    nxt = (self._q.get(timeout=remaining) if remaining > 0
                           else self._q.get_nowait())
                except queue.Empty:
                    break
                if nxt is None:
                    sentinel_seen = True
                    break
                batch.append(nxt)
            try:
                with self._device_lock:
                    self._run_batch(batch)
            except BaseException as e:  # propagate to the callers
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
            if sentinel_seen:
                return

    def _run_batch(self, batch):
        from sfa3d_tpu.detector import format_detections

        n = len(batch)
        if self._fixed_bucket is not None:
            bucket = self._fixed_bucket  # pad up: the artifact's only size
        else:
            bucket = min(_next_pow2(n), self.max_batch)
        P = batch[0][0].shape[0]
        pts = np.zeros((bucket, P, 4), np.float32)
        valid = np.zeros((bucket, P), bool)
        for i, (p, v, _) in enumerate(batch):
            pts[i], valid[i] = p, v
        # detect_batch fetches ONLY the small detection arrays in one host
        # round trip; the (B, 608, 608, 3) bev raster stays on device
        # (shipping it was measured 3x SLOWER than sequential on the
        # tunneled chip at ~4.4 MB/frame D2H)
        out = self.det.detect_batch(pts, valid)
        for i, (_, _, fut) in enumerate(batch):
            fut.set_result(format_detections(out, i))
        self.stats["served"] += n
        self.stats["batches"] += 1
        self.stats["padded"] += bucket - n


class BatchingFusedServer(BatchingDetectorServer):
    """Dynamic batcher over the FULL camera-LiDAR fusion pipeline
    (fusion/batch.py — the reference's test6 flow as one jit program).

    submit_fused(points, image_rgb, calib) -> Future of the FusedDetector
    output dict. The host-side letterbox + scan filter run on the caller's
    thread; only the batched jit runs on the dispatch thread.
    """

    def __init__(self, fused_detector, max_batch: int = 8,
                 max_delay_ms: float = 5.0):
        self.fd = fused_detector
        # point budget / fixed-batch discipline come from the fused
        # detector: an ArtifactFusedDetector carries its export-time values
        super().__init__(detector=fused_detector, max_batch=max_batch,
                         max_delay_ms=max_delay_ms)

    def submit(self, points):  # pragma: no cover - guard
        raise TypeError("BatchingFusedServer needs submit_fused(points, image, calib)")

    def submit_file(self, velodyne_bin):  # pragma: no cover - guard
        raise TypeError(
            "BatchingFusedServer needs submit_fused_file(path, image, calib)"
        )

    def submit_fused_file(self, velodyne_bin: str, image_rgb: np.ndarray,
                          calib) -> Future:
        """Fused request from a .bin scan path — uses the native fused
        read+filter+pad when built (the raw cloud is never materialized)."""
        from sfa3d_tpu import native

        res = native.read_velodyne_filtered(
            velodyne_bin, self._P, cnf.boundary
        )
        if res is None:
            points = np.fromfile(velodyne_bin, dtype=np.float32).reshape(-1, 4)
            return self.submit_fused(points, image_rgb, calib)
        return self._enqueue_fused(res[0], res[1], image_rgb, calib)

    def _warm_bucket(self, bucket: int):
        import jax.numpy as jnp

        P = self._P
        S = self.fd.imgsz
        out = self.fd._run(
            self.fd.kvars, self.fd.yvars,
            jnp.zeros((bucket, P, 4), jnp.float32),
            jnp.zeros((bucket, P), bool),
            jnp.zeros((bucket, S, S, 3), jnp.float32),
            jnp.zeros((bucket, 3, 4), jnp.float32),
            jnp.zeros((bucket, 3, 3), jnp.float32),
            jnp.zeros((bucket, 3, 4), jnp.float32),
            jnp.ones((bucket, 2), jnp.float32),
            jnp.ones((bucket,), jnp.float32),
            jnp.zeros((bucket, 2), jnp.float32),
        )
        np.asarray(out["valid"])

    def submit_fused(self, points: np.ndarray, image_rgb: np.ndarray,
                     calib) -> Future:
        """(N, 4) raw scan + 0-255 RGB image (letterbox normalizes) +
        calibration -> Future of the FusedDetector.detect output dict."""
        from sfa3d_tpu.ops.bev import filter_and_pad_points

        pts, valid = filter_and_pad_points(points, max_points=self._P)
        return self._enqueue_fused(pts, valid, image_rgb, calib)

    def _enqueue_fused(self, pts, valid, image_rgb, calib) -> Future:
        from sfa3d_tpu.models.yolov8 import letterbox

        h, w = image_rgb.shape[:2]
        baked_hw = getattr(self.fd, "img_hw", None)
        if baked_hw is not None and (h, w) != tuple(baked_hw):
            # artifact-backed pipelines bake the letterbox geometry; a
            # mismatched frame would be silently mis-projected
            raise ValueError(
                f"frame is {h}x{w} but the fused artifact bakes img_hw="
                f"{list(baked_hw)}; re-export for this camera"
            )
        img, r, (pad_w, pad_h) = letterbox(image_rgb, self.fd.imgsz)
        req = dict(
            pts=pts, valid=valid, img=img,
            V2C=np.asarray(calib.V2C, np.float32),
            R0=np.asarray(calib.R0, np.float32),
            P2=np.asarray(calib.P2, np.float32),
            hw=np.float32([h, w]), scale=np.float32(r),
            pad=np.float32([pad_w, pad_h]),
        )
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("server stopped")
            self._q.put((req, None, fut))
        return fut

    def _run_batch(self, batch):
        import jax.numpy as jnp

        n = len(batch)
        if self._fixed_bucket is not None:
            bucket = self._fixed_bucket  # pad up: the artifact's only size
        else:
            bucket = min(_next_pow2(n), self.max_batch)
        stack = lambda key: np.stack(
            [b[0][key] for b in batch]
            + [np.zeros_like(batch[0][0][key])] * (bucket - n)
        )
        out = self.fd._run(
            self.fd.kvars, self.fd.yvars,
            jnp.asarray(stack("pts")), jnp.asarray(stack("valid")),
            jnp.asarray(stack("img")), jnp.asarray(stack("V2C")),
            jnp.asarray(stack("R0")), jnp.asarray(stack("P2")),
            jnp.asarray(stack("hw")),
            jnp.asarray(np.stack([b[0]["scale"] for b in batch]
                                 + [np.float32(1.0)] * (bucket - n))),
            jnp.asarray(stack("pad")),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        for i, (_, _, fut) in enumerate(batch):
            v = out["valid"][i]
            m3 = out["mask_3d"][i]
            fut.set_result({
                "boxes": out["boxes"][i][v].astype(int),
                "scores": out["scores"][i][v],
                "classes": out["classes"][i][v],
                "source": out["source"][i][v],
                "boxes_3d": out["boxes_real"][i][m3],
            })
        self.stats["served"] += n
        self.stats["batches"] += 1
        self.stats["padded"] += bucket - n
