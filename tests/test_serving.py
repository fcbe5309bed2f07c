"""Batched serving runtime: correctness, batching behavior, TCP protocol.

The server must return what Detector.detect returns for the same scan
(numerically — batch padding may change XLA fusion order, so exact bit
equality is not asserted), coalesce concurrent requests into shared device
batches, and fail cleanly after stop().
"""

import json
import socket
import subprocess
import sys

import numpy as np
import pytest

from sfa3d_tpu.data.synthetic import synthetic_scene
from sfa3d_tpu.detector import Detector
from sfa3d_tpu.runtime.serving import BatchingDetectorServer


@pytest.fixture(scope="module")
def detector():
    # random weights are fine: the server is compared against the same
    # detector object, not against a truth set
    return Detector(peak_thresh=0.0)


@pytest.fixture(scope="module")
def scans():
    return [synthetic_scene(seed=s)[0] for s in range(5)]


def assert_dets_close(a, b, tol=1e-4):
    assert len(a) == len(b)
    for da, db in zip(a, b):
        assert da["class_id"] == db["class_id"]
        for k in ("score", "x", "y", "z", "h", "w", "l", "yaw"):
            assert abs(da[k] - db[k]) <= tol, (k, da, db)


def test_server_matches_direct_detect_and_batches(detector, scans):
    server = BatchingDetectorServer(detector, max_batch=8, max_delay_ms=500.0)
    try:
        futs = [server.submit(s) for s in scans]
        got = [f.result(timeout=600) for f in futs]
        n_batches = server.stats["batches"]
    finally:
        server.stop()
    assert server.stats["served"] == len(scans)
    # 5 requests submitted inside one delay window share device batches
    assert n_batches <= 2
    for g, s in zip(got, scans):
        assert_dets_close(g, detector.detect(s))


def test_stop_drains_then_rejects(detector, scans):
    server = BatchingDetectorServer(detector, max_batch=8, max_delay_ms=1.0)
    fut = server.submit(scans[0])
    server.stop()
    assert isinstance(fut.result(timeout=600), list)  # drained, not cancelled
    with pytest.raises(RuntimeError):
        server.submit(scans[1])


def test_tcp_server_roundtrip(tmp_path, detector, scans):
    scans[0].astype(np.float32).tofile(tmp_path / "scan.bin")
    proc = subprocess.Popen(
        [sys.executable, "-m", "sfa3d_tpu.cli", "serve", "--port", "0",
         "--peak_thresh", "0.0", "--max_delay_ms", "5", "--platform", "cpu"],
        stderr=subprocess.PIPE, text=True,
    )
    try:
        # stderr carries jax warnings too — scan for the announce line
        port = None
        for line in proc.stderr:
            if line.startswith("serving on "):
                port = int(line.strip().rsplit(":", 1)[1])
                break
        assert port, "server never announced its port"
        # drain further stderr so the server never blocks on a full pipe
        import threading

        threading.Thread(
            target=lambda: [None for _ in proc.stderr], daemon=True
        ).start()
        with socket.create_connection(("127.0.0.1", port), timeout=600) as conn:
            conn.settimeout(600)
            f = conn.makefile("rw")
            f.write(json.dumps({"id": 1, "lidar": str(tmp_path / "scan.bin")}) + "\n")
            f.write(json.dumps({"id": 2, "points": scans[1][:1000].tolist()}) + "\n")
            f.write(json.dumps({"id": 3, "lidar": "/nonexistent.bin"}) + "\n")
            f.flush()
            replies = [json.loads(f.readline()) for _ in range(3)]
        by_id = {r["id"]: r for r in replies}
        assert "detections" in by_id[1]
        assert "detections" in by_id[2]
        assert "error" in by_id[3]
        # server output for the file request == local Detector on the scan
        assert_dets_close(by_id[1]["detections"], detector.detect(scans[0]))
    finally:
        proc.terminate()
        proc.wait(timeout=60)


def test_fused_server_matches_direct_detect(scans):
    """The fused (camera+LiDAR) server output equals FusedDetector.detect
    for the same frames, with requests coalescing into one device batch."""
    from sfa3d_tpu.detector import FusedDetector
    from sfa3d_tpu.geometry.calibration import KittiCalibration
    from sfa3d_tpu.runtime.serving import BatchingFusedServer

    fd = FusedDetector(confidence_threshold=0.0, peak_thresh=0.0)
    calib = KittiCalibration(None)
    rng = np.random.default_rng(7)
    imgs = [rng.uniform(0, 1, (375, 1242, 3)).astype(np.float32) for _ in range(3)]

    server = BatchingFusedServer(fd, max_batch=4, max_delay_ms=500.0)
    try:
        futs = [server.submit_fused(s, im, calib)
                for s, im in zip(scans[:3], imgs)]
        got = [f.result(timeout=900) for f in futs]
        assert server.stats["batches"] == 1  # all three shared one batch
    finally:
        server.stop()

    for g, s, im in zip(got, scans[:3], imgs):
        want = fd.detect(s, im, calib)
        assert len(g["boxes"]) == len(want["boxes"])
        if len(g["boxes"]):
            assert np.abs(g["boxes"] - want["boxes"]).max() <= 1
            np.testing.assert_allclose(g["scores"], want["scores"], atol=1e-4)
            np.testing.assert_array_equal(g["classes"], want["classes"])


def test_serve_cli_artifact_kind_dispatch(tmp_path, monkeypatch, capsys, scans):
    """serve --artifact dispatches on the artifact's manifest kind: a fused
    artifact backs the camera-LiDAR server over the same stdio wire
    protocol (weights + fusion config + geometry all from one file), and a
    detector artifact combined with --fused is an explicit refusal."""
    import io

    import cv2
    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.cli.serve import main as serve_main
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.models.yolov8 import YOLOv8
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.runtime.export import (
        export_detector,
        export_fused,
        save_exported,
    )

    model = create_model("fpn_resnet_18")
    kvars = init_detector(model, jax.random.PRNGKey(0))
    exported, manifest = export_detector(
        model, kvars, K=10, peak_thresh=0.0, max_points=2048, batch=1
    )
    det_path = str(tmp_path / "det.sfa3dx")
    save_exported(det_path, exported, manifest)
    with pytest.raises(SystemExit, match="fused"):
        serve_main(["--artifact", det_path, "--fused"])

    yolo = YOLOv8(scale="n")
    yvars = yolo.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    exported, manifest = export_fused(
        model, kvars, yolo, yvars, batch=1, max_points=2048,
        img_hw=(48, 64), letterbox=64, K=10, max_yolo=10,
    )
    fused_path = str(tmp_path / "fused.sfa3dx")
    save_exported(fused_path, exported, manifest)

    scans[0].astype(np.float32).tofile(tmp_path / "scan.bin")
    cv2.imwrite(
        str(tmp_path / "frame.png"),
        np.random.default_rng(1).integers(0, 255, (48, 64, 3)).astype(np.uint8),
    )
    req = json.dumps({
        "id": "z", "lidar": str(tmp_path / "scan.bin"),
        "image": str(tmp_path / "frame.png"),
    }) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(req))
    serve_main(["--artifact", fused_path])
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    reply = json.loads(out_lines[-1])
    assert reply["id"] == "z" and "fused" in reply and "boxes_3d" in reply
    assert set(reply["fused"]) == {"boxes", "scores", "classes", "source"}


def test_tcp_fused_protocol(tmp_path, scans):
    """cli serve --fused: lidar+image+calib request -> fused wire format."""
    import cv2

    scans[0].astype(np.float32).tofile(tmp_path / "scan.bin")
    rng = np.random.default_rng(1)
    cv2.imwrite(
        str(tmp_path / "frame.png"),
        rng.integers(0, 255, (375, 1242, 3)).astype(np.uint8),
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "sfa3d_tpu.cli", "serve", "--port", "0",
         "--fused", "--peak_thresh", "0.0", "--max_delay_ms", "5",
         "--platform", "cpu"],
        stderr=subprocess.PIPE, text=True,
    )
    try:
        port = None
        for line in proc.stderr:
            if line.startswith("serving on "):
                port = int(line.strip().rsplit(":", 1)[1])
                break
        assert port, "server never announced its port"
        import threading

        threading.Thread(
            target=lambda: [None for _ in proc.stderr], daemon=True
        ).start()
        with socket.create_connection(("127.0.0.1", port), timeout=600) as conn:
            conn.settimeout(600)
            f = conn.makefile("rw")
            f.write(json.dumps({
                "id": "a", "lidar": str(tmp_path / "scan.bin"),
                "image": str(tmp_path / "frame.png"),
            }) + "\n")
            f.write(json.dumps({"id": "b", "lidar": str(tmp_path / "scan.bin"),
                                "image": "/nope.png"}) + "\n")
            f.flush()
            replies = [json.loads(f.readline()) for _ in range(2)]
        by_id = {r["id"]: r for r in replies}
        assert "fused" in by_id["a"] and "boxes_3d" in by_id["a"]
        fused = by_id["a"]["fused"]
        assert set(fused) == {"boxes", "scores", "classes", "source"}
        assert len(fused["boxes"]) == len(fused["scores"])
        assert "error" in by_id["b"] and "nope" in by_id["b"]["error"]

        # wire values must match a local FusedDetector on the SAME files —
        # catches host-prep divergence (e.g. the double /255 image
        # normalization this assertion was added for)
        from sfa3d_tpu.detector import FusedDetector
        from sfa3d_tpu.geometry.calibration import KittiCalibration

        fd = FusedDetector(peak_thresh=0.0)
        img = cv2.cvtColor(cv2.imread(str(tmp_path / "frame.png")),
                           cv2.COLOR_BGR2RGB)
        want = fd.detect(scans[0], img, KittiCalibration(None))
        assert len(fused["boxes"]) == len(want["boxes"])
        if len(want["boxes"]):
            assert np.abs(np.asarray(fused["boxes"]) - want["boxes"]).max() <= 1
            np.testing.assert_allclose(fused["scores"], want["scores"], atol=1e-4)
    finally:
        proc.terminate()
        proc.wait(timeout=60)


# ---------------------------------------------------------------------------
# stateful per-stream tracking (runtime/tracking_service.py, serve --track)
# ---------------------------------------------------------------------------

def _det(x, y, cls=1, score=0.9):
    return {"class_id": cls, "class_name": "Car", "score": score,
            "x": x, "y": y, "z": -1.0, "h": 1.5, "w": 1.6, "l": 3.9,
            "yaw": 0.0}


def test_tracking_sessions_stable_ids_streams_isolated_and_reset():
    from sfa3d_tpu.runtime.tracking_service import TrackingSessions

    s = TrackingSessions(K=8, max_tracks=16, min_hits=1)
    # stream A: one car advancing 0.5 m/frame -> one stable id
    ids_a = []
    for f in range(4):
        tracks = s.update("a", [_det(10.0 + 0.5 * f, 0.0)])
        assert len(tracks) == 1
        ids_a.append(tracks[0]["track_id"])
    assert len(set(ids_a)) == 1
    t = s.update("a", [_det(12.0, 0.0)])[0]
    assert t["class_name"] == "Car" and t["confirmed"]
    assert abs(t["velocity"][0] - 0.5) < 0.3  # converged toward true vx

    # stream B is independent: same geometry, its OWN tracker + id space
    tracks_b = s.update("b", [_det(10.0, 0.0)])
    assert len(tracks_b) == 1
    assert s.n_streams == 2

    # reset drops A's state; the re-born track gets a NEW id
    s.reset("a")
    re = s.update("a", [_det(12.5, 0.0)])
    assert re[0]["track_id"] not in ids_a


def test_tracking_sessions_lru_eviction_bounds_memory():
    from sfa3d_tpu.runtime.tracking_service import TrackingSessions

    s = TrackingSessions(K=4, max_tracks=8, min_hits=1, max_streams=3)
    for i in range(5):
        s.update(f"s{i}", [_det(10.0, 0.0)])
    assert s.n_streams == 3  # s0, s1 evicted


def test_tracking_sessions_evicted_stream_never_reuses_ids():
    """Regression: LRU eviction dropped a stream's id counter, so a
    still-active stream that got evicted and returned re-issued track_id 0
    for a DIFFERENT object within one logical stream. Ids must resume from
    a service-wide floor after eviction — the consumer sees a scene cut,
    never two objects sharing an id."""
    from sfa3d_tpu.runtime.tracking_service import TrackingSessions

    s = TrackingSessions(K=4, max_tracks=8, min_hits=1, max_streams=2)
    first = s.update("cam", [_det(10.0, 0.0)])
    assert [t["track_id"] for t in first] == [0]
    # evict 'cam' (max_streams=2)
    s.update("other1", [_det(10.0, 0.0)])
    s.update("other2", [_det(10.0, 0.0)])
    assert s.n_streams == 2
    # 'cam' returns: fresh state is fine (bounded memory), reused ids are not
    back = s.update("cam", [_det(50.0, 5.0)])
    assert back, "returning stream must track again"
    assert all(t["track_id"] > 0 for t in back), (
        f"track_id reused after eviction: {back}")


def test_track_reset_applies_in_request_order():
    """Regression: a scene cut (track_reset) must land in REQUEST order.
    The reader thread used to apply it at parse time, while tracker
    updates run in the writer thread at reply time — so a reset racing
    ahead of still-queued earlier frames was a no-op on a brand-new
    stream, and the post-cut frame CONTINUED the pre-cut track id across
    the declared cut. Made deterministic with a fake server whose futures
    resolve only after both requests are already queued."""
    import io
    import threading
    import time
    from concurrent.futures import Future

    from sfa3d_tpu.cli.serve import _handle_stream
    from sfa3d_tpu.runtime.tracking_service import TrackingSessions

    sessions = TrackingSessions(K=4, max_tracks=8, min_hits=1)
    futs = []

    class FakeServer:
        def submit(self, pts):
            f = Future()
            futs.append(f)
            return f

    pts = [[0.0, 0.0, 0.0, 0.0]]
    req1 = {"id": 1, "stream": "cam", "points": pts}
    req2 = {"id": 2, "stream": "cam", "points": pts, "track_reset": True}
    rfile = io.StringIO(json.dumps(req1) + "\n" + json.dumps(req2) + "\n")
    wfile = io.StringIO()
    t = threading.Thread(
        target=_handle_stream, args=(FakeServer(), rfile, wfile),
        kwargs=dict(sessions=sessions), daemon=True,
    )
    t.start()
    deadline = time.time() + 30
    while len(futs) < 2 and time.time() < deadline:
        time.sleep(0.01)
    assert len(futs) == 2, "both requests must be in flight before replies"
    # frames resolve AFTER the cut was parsed — writer order must still be
    # update(frame1), reset, update(frame2)
    futs[0].set_result([_det(10.0, 0.0)])
    futs[1].set_result([_det(10.0, 0.0)])
    t.join(timeout=60)
    assert not t.is_alive()

    by_id = {r["id"]: r for r in
             (json.loads(l) for l in wfile.getvalue().splitlines())}
    ids1 = {tr["track_id"] for tr in by_id[1]["tracks"]}
    ids2 = {tr["track_id"] for tr in by_id[2]["tracks"]}
    assert ids1, "frame 1 must birth a track"
    assert ids2, "frame 2 must birth a fresh post-cut track"
    assert not (ids1 & ids2), (
        f"track_id crossed the declared scene cut: {ids1 & ids2}")


def test_tcp_server_track_mode(tmp_path, detector, scans):
    """serve --track over TCP: replies carry stream + tracks; identical
    consecutive frames on one stream keep the same track ids (random-weight
    detections are deterministic per input, so frame 2 == frame 1 and the
    tracker must re-associate every box); a second stream starts its own
    id space and state."""
    scans[0].astype(np.float32).tofile(tmp_path / "scan.bin")
    proc = subprocess.Popen(
        [sys.executable, "-m", "sfa3d_tpu.cli", "serve", "--port", "0",
         "--peak_thresh", "0.0", "--max_delay_ms", "5", "--platform", "cpu",
         "--track", "--track_min_hits", "1"],
        stderr=subprocess.PIPE, text=True,
    )
    try:
        port = None
        for line in proc.stderr:
            if line.startswith("serving on "):
                port = int(line.strip().rsplit(":", 1)[1])
                break
        assert port, "server never announced its port"
        import threading

        threading.Thread(
            target=lambda: [None for _ in proc.stderr], daemon=True
        ).start()
        scan = str(tmp_path / "scan.bin")
        with socket.create_connection(("127.0.0.1", port), timeout=600) as conn:
            conn.settimeout(600)
            f = conn.makefile("rw")
            for rid, stream in [(1, "cam0"), (2, "cam0"), (3, "cam1")]:
                f.write(json.dumps(
                    {"id": rid, "lidar": scan, "stream": stream}) + "\n")
            f.flush()
            replies = [json.loads(f.readline()) for _ in range(3)]
            # scene cut: track_reset births fresh ids on cam0
            f.write(json.dumps({"id": 4, "lidar": scan, "stream": "cam0",
                                "track_reset": True}) + "\n")
            f.flush()
            replies.append(json.loads(f.readline()))
        by_id = {r["id"]: r for r in replies}
        for r in replies:
            assert "tracks" in r and "detections" in r, r.get("error")
        assert by_id[1]["stream"] == "cam0"
        assert by_id[3]["stream"] == "cam1"
        ids1 = {t["track_id"] for t in by_id[1]["tracks"]}
        ids2 = {t["track_id"] for t in by_id[2]["tracks"]}
        assert ids1, "no tracks born from K=50 peak_thresh=0 detections"
        # identical consecutive frames: the well-formed boxes re-associate
        # (random-weight output includes degenerate near-zero-dim boxes
        # whose self-IoU is 0 — those coast+rebirth, so subset, not equal)
        assert ids1 & ids2, "no identity persisted across identical frames"
        # track ids are a PER-STREAM namespace (replies carry 'stream');
        # cam1 has its own tracker and must produce tracks independently
        ids3 = {t["track_id"] for t in by_id[3]["tracks"]}
        assert ids3
        # scene cut: the id counter carries over, so post-reset ids are
        # disjoint from everything cam0 produced before
        ids4 = {t["track_id"] for t in by_id[4]["tracks"]}
        assert ids4 and not (ids4 & (ids1 | ids2)), \
            "track_reset must re-birth fresh ids"
    finally:
        proc.terminate()
        proc.wait(timeout=60)
