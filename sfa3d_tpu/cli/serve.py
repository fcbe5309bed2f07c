"""Serving entry point: line-delimited JSON requests over stdio or TCP,
answered from the dynamically-batched detector server (runtime/serving.py).

Protocol (one JSON object per line):
  request:  {"id": <any>, "lidar": "/path/to/scan.bin"}
        or  {"id": <any>, "points": [[x, y, z, r], ...]}
  response: {"id": <any>, "detections": [{class_name, score, x, y, z, h, w,
             l, yaw, class_id}, ...]}
  error:    {"id": <any>, "error": "..."}

With --fused the server runs the full camera-LiDAR fusion pipeline
(reference test6 flow) and requests carry the camera frame + calibration:
  request:  {"id": <any>, "lidar": "scan.bin", "image": "frame.png",
             "calib": "calib.txt"}   (calib omitted -> dataset-mean)
  response: {"id": <any>, "fused": {"boxes": [[x,y,w,h],...], "scores":
             [...], "classes": [...], "source": [...]},
             "boxes_3d": [[cls,x,y,z,h,w,l,yaw], ...]}

With --track the server keeps per-stream 3D MOT state
(runtime/tracking_service.py): replies gain "stream" + "tracks" (stable
track_id, Kalman-smoothed box, velocity m/frame). Requests may carry
"stream": <key> (default: one stream per connection) and
"track_reset": true on a scene cut; frames of one stream must arrive in
order on one connection.

TCP mode (--port) accepts many concurrent connections; requests from all
clients coalesce into shared device batches. Capability beyond the
reference (it ships no serving layer — SURVEY.md §1).

  python -m sfa3d_tpu.cli serve --pretrained_path ckpt [--port 8471]
                                [--max_batch 8] [--max_delay_ms 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from concurrent.futures import Future


def _parse(argv):
    p = argparse.ArgumentParser("serve")
    p.add_argument("--pretrained_path", default=None,
                   help="torch .pth or Orbax checkpoint dir (random init if absent)")
    p.add_argument("--arch", default="fpn_resnet_18")
    p.add_argument("--K", type=int, default=50)
    p.add_argument("--peak_thresh", type=float, default=0.2)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--port", type=int, default=None,
                   help="TCP port; omit for stdin/stdout mode")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax platform (the axon plugin ignores "
                        "JAX_PLATFORMS; this uses the config flag, which wins)")
    p.add_argument("--compilation_cache", default=None, metavar="DIR",
                   nargs="?", const="",
                   help="persist XLA executables under DIR (default "
                        "~/.cache/sfa3d_tpu/xla_cache) so restarts skip the "
                        "minutes-long cold compile of the 608^2 pipeline")
    p.add_argument("--fused", action="store_true",
                   help="serve the full camera-LiDAR fusion pipeline")
    p.add_argument("--yolo_checkpoint", default=None,
                   help="ultralytics .pt for the fused 2D branch")
    p.add_argument("--warmup", action="store_true",
                   help="compile every batch bucket before accepting traffic")
    p.add_argument("--artifact", default=None, metavar="PATH.sfa3dx",
                   help="serve from an AOT export (cli export) instead of a "
                        "checkpoint: no model rebuild, weights come baked "
                        "into the StableHLO artifact")
    p.add_argument("--track", action="store_true",
                   help="stateful per-stream 3D MOT: replies gain a "
                        "'tracks' list with stable track ids + velocities. "
                        "Requests may set 'stream' (default: one stream per "
                        "connection) and 'track_reset': true on a scene cut. "
                        "Frames of a stream must arrive in order on one "
                        "connection. LiDAR detector mode only.")
    p.add_argument("--track_min_hits", type=int, default=2)
    p.add_argument("--track_max_age", type=int, default=3)
    p.add_argument("--track_iou_min", type=float, default=0.01)
    p.add_argument("--track_coasting", action="store_true",
                   help="also report unconfirmed/coasting tracks")
    return p.parse_args(argv)


def _submit(server, req):
    from sfa3d_tpu.runtime.serving import BatchingFusedServer

    if isinstance(server, BatchingFusedServer):
        return _submit_fused(server, req)
    if "lidar" in req:
        return server.submit_file(req["lidar"])
    import numpy as np

    pts = np.asarray(req["points"], np.float32).reshape(-1, 4)
    return server.submit(pts)


def _submit_fused(server, req):
    import cv2
    import numpy as np

    from sfa3d_tpu.geometry.calibration import KittiCalibration

    img_bgr = cv2.imread(req["image"])
    if img_bgr is None:
        raise FileNotFoundError(f"image not readable: {req['image']}")
    # 0-255 RGB: letterbox (models/yolov8.py:312-328) normalizes itself
    img = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    calib = KittiCalibration(req.get("calib"))
    if "lidar" in req:
        fut = server.submit_fused_file(req["lidar"], img, calib)
    else:
        pts = np.asarray(req["points"], np.float32).reshape(-1, 4)
        fut = server.submit_fused(pts, img, calib)
    # re-shape the resolved dict into the wire format
    wire: Future = Future()

    def relay(f):
        try:
            r = f.result()
            wire.set_result({
                "fused": {
                    "boxes": r["boxes"].tolist(),
                    "scores": np.round(r["scores"], 6).tolist(),
                    "classes": r["classes"].tolist(),
                    "source": r["source"].tolist(),
                },
                "boxes_3d": np.round(r["boxes_3d"], 6).tolist(),
            })
        except BaseException as e:
            wire.set_exception(e)

    fut.add_done_callback(relay)
    return wire


def _handle_stream(server, rfile, wfile, lock=None, sessions=None,
                   conn_name="stdio"):
    """One client. The reader (this function) only parses lines and submits
    — every pending request becomes an in-flight future immediately, so a
    burst from one client fills a device batch. A dedicated writer thread
    resolves futures in request order and streams replies; replies never
    wait for further input (a reader-thread flush would deadlock a client
    that sends N requests and then blocks on the first reply). With
    `sessions` (a TrackingSessions), the writer also advances the request's
    tracker stream — writer order == request order, which is exactly the
    frame-order contract stateful tracking needs. `track_reset` rides the
    queue with its request and is applied by the WRITER, so a scene cut
    lands in request order too (a reader-side reset would fire while
    earlier frames of the stream are still queued, letting a pre-cut
    track_id leak across the cut)."""
    import queue

    out_q: "queue.Queue" = queue.Queue()

    def writer():
        while True:
            item = out_q.get()
            if item is None:
                return
            _reply(wfile, *item, lock=lock, sessions=sessions)

    t = threading.Thread(target=writer, daemon=True, name="serve-writer")
    t.start()
    try:
        for line in rfile:
            line = line.strip()
            if not line:
                continue
            rid, stream, reset = None, None, False
            try:
                req = json.loads(line)
                rid = req.get("id")
                stream = str(req.get("stream", conn_name))
                reset = bool(req.get("track_reset"))
                out_q.put((rid, _submit(server, req), stream, reset))
            except Exception as e:
                out_q.put((rid, e, stream, reset))
    finally:
        out_q.put(None)
        t.join()


def _reply(wfile, rid, fut_or_err, stream=None, reset=False, lock=None,
           sessions=None):
    from concurrent.futures import CancelledError

    # the scene cut applies HERE, in request order, even when the request
    # itself errors — the client declared frame history invalid either way
    if sessions is not None and reset and stream is not None:
        sessions.reset(stream)
    if isinstance(fut_or_err, Exception):
        msg = {"id": rid, "error": str(fut_or_err)}
    else:
        try:
            res = fut_or_err.result()
            # fused results arrive pre-shaped for the wire ({"fused": ...});
            # the LiDAR-only path returns the detection list
            msg = {"id": rid, **res} if isinstance(res, dict) else {
                "id": rid, "detections": res
            }
            if sessions is not None and not isinstance(res, dict):
                msg["stream"] = stream
                msg["tracks"] = sessions.update(stream, res)
        except CancelledError:
            # server.stop() cancels still-queued requests; CancelledError is a
            # BaseException (py>=3.8), so a bare `except Exception` would kill
            # the writer thread and silently drop every later reply
            msg = {"id": rid, "error": "cancelled"}
        except Exception as e:
            msg = {"id": rid, "error": str(e)}
    data = json.dumps(msg) + "\n"
    if lock:
        with lock:
            wfile.write(data)
            wfile.flush()
    else:
        wfile.write(data)
        wfile.flush()


def main(argv=None):
    args = _parse(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.compilation_cache is not None:
        from sfa3d_tpu.runtime.export import enable_compilation_cache

        used = enable_compilation_cache(args.compilation_cache or None)
        print(f"persistent XLA compilation cache: {used}", file=sys.stderr)

    from sfa3d_tpu.detector import Detector, FusedDetector
    from sfa3d_tpu.runtime.serving import (
        BatchingDetectorServer,
        BatchingFusedServer,
    )

    if args.artifact:
        # the artifact bakes in model/K/peak_thresh; flags that would pick
        # them are dead here — warn so operators aren't misled
        ignored = [(f, v) for f, v in [
            ("--pretrained_path", args.pretrained_path),
            ("--arch", args.arch if args.arch != "fpn_resnet_18" else None),
            ("--K", args.K if args.K != 50 else None),
            ("--peak_thresh",
             args.peak_thresh if args.peak_thresh != 0.2 else None),
            ("--dtype", args.dtype if args.dtype != "float32" else None),
        ] if v is not None]
        for flag, _ in ignored:
            print(
                f"serving: {flag} is IGNORED with --artifact — the value "
                "baked into the artifact manifest applies (re-export to "
                "change it)",
                file=sys.stderr,
            )
        # dispatch on the artifact's kind: a detector artifact backs the
        # LiDAR server, a fused artifact backs the camera-LiDAR server
        # (requests then carry image+calib); --fused just cross-checks
        from sfa3d_tpu.runtime.export import read_manifest

        kind = read_manifest(args.artifact).get("kind")
        if kind == "fused":
            from sfa3d_tpu.detector import ArtifactFusedDetector

            server = BatchingFusedServer(
                ArtifactFusedDetector(args.artifact),
                max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
            )
        else:
            if args.fused:
                raise SystemExit(
                    f"--fused needs a fused artifact; {args.artifact} is "
                    f"kind={kind!r} (export with `cli export --fused`)"
                )
            from sfa3d_tpu.detector import ArtifactDetector

            det = ArtifactDetector(args.artifact)
            server = BatchingDetectorServer(
                det, max_batch=args.max_batch, max_delay_ms=args.max_delay_ms
            )
    elif args.fused:
        fd = FusedDetector(
            arch=args.arch, checkpoint=args.pretrained_path,
            yolo_checkpoint=args.yolo_checkpoint, K=args.K,
            peak_thresh=args.peak_thresh, dtype=args.dtype,
        )
        server = BatchingFusedServer(
            fd, max_batch=args.max_batch, max_delay_ms=args.max_delay_ms
        )
    else:
        det = Detector(arch=args.arch, checkpoint=args.pretrained_path,
                       K=args.K, peak_thresh=args.peak_thresh, dtype=args.dtype)
        server = BatchingDetectorServer(
            det, max_batch=args.max_batch, max_delay_ms=args.max_delay_ms
        )
    sessions = None
    if args.track:
        if isinstance(server, BatchingFusedServer):
            raise SystemExit(
                "--track supports the LiDAR detector server only "
                "(fused replies carry 2D fusion output, not 3D boxes "
                "in tracker layout)")
        from sfa3d_tpu.runtime.tracking_service import TrackingSessions

        sessions = TrackingSessions(
            # capacity follows the BACKING detector, not --K: with
            # --artifact the flag is ignored (warned above) and the
            # artifact bakes its own K — sizing from args.K would silently
            # truncate tracking input every frame
            K=server.det.K, min_hits=args.track_min_hits,
            max_age=args.track_max_age, iou_min=args.track_iou_min,
            include_coasting=args.track_coasting,
        )

    if args.port is None:
        if args.warmup:
            server.warmup()
        _handle_stream(server, sys.stdin, sys.stdout, sessions=sessions)
        server.stop()
        print(json.dumps({"stats": server.stats}), file=sys.stderr)
        return

    import socket

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind((args.host, args.port))
    sock.listen(64)
    print(f"serving on {args.host}:{sock.getsockname()[1]}", file=sys.stderr, flush=True)
    if args.warmup:
        # bind first so early clients queue in the listen backlog instead of
        # getting connection-refused while the buckets compile
        server.warmup()

    conn_seq = iter(range(1 << 62))

    def client(conn, name):
        with conn:
            rfile = conn.makefile("r")
            wfile = conn.makefile("w")
            lock = threading.Lock()
            try:
                _handle_stream(server, rfile, wfile, lock=lock,
                               sessions=sessions, conn_name=name)
            except (BrokenPipeError, ConnectionResetError):
                pass

    try:
        while True:
            conn, _ = sock.accept()
            threading.Thread(
                target=client, args=(conn, f"conn-{next(conn_seq)}"),
                daemon=True,
            ).start()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
        sock.close()


if __name__ == "__main__":
    main()
