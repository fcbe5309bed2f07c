"""Serving throughput on the local chip: concurrent clients against the
dynamic batcher vs sequential single-frame calls.

  python scripts/serving_bench.py [--clients 8] [--per_client 16]
                                  [--max_batch 16] [--max_delay_ms 3]
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--per_client", type=int, default=16)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_delay_ms", type=float, default=3.0)
    args = ap.parse_args()

    from sfa3d_tpu.data.synthetic import synthetic_scene
    from sfa3d_tpu.detector import Detector
    from sfa3d_tpu.runtime.serving import BatchingDetectorServer

    det = Detector(peak_thresh=0.2)
    scans = [synthetic_scene(seed=s)[0] for s in range(args.clients)]

    # sequential baseline (batch-1 jit), warmed
    det.detect(scans[0])
    t0 = time.perf_counter()
    for _ in range(4):
        det.detect(scans[0])
    seq_fps = 4 / (time.perf_counter() - t0)

    server = BatchingDetectorServer(
        det, max_batch=args.max_batch, max_delay_ms=args.max_delay_ms
    )
    server.warmup()  # compile every power-of-2 bucket before traffic

    base_batches = server.stats["batches"]
    results = []

    def client(i):
        for _ in range(args.per_client):
            results.append(server.submit(scans[i]).result(timeout=600))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    n = args.clients * args.per_client
    batches = server.stats["batches"] - base_batches
    server.stop()

    print(json.dumps({
        "metric": "serving throughput, dynamic batching vs sequential",
        "concurrent_clients": args.clients,
        "served_frames_per_sec": round(n / dt, 1),
        "sequential_frames_per_sec": round(seq_fps, 1),
        "speedup": round(n / dt / seq_fps, 2),
        "avg_batch_size": round(n / max(batches, 1), 2),
        "max_batch": args.max_batch,
        "max_delay_ms": args.max_delay_ms,
    }))


if __name__ == "__main__":
    main()
