"""End-to-end training throughput INCLUDING the input pipeline.

bench.py --train measures the device step alone on a fixed synthetic batch;
this script drives the real path — mini-KITTI on disk -> native read+filter
-> async loader (threaded workers + device-side BEV/target prep) -> sharded
train step — and reports steps/sec with the chip and host overlapped, plus
the loader-only rate so input-bound vs compute-bound is obvious.

  python scripts/train_pipeline_bench.py [--frames 128] [--steps 24]
                                         [--num_workers 4] [--batch 16]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--aug", action="store_true", help="enable train augmentation")
    ap.add_argument("--point_format", default="float32",
                    choices=["float32", "uint16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.config.train import OptimConfig
    from sfa3d_tpu.data.augment import default_train_aug
    from sfa3d_tpu.data.kitti import KittiDataset
    from sfa3d_tpu.data.loader import KittiTrainLoader
    from sfa3d_tpu.data.synthetic import write_mini_kitti
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.parallel import (
        create_train_state, make_mesh, make_train_step, replicate, shard_batch,
    )
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.runtime.schedules import create_optimizer
    from sfa3d_tpu import native

    root = os.path.join(tempfile.gettempdir(), f"pipebench_kitti_{args.frames}")
    if not os.path.isdir(root):
        write_mini_kitti(root, n_frames=args.frames)

    def make_loader():
        ds = KittiDataset(
            root, mode="train",
            lidar_aug=default_train_aug(0.66, np.pi / 4, (0.95, 1.05)) if args.aug else None,
            hflip_prob=0.5, seed=0,
        )
        return KittiTrainLoader(
            ds, batch_size=args.batch, subdivisions=1, seed=0,
            num_workers=args.num_workers, prefetch=2,
            point_format=args.point_format,
        )

    # loader production rate: host read+filter+collate+H2D+dispatch. The
    # device-side prep execution overlaps the train step in real use, and
    # the H2D transfers (the loader's real device-facing cost) are
    # synchronous, so pure iteration time is the honest host-side number —
    # a flush fetch here would measure this platform's tunnel quirks
    # instead (a single post-hoc scalar fetch was measured at 127 s).
    loader = make_loader()
    n_batches = 0
    it = iter(loader)
    next(it)  # compile prepare_train_batch outside the timed window
    t0 = time.perf_counter()
    for batch in it:
        n_batches += 1
        first = batch
    dt_loader = time.perf_counter() - t0
    loader_fps = n_batches * args.batch / dt_loader

    # training loop over the same loader
    mesh = make_mesh(None)
    model = create_model("fpn_resnet_18", dtype=jnp.bfloat16)
    variables = init_detector(model, jax.random.PRNGKey(0))
    tx = create_optimizer(OptimConfig(), num_epochs=300, steps_per_epoch=100)
    state = replicate(mesh, create_train_state(model, variables, tx))
    step = make_train_step(model, tx, mesh)

    state, stats = step(state, shard_batch(mesh, first, axis=1))
    _ = float(stats["total_loss"])  # compile + warm

    from collections import deque

    inflight = deque()
    done = 0
    epoch = 0
    t0 = time.perf_counter()
    while done < args.steps:
        epoch += 1
        loader.set_epoch(epoch)
        for batch in loader:
            state, stats = step(state, shard_batch(mesh, batch, axis=1))
            inflight.append(stats["total_loss"])
            if len(inflight) > 4:
                _ = float(inflight.popleft())
            done += 1
            if done >= args.steps:
                break
    while inflight:
        _ = float(inflight.popleft())
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "KITTI train steps/sec/chip INCLUDING input pipeline "
                  f"(mini-KITTI on disk, batch {args.batch}, "
                  f"num_workers {args.num_workers}, aug {bool(args.aug)})",
        "steps_per_sec": round(args.steps / dt, 3),
        "frames_per_sec": round(args.steps * args.batch / dt, 1),
        "loader_production_frames_per_sec": round(loader_fps, 1),
        "point_format": args.point_format,
        "native_host_path": native.available(),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
