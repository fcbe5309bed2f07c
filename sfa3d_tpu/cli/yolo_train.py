"""Train the JAX YOLOv8 camera detector on KITTI-layout 2D boxes.

The reference's camera branch is a *trained* yolov8n.pt consumed as a black
box (/root/reference/test3.py:470-472) with no way to produce one; this CLI
is the missing training path. The produced checkpoint is saved in the
ultralytics .pt layout (models/yolov8.py export_ultralytics_state_dict), so
`--yolo_weights best.pt` feeds every existing fusion/slam/export CLI through
the unchanged importer — and every save/load round-trips the importer
against a real artifact.

TPU-native training shape: the whole split uploads once (uint8), an epoch is one
jitted lax.scan (parallel/yolo_step.py), eval decodes + NMSes on device and
scores 2D mAP on host (eval/map2d.py).

    python -m sfa3d_tpu.cli yolo-train --dataset_dir <kitti_root> \
        --epochs 200 --imgsz 192x640 --val_frac 0.2
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_imgsz(s: str):
    """'640' -> 640 (square), '192x640' -> (192, 640)."""
    if "x" in s:
        h, w = s.lower().split("x")
        return (int(h), int(w))
    return int(s)


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="sfa3d_tpu YOLOv8 2D training (the path the reference's "
                    "pretrained yolov8n.pt implies but never ships)")
    p.add_argument("--dataset_dir", type=str, required=True,
                   help="KITTI layout root (training/{image_2,label_2})")
    p.add_argument("--imgsz", type=str, default="192x640",
                   help="'HxW' or square int, stride-32 multiples; KITTI "
                        "frames fit (192, 640) with ~no padding")
    p.add_argument("--scale", type=str, default="n",
                   choices=["n", "s", "m", "l", "x"])
    p.add_argument("--num_classes", type=int, default=3,
                   help="3 = KITTI ids (0=Ped 1=Car 2=Cyc, config/kitti.py)")
    p.add_argument("--max_boxes", type=int, default=32)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--warmup_epochs", type=float, default=3.0)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--ema_tau", type=float, default=500.0,
                   help="EMA ramp steps; scale to ~1/6 of the run "
                        "(docs/TECHNICAL.md EMA tau guidance)")
    p.add_argument("--hflip_prob", type=float, default=0.5)
    p.add_argument("--val_frac", type=float, default=0.2,
                   help="tail fraction of sample ids held out for eval "
                        "(ignored when --val_dataset_dir is given)")
    p.add_argument("--val_dataset_dir", type=str, default=None,
                   help="separate KITTI root for the held-out eval split")
    p.add_argument("--eval_every", type=int, default=20)
    p.add_argument("--eval_batch", type=int, default=8)
    p.add_argument("--eval_conf", type=float, default=0.001)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoints_dir", type=str,
                   default="./checkpoints/yolo")
    p.add_argument("--out", type=str, default=None,
                   help="write the training report JSON here")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force a jax platform (tests use cpu)")
    p.add_argument("--compilation_cache", type=str, default=None)
    return p.parse_args(argv)


def _evaluate(eval_fn, variables, val, batch, n_classes, conf_floor=0.0):
    """Run the jitted eval over the val arrays (padded to a batch multiple)
    and score 2D mAP. Returns the metrics dict."""
    import numpy as np

    from sfa3d_tpu.eval.map2d import evaluate_map2d

    n = val["images"].shape[0]
    dets = []
    for i0 in range(0, n, batch):
        sl = slice(i0, i0 + batch)
        imgs = val["images"][sl]
        pad = batch - imgs.shape[0]
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
        b, s, c, v = (np.asarray(x) for x in eval_fn(variables, imgs))
        for j in range(min(batch, n - i0)):
            keep = v[j] & (s[j] > conf_floor)
            dets.append({"boxes": b[j][keep], "scores": s[j][keep],
                         "classes": c[j][keep]})
    gts = [{"boxes": val["boxes"][i][val["mask"][i]],
            "classes": val["labels"][i][val["mask"][i]]}
           for i in range(n)]
    return evaluate_map2d(dets, gts, num_classes=n_classes)


def main(argv=None):
    args = parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compilation_cache:
        jax.config.update("jax_compilation_cache_dir", args.compilation_cache)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from sfa3d_tpu.data.yolo2d import as_hw, load_yolo2d_split
    from sfa3d_tpu.models.yolov8 import (
        YOLOv8,
        save_ultralytics_checkpoint,
    )
    from sfa3d_tpu.parallel.yolo_step import (
        create_train_state,
        make_yolo_epoch_fn,
        make_yolo_eval_fn,
    )

    hw = as_hw(parse_imgsz(args.imgsz))
    os.makedirs(args.checkpoints_dir, exist_ok=True)

    # --- data: load once, upload once --------------------------------------
    lab_dir = os.path.join(args.dataset_dir, "training", "label_2")
    all_ids = sorted(int(f.split(".")[0]) for f in os.listdir(lab_dir)
                     if f.endswith(".txt"))
    if args.val_dataset_dir:
        train_ids, val_root, val_ids = all_ids, args.val_dataset_dir, None
    else:
        n_val = max(1, int(round(len(all_ids) * args.val_frac)))
        train_ids, val_ids = all_ids[:-n_val], all_ids[-n_val:]
        val_root = args.dataset_dir
    train = load_yolo2d_split(args.dataset_dir, imgsz=hw,
                              max_boxes=args.max_boxes, sample_ids=train_ids)
    val = load_yolo2d_split(val_root, imgsz=hw, max_boxes=args.max_boxes,
                            sample_ids=val_ids)
    n_train = train["images"].shape[0]
    print(f"train {n_train} frames / val {val['images'].shape[0]} frames "
          f"@ {hw[0]}x{hw[1]}", flush=True)

    data = {k: jnp.asarray(v) for k, v in train.items() if k != "ids"}
    val_images_dev = jnp.asarray(val["images"])

    # --- model / optimizer --------------------------------------------------
    model = YOLOv8(scale=args.scale, num_classes=args.num_classes)
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, hw[0], hw[1], 3), jnp.float32), train=True)

    steps_per_epoch = max(1, n_train // args.batch_size)
    total_steps = steps_per_epoch * args.epochs
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr,
        warmup_steps=max(1, int(args.warmup_epochs * steps_per_epoch)),
        decay_steps=total_steps, end_value=args.lr * 0.01)
    tx = optax.adamw(
        sched, weight_decay=args.weight_decay,
        # decay conv kernels only — BN scales/biases and conv biases stay
        # undecayed (the standard detector recipe)
        mask=jax.tree_util.tree_map(lambda p: p.ndim > 1,
                                    variables["params"]))
    state = create_train_state(model, variables, tx,
                               ema=args.ema_decay > 0)
    epoch_fn = make_yolo_epoch_fn(
        model, tx, hw, ema_decay=args.ema_decay, ema_tau=args.ema_tau,
        hflip_prob=args.hflip_prob)
    eval_fn = make_yolo_eval_fn(model, conf_thresh=args.eval_conf)

    # --- loop ----------------------------------------------------------------
    host_rng = np.random.default_rng(args.seed)
    history, best = [], {"mAP50": -1.0, "epoch": -1}
    t_start = time.time()
    for epoch in range(1, args.epochs + 1):
        perm = host_rng.permutation(n_train)
        if n_train < args.batch_size:
            perm = np.tile(perm, (args.batch_size // n_train) + 1)
        idx = perm[: steps_per_epoch * args.batch_size].reshape(
            steps_per_epoch, args.batch_size).astype(np.int32)
        key = jax.random.PRNGKey(args.seed * 100003 + epoch)
        state, metrics = epoch_fn(state, data, jnp.asarray(idx), key)

        if epoch % args.eval_every == 0 or epoch == args.epochs:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            ev_params = (state.ema_params if state.ema_params is not None
                         else state.params)
            ev = _evaluate(
                eval_fn,
                {"params": ev_params, "batch_stats": state.batch_stats},
                {**val, "images": val_images_dev}, args.eval_batch,
                args.num_classes)
            row = {"epoch": epoch, "loss": m, **{k: round(v, 4)
                   for k, v in ev.items() if not np.isnan(v)}}
            history.append(row)
            print(json.dumps(row), flush=True)
            if ev["mAP50"] > best["mAP50"]:
                best = {"mAP50": ev["mAP50"], "epoch": epoch,
                        "mAP50_95": ev["mAP50_95"]}
                save_ultralytics_checkpoint(
                    {"params": jax.device_get(ev_params),
                     "batch_stats": jax.device_get(state.batch_stats)},
                    os.path.join(args.checkpoints_dir, "best.pt"),
                    scale=args.scale, num_classes=args.num_classes)

    ev_params = (state.ema_params if state.ema_params is not None
                 else state.params)
    save_ultralytics_checkpoint(
        {"params": jax.device_get(ev_params),
         "batch_stats": jax.device_get(state.batch_stats)},
        os.path.join(args.checkpoints_dir, "last.pt"),
        scale=args.scale, num_classes=args.num_classes)

    report = {
        "imgsz": list(hw), "scale": args.scale,
        "num_classes": args.num_classes,
        "train_frames": n_train, "val_frames": int(val["images"].shape[0]),
        "epochs": args.epochs, "batch_size": args.batch_size,
        "lr": args.lr, "ema_decay": args.ema_decay, "ema_tau": args.ema_tau,
        "seed": args.seed,
        "wall_seconds": round(time.time() - t_start, 1),
        "history": history, "best": best,
        "checkpoints_dir": os.path.abspath(args.checkpoints_dir),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    print(f"best mAP50 {best['mAP50']:.4f} @ epoch {best['epoch']} "
          f"-> {args.checkpoints_dir}/best.pt", flush=True)
    return report


if __name__ == "__main__":
    main()
