"""YOLOv8 training step: device-resident data, scan-per-epoch, dp-mesh aware.

The reference treats YOLOv8 as a pretrained black box
(/root/reference/test3.py:470-472); this is the training half the framework
adds so the camera branch can be produced, not just consumed.

TPU-native structure (differs from a torch loop on purpose):
- The WHOLE split lives on device as uint8 (data/yolo2d.py); a training
  epoch is ONE `lax.scan` over per-step batch indices — batches gather, cast
  and augment on device, so the tunneled host never ships images per step
  (H2D here is ~30 MB/s; a 640x192 batch-16 feed would cost ~200 ms/step).
- Augmentation (hflip) happens inside the scan from a jax PRNG key: flip the
  letterboxed canvas and mirror the boxes about the canvas width.
- With a mesh, the per-step batch axis shards over 'data' and state stays
  replicated — the same dp pattern as parallel/train_step.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from sfa3d_tpu.losses.yolo_loss import yolo_loss
from sfa3d_tpu.parallel.mesh import DATA_AXIS
from sfa3d_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    ema_decay_at,
)

__all__ = [
    "create_train_state",
    "make_yolo_epoch_fn",
    "make_yolo_eval_fn",
    "TrainState",
]


def _flip_batch(imgs, boxes, flip):
    """Mirror (B, H, W, 3) images and xyxy boxes about the canvas width for
    samples where flip is True. Continuous-coordinate mirror: x -> W - x
    (boxes live in continuous letterboxed pixels, so no half-cell shift —
    the array reversal maps pixel centers i+0.5 -> W-i-0.5 consistently)."""
    W = imgs.shape[2]
    f_imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1], imgs)
    mirrored = jnp.stack(
        [W - boxes[..., 2], boxes[..., 1], W - boxes[..., 0], boxes[..., 3]],
        axis=-1,
    )
    f_boxes = jnp.where(flip[:, None, None], mirrored, boxes)
    return f_imgs, f_boxes


def make_yolo_epoch_fn(
    model,
    tx: optax.GradientTransformation,
    imgsz,
    ema_decay: float = 0.0,
    ema_tau: float = 2000.0,
    hflip_prob: float = 0.5,
    mesh=None,
) -> Callable:
    """-> jitted epoch_fn(state, data, idx, rng) -> (state, metrics).

    data: dict with device-resident arrays
      images (N, h, w, 3) uint8, boxes (N, G, 4) f32 letterboxed xyxy,
      labels (N, G) i32, mask (N, G) bool  (data/yolo2d.py layout)
    idx: (S, B) int32 — S optimizer steps of batch-B frame indices
    rng: PRNG key for the epoch's augmentation draws
    metrics: epoch means of total/box/cls/dfl loss + num_fg.
    """

    def loss_fn(params, batch_stats, imgs, boxes, labels, mask):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, train=True, mutable=["batch_stats"],
        )
        losses = yolo_loss(outs, boxes, labels, mask, imgsz=imgsz)
        return losses["total"], (losses, mutated["batch_stats"])

    def epoch_fn(state: TrainState, data, idx, rng):
        keys = jax.random.split(rng, idx.shape[0])

        def body(state, xs):
            ix, key = xs
            imgs = data["images"][ix].astype(jnp.float32) / 255.0
            boxes, labels, mask = data["boxes"][ix], data["labels"][ix], data["mask"][ix]
            flip = jax.random.bernoulli(key, hflip_prob, (ix.shape[0],))
            imgs, boxes = _flip_batch(imgs, boxes, flip)

            (_, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, imgs, boxes, labels, mask)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if ema_decay > 0.0:
                if new_ema is None:
                    raise ValueError(
                        "ema_decay > 0 requires create_train_state(..., ema=True)")
                d = ema_decay_at(state.step + 1, ema_decay, ema_tau)
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                    new_ema, new_params,
                )
            state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt, ema_params=new_ema,
            )
            return state, losses

        state, losses = jax.lax.scan(body, state, (idx, keys))
        return state, jax.tree_util.tree_map(jnp.mean, losses)

    if mesh is None:
        return jax.jit(epoch_fn, donate_argnums=0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    idx_sharding = NamedSharding(mesh, P(None, DATA_AXIS))  # (S, B): shard B
    return jax.jit(
        epoch_fn,
        in_shardings=(repl, repl, idx_sharding, repl),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def make_yolo_eval_fn(
    model,
    conf_thresh: float = 0.001,
    iou_thresh: float = 0.45,
    max_det: int = 100,
    pre_nms: int = 512,
) -> Callable:
    """-> jitted eval_fn(variables, images_u8 (B, h, w, 3)) ->
    (boxes (B, max_det, 4), scores, classes, valid) after per-image
    class-offset NMS. conf_thresh defaults low (0.001): AP needs the full
    PR curve, not a deployment gate."""
    from sfa3d_tpu.models.yolov8 import decode_predictions, select_detections

    def eval_fn(variables, images_u8):
        imgs = images_u8.astype(jnp.float32) / 255.0
        outs = model.apply(variables, imgs, train=False)
        boxes, scores = decode_predictions(outs)
        return jax.vmap(
            lambda b, s: select_detections(
                b, s, conf_thresh=conf_thresh, iou_thresh=iou_thresh,
                max_det=max_det, pre_nms=pre_nms,
            )
        )(boxes, scores)

    return jax.jit(eval_fn)
