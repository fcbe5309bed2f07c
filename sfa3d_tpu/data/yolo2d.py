"""2D camera-detection dataset for training the JAX YOLOv8.

The reference consumes a *trained* yolov8n.pt (/root/reference/test3.py:470)
and ships no way to produce one; this module supplies the data side of the
missing training path: KITTI-layout camera frames (image_2 + label_2 2D
bboxes, the same files the fixture generator writes) -> dense fixed-shape
arrays ready to live device-resident for the whole run.

TPU-native design notes:
- Every frame letterboxes to ONE static (h, w) with stride-32 multiples;
  GT pads to `max_boxes` slots with a validity mask (no ragged batching).
- The loader returns the WHOLE split as stacked uint8/float32 arrays. On
  the tunneled chip H2D is ~30 MB/s, so per-step image feeding would be
  the training bottleneck; instead the trainer uploads the split once and
  gathers batches on device (parallel/yolo_step.py).
- KITTI camera frames are 1242x375 — a square 640 letterbox wastes ~70% of
  pixels on gray padding. The default shape is rectangular (192, 640),
  cutting step FLOPs ~3.3x at the same image resolution.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np

from sfa3d_tpu.data.kitti import read_label

ImgSize = Union[int, Tuple[int, int]]


def as_hw(imgsz: ImgSize) -> Tuple[int, int]:
    """int -> (s, s); (h, w) passes through. Both must be stride-32
    multiples (the P5 feature map must be integral)."""
    hw = (imgsz, imgsz) if isinstance(imgsz, int) else tuple(imgsz)
    if len(hw) != 2 or any(int(s) % 32 for s in hw):
        raise ValueError(f"imgsz must be stride-32 multiples, got {imgsz}")
    return int(hw[0]), int(hw[1])


def letterbox_rect(img: np.ndarray, hw: Tuple[int, int]):
    """Resize-with-aspect + center-pad to (h, w). uint8 in, uint8 out.
    Returns (canvas (h, w, 3), scale, (pad_x, pad_y)) — the same transform
    as models.yolov8.letterbox (ultralytics-style, value 114) generalized
    to rectangular targets."""
    import cv2

    th, tw = hw
    h, w = img.shape[:2]
    r = min(th / h, tw / w)
    nw, nh = round(w * r), round(h * r)
    if (nw, nh) != (w, h):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    pad_x, pad_y = (tw - nw) // 2, (th - nh) // 2
    canvas = np.full((th, tw, 3), 114, np.uint8)
    canvas[pad_y:pad_y + nh, pad_x:pad_x + nw] = img
    return canvas, r, (pad_x, pad_y)


def load_yolo2d_split(
    root: str,
    split: str = "train",
    imgsz: ImgSize = (192, 640),
    max_boxes: int = 32,
    sample_ids: Optional[Sequence[int]] = None,
    min_box_px: float = 2.0,
) -> Dict[str, np.ndarray]:
    """KITTI-layout `root/training/{image_2,label_2}` -> dense arrays:

      images (N, h, w, 3) uint8 letterboxed
      boxes  (N, G, 4) float32 xyxy in letterboxed pixels
      labels (N, G) int32 class ids (config.kitti ids: 0=Ped 1=Car 2=Cyc)
      mask   (N, G) bool valid GT slots
      ids    (N,) int32 sample ids

    Rows with negative class ids (DontCare & friends) and boxes degenerating
    under `min_box_px` after the letterbox scale are dropped. `split` only
    selects the id list when `sample_ids` is None: 'train' takes every frame
    with a label file; pass explicit ids for held-out splits.
    """
    import cv2

    hw = as_hw(imgsz)
    img_dir = os.path.join(root, "training", "image_2")
    lab_dir = os.path.join(root, "training", "label_2")
    if sample_ids is None:
        sample_ids = sorted(
            int(f.split(".")[0]) for f in os.listdir(lab_dir)
            if f.endswith(".txt")
        )
    n = len(sample_ids)
    images = np.zeros((n, hw[0], hw[1], 3), np.uint8)
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    labels = np.zeros((n, max_boxes), np.int32)
    mask = np.zeros((n, max_boxes), bool)
    for i, sid in enumerate(sample_ids):
        img = cv2.imread(os.path.join(img_dir, f"{sid:06d}.png"))
        if img is None:
            raise FileNotFoundError(
                os.path.join(img_dir, f"{sid:06d}.png"))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        canvas, r, (px, py) = letterbox_rect(img, hw)
        images[i] = canvas
        k = 0
        for obj in read_label(os.path.join(lab_dir, f"{sid:06d}.txt")):
            if obj.cls_id < 0 or k >= max_boxes:
                continue
            x1, y1, x2, y2 = obj.box2d * r
            x1, x2 = x1 + px, x2 + px
            y1, y2 = y1 + py, y2 + py
            if (x2 - x1) < min_box_px or (y2 - y1) < min_box_px:
                continue
            boxes[i, k] = (x1, y1, x2, y2)
            labels[i, k] = obj.cls_id
            mask[i, k] = True
            k += 1
    return {
        "images": images,
        "boxes": boxes,
        "labels": labels,
        "mask": mask,
        "ids": np.asarray(list(sample_ids), np.int32),
    }
