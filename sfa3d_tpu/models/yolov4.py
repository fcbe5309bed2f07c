"""YOLOv4 / YOLOv4-tiny via OpenCV's darknet DNN backend (host-side).

Parity with reference yolov4_test.py:5-17 and models/test_spa_yolo.py:35-76:
loads the darknet .cfg/.weights pair with cv2.dnn, runs 416x416 inference,
and returns [x, y, w, h] boxes + confidences + class ids after cv2 NMS.
This path is CPU-only by design (cv2.dnn has no TPU backend) and exists for
capability parity; the TPU-native 2D detector is models/yolov8.py. The
reference repo itself ships only the .cfg files (the .weights blob is
missing there too, .MISSING_LARGE_BLOBS:1), so construction is gated on the
weights file existing.

The darknet network-definition assets the reference ships
(models/yolov4.cfg, models/yolov4-tiny.cfg, models/coco.names) are packaged
under models/assets/ — pure data files that must match the reference
byte-for-byte for cv2.dnn to build the same network.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "assets")
YOLOV4_CFG = os.path.join(ASSETS_DIR, "yolov4.cfg")
YOLOV4_TINY_CFG = os.path.join(ASSETS_DIR, "yolov4-tiny.cfg")
COCO_NAMES_FILE = os.path.join(ASSETS_DIR, "coco.names")


class YOLOv4Detector:
    def __init__(
        self,
        cfg_path: str = YOLOV4_CFG,
        weights_path: str = "yolov4.weights",
        input_size: int = 416,
        conf_threshold: float = 0.5,
        nms_threshold: float = 0.4,
    ):
        import cv2

        if not os.path.isfile(weights_path):
            raise FileNotFoundError(
                f"darknet weights not found: {weights_path} "
                "(download yolov4.weights / yolov4-tiny.weights separately)"
            )
        self.net = cv2.dnn.readNetFromDarknet(cfg_path, weights_path)
        self.net.setPreferableBackend(cv2.dnn.DNN_BACKEND_OPENCV)
        self.net.setPreferableTarget(cv2.dnn.DNN_TARGET_CPU)
        layer_names = self.net.getLayerNames()
        out_idx = self.net.getUnconnectedOutLayers().reshape(-1)
        self.output_layers = [layer_names[i - 1] for i in out_idx]
        self.input_size = input_size
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold

    def __call__(self, image_bgr: np.ndarray) -> Tuple[List, List, List]:
        import cv2

        h, w = image_bgr.shape[:2]
        blob = cv2.dnn.blobFromImage(
            image_bgr, 1 / 255.0, (self.input_size, self.input_size),
            swapRB=True, crop=False,
        )
        self.net.setInput(blob)
        outputs = self.net.forward(self.output_layers)

        boxes, confidences, class_ids = [], [], []
        for out in outputs:
            for det in out:
                scores = det[5:]
                cls = int(np.argmax(scores))
                conf = float(scores[cls])
                if conf > self.conf_threshold:
                    cx, cy, bw, bh = det[0] * w, det[1] * h, det[2] * w, det[3] * h
                    boxes.append([int(cx - bw / 2), int(cy - bh / 2), int(bw), int(bh)])
                    confidences.append(conf)
                    class_ids.append(cls)
        keep = cv2.dnn.NMSBoxes(boxes, confidences, self.conf_threshold, self.nms_threshold)
        keep = np.asarray(keep).reshape(-1)
        return (
            [boxes[i] for i in keep],
            [confidences[i] for i in keep],
            [class_ids[i] for i in keep],
        )

    @staticmethod
    def class_name(cls_id: int) -> str:
        names = _darknet_names()
        return names[cls_id] if 0 <= cls_id < len(names) else str(cls_id)


_NAMES_CACHE: List[str] = []


def _darknet_names() -> List[str]:
    """Class names from the shipped darknet assets/coco.names (the file the
    cfg's class ids are defined against — reference models/coco.names). The
    darknet list differs from the ultralytics spelling for ~8 classes
    ('motorbike' vs 'motorcycle', 'sofa' vs 'couch', ...), so the
    ultralytics COCO_NAMES table must NOT be used on this path."""
    if not _NAMES_CACHE:
        with open(COCO_NAMES_FILE) as f:
            _NAMES_CACHE.extend(ln.strip() for ln in f if ln.strip())
    return _NAMES_CACHE
