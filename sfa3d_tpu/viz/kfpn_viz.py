"""KFPN introspection dumps.

Parity with the reference's test2.py:166-429 visualization suite: backbone
feature grids, pyramid-level features with per-channel stats, per-head
per-level FPN outputs, and the softmax attention weights of the KFPN fusion
(weights captured via KFPN(..., capture_features=True), the analog of
get_visualization_data, models/fpn_resnet.py:256-263).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _grid(ax_rows, ax_cols, feats, title, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(ax_rows, ax_cols, figsize=(3 * ax_cols, 3 * ax_rows))
    axes = np.atleast_2d(axes)
    for i, ax in enumerate(axes.flat):
        if i < len(feats):
            ax.imshow(feats[i], cmap="viridis")
        ax.axis("off")
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def save_backbone_features(viz: Dict, out_dir: str, max_channels: int = 16):
    """Backbone stage activations as channel grids (test2.py backbone viz)."""
    os.makedirs(out_dir, exist_ok=True)
    for idx, feat in enumerate(viz["backbone"]):
        f = np.asarray(feat[0], np.float32)  # (H, W, C)
        chans = [f[:, :, c] for c in range(min(max_channels, f.shape[-1]))]
        _grid(4, 4, chans, f"backbone layer{idx + 1} {f.shape}",
              os.path.join(out_dir, f"backbone_layer{idx + 1}.png"))


def save_pyramid_features(viz: Dict, out_dir: str, max_channels: int = 16):
    """KFPN pyramid levels + per-channel mean/std stats (test2.py pyramid viz)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    for idx, feat in enumerate(viz["pyramid"]):
        f = np.asarray(feat[0], np.float32)
        chans = [f[:, :, c] for c in range(min(max_channels, f.shape[-1]))]
        _grid(4, 4, chans, f"pyramid level{idx} {f.shape}",
              os.path.join(out_dir, f"pyramid_level{idx}.png"))
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(f.mean(axis=(0, 1)), label="mean")
        ax.plot(f.std(axis=(0, 1)), label="std")
        ax.set_title(f"pyramid level{idx} channel stats")
        ax.legend()
        fig.savefig(os.path.join(out_dir, f"pyramid_level{idx}_stats.png"), dpi=120)
        plt.close(fig)


def save_attention_weights(viz: Dict, out_dir: str):
    """KFPN softmax attention maps + level-distribution bars per head
    (test2.py attention viz)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    for head, weights in viz["kfpn_weights"].items():
        w = np.asarray(weights[0], np.float32)  # (H, W, C, L)
        n_levels = w.shape[-1]
        maps = [w[:, :, 0, l] for l in range(n_levels)]
        _grid(1, n_levels, maps, f"{head} attention per level",
              os.path.join(out_dir, f"attention_{head}.png"))
        fig, ax = plt.subplots(figsize=(4, 3))
        ax.bar(range(n_levels), w.mean(axis=(0, 1, 2)))
        ax.set_xlabel("pyramid level")
        ax.set_ylabel("mean attention")
        ax.set_title(head)
        fig.savefig(os.path.join(out_dir, f"attention_{head}_dist.png"), dpi=120)
        plt.close(fig)


def save_fpn_outputs(viz: Dict, out_dir: str):
    """Per-head, per-level raw FPN outputs (test2.py fpn-output viz)."""
    os.makedirs(out_dir, exist_ok=True)
    for head, levels in viz["fpn_outputs"].items():
        maps = [np.asarray(lvl[0], np.float32)[:, :, 0] for lvl in levels]
        _grid(1, len(maps), maps, f"{head} per-level outputs",
              os.path.join(out_dir, f"fpn_{head}.png"))


def save_all(viz: Dict, out_dir: str):
    save_backbone_features(viz, out_dir)
    save_pyramid_features(viz, out_dir)
    save_attention_weights(viz, out_dir)
    save_fpn_outputs(viz, out_dir)
