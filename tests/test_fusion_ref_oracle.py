"""Fusion parity against the REFERENCE'S OWN functions (not re-derived
oracles): test5.fuse_overlapping_detections, test6.bayesian_inspired_
fuse_overlapping_detections and apply_nms_to_fused_detections run directly
from the reference tree (ultralytics stubbed — those scripts only bind the
YOLO name at import time) and must agree with fuse_weighted / fuse_bayesian
/ hard_nms on random detection sets."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from tests import ref_loader
from sfa3d_tpu.fusion.fuse import DetectionSet, fuse_bayesian, fuse_weighted
from sfa3d_tpu.fusion.nms import hard_nms


@pytest.fixture(scope="module")
def ref_mods():
    if not ref_loader.available():
        pytest.skip("reference tree absent")
    # the reference fusion scripts import `from ultralytics import YOLO` at
    # module level but only INSTANTIATE it in their mains — a stub module
    # satisfies the import without shipping ultralytics
    if "ultralytics" not in sys.modules:
        stub = types.ModuleType("ultralytics")
        stub.YOLO = object
        sys.modules["ultralytics"] = stub
    if "easydict" not in sys.modules:
        # not installed in this environment; the scripts only use it inside
        # their config parsers, which these tests never call
        class _EasyDict(dict):
            __getattr__ = dict.__getitem__
            __setattr__ = dict.__setitem__

        ed = types.ModuleType("easydict")
        ed.EasyDict = _EasyDict
        sys.modules["easydict"] = ed
    t5 = ref_loader.load("test5")
    t6 = ref_loader.load("test6")
    return t5, t6


def _random_sets(rng, ny=7, ns=6, overlap=4):
    """Random yolo/sfa xywh int boxes with some forced overlaps."""
    yb = rng.integers(0, 500, (ny, 4)).astype(np.float32)
    yb[:, 2:] = rng.integers(20, 120, (ny, 2))
    sb = rng.integers(0, 500, (ns, 4)).astype(np.float32)
    sb[:, 2:] = rng.integers(20, 120, (ns, 2))
    for i in range(min(overlap, ny, ns)):
        sb[i] = yb[i] + rng.integers(-6, 6, 4)  # near-duplicates -> high IoU
        sb[i, 2:] = np.maximum(sb[i, 2:], 10)
    ys = rng.uniform(0.3, 1.0, ny).astype(np.float32)
    ss = rng.uniform(0.3, 1.0, ns).astype(np.float32)
    yc = rng.integers(0, 3, ny)
    sc = rng.integers(0, 3, ns)
    return yb, ys, yc, sb, ss, sc


def _ref_dicts(boxes, confs, classes):
    return [
        {
            "box": [int(v) for v in b],
            "confidence": float(c),
            "class_id": int(k),
            "class_name": str(int(k)),
            "model": "x",
            "color": (0, 0, 0),
        }
        for b, c, k in zip(boxes, confs, classes)
    ]


def _ours_valid(fused, source):
    v = np.asarray(fused.valid)
    return np.concatenate(
        [
            np.asarray(fused.boxes)[v],
            np.asarray(fused.scores)[v][:, None],
            np.asarray(fused.classes)[v][:, None].astype(np.float32),
        ],
        axis=1,
    )


def _ref_rows(dets):
    return np.asarray(
        [[*d["box"], d["confidence"], d["class_id"]] for d in dets], np.float32
    )


def _sorted(rows):
    return rows[np.lexsort(tuple(rows[:, i] for i in reversed(range(rows.shape[1]))))]


def _assert_fused_match(got, want):
    """Fused int box coords may differ by exactly 1 when the f32 device
    computation and the reference's f64 Python land on opposite sides of an
    integer truncation boundary; confidences/classes must match exactly."""
    got, want = _sorted(got), _sorted(want)
    box_diff = np.abs(got[:, :4] - want[:, :4])
    assert box_diff.max() <= 1.0, box_diff.max()
    assert box_diff.mean() < 0.05, "systematic box divergence, not boundary noise"
    np.testing.assert_allclose(got[:, 4:], want[:, 4:], atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thresh", [0.3, 0.7])
def test_weighted_fusion_matches_reference_code(ref_mods, seed, thresh):
    t5, _ = ref_mods
    rng = np.random.default_rng(seed)
    yb, ys, yc, sb, ss, sc = _random_sets(rng)

    ref = t5.fuse_overlapping_detections(
        _ref_dicts(yb, ys, yc), _ref_dicts(sb, ss, sc), thresh
    )
    fused, source = fuse_weighted(
        DetectionSet(jnp.asarray(yb), jnp.asarray(ys), jnp.asarray(yc), jnp.ones(len(yb), bool)),
        DetectionSet(jnp.asarray(sb), jnp.asarray(ss), jnp.asarray(sc), jnp.ones(len(sb), bool)),
        thresh,
    )
    got = _ours_valid(fused, source)
    want = _ref_rows(ref)
    assert got.shape == want.shape
    _assert_fused_match(got, want)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thresh", [0.3, 0.7])
def test_bayesian_fusion_matches_reference_code(ref_mods, seed, thresh):
    _, t6 = ref_mods
    rng = np.random.default_rng(100 + seed)
    yb, ys, yc, sb, ss, sc = _random_sets(rng)

    ref = t6.bayesian_inspired_fuse_overlapping_detections(
        _ref_dicts(yb, ys, yc), _ref_dicts(sb, ss, sc), thresh
    )
    fused, source = fuse_bayesian(
        DetectionSet(jnp.asarray(yb), jnp.asarray(ys), jnp.asarray(yc), jnp.ones(len(yb), bool)),
        DetectionSet(jnp.asarray(sb), jnp.asarray(ss), jnp.asarray(sc), jnp.ones(len(sb), bool)),
        thresh,
    )
    got = _ours_valid(fused, source)
    want = _ref_rows(ref)
    assert got.shape == want.shape
    _assert_fused_match(got, want)


@pytest.mark.parametrize("seed", [0, 5])
def test_hard_nms_matches_reference_code(ref_mods, seed):
    t5, _ = ref_mods
    rng = np.random.default_rng(200 + seed)
    yb, ys, yc, _, _, _ = _random_sets(rng, ny=10, ns=1, overlap=0)
    # force duplicate clusters so NMS has work to do
    yb[5:8] = yb[0] + rng.integers(-4, 4, (3, 4))

    ref_kept = t5.apply_nms_to_fused_detections(_ref_dicts(yb, ys, yc), 0.5)
    keep = np.asarray(
        hard_nms(jnp.asarray(yb), jnp.asarray(ys), jnp.ones(len(yb), bool), 0.5)
    )
    got = np.concatenate([yb[keep], ys[keep][:, None]], axis=1)
    want = np.asarray([[*d["box"], d["confidence"]] for d in ref_kept], np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(_sorted(got), _sorted(want), atol=1e-5)
