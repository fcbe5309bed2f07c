"""3D multi-object tracker (sfa3d_tpu/tracking/) — beyond-reference.

Synthetic linear-motion scenes: identities must stay stable across frames,
velocities must converge to the true motion, unmatched tracks must die
after max_age misses, pi-flipped yaw readings must not drag the track's
heading, and a whole sequence must run as ONE lax.scan program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfa3d_tpu.tracking import init_tracks, track_sequence, tracker_step

K = 16  # detection slots per frame


def make_frame(objs):
    """objs: list of (x, y, z, h, w, l, yaw, cls, score) tuples ->
    (boxes (K, 8), scores (K,), valid (K,))."""
    boxes = np.zeros((K, 8), np.float32)
    scores = np.zeros((K,), np.float32)
    valid = np.zeros((K,), bool)
    for i, (x, y, z, h, w, l, yaw, cls, score) in enumerate(objs):
        boxes[i] = [cls, x, y, z, h, w, l, yaw]
        scores[i] = score
        valid[i] = True
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


def linear_scene(n_frames, speed=(1.0, 0.2), start=(10.0, 0.0), noise=0.0,
                 seed=0, drop_frames=(), yaw=0.3, cls=0):
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(n_frames):
        if f in drop_frames:
            frames.append(make_frame([]))
            continue
        x = start[0] + speed[0] * f + rng.normal(0, noise)
        y = start[1] + speed[1] * f + rng.normal(0, noise)
        frames.append(
            make_frame([(x, y, -1.0, 1.6, 1.8, 4.2, yaw, cls, 0.9)])
        )
    return frames


def run(frames, **kw):
    state = init_tracks(32)
    outs = []
    for b, s, v in frames:
        state, out = tracker_step(state, b, s, v, **kw)
        outs.append({k: np.asarray(o) for k, o in out.items()})
    return state, outs


def test_single_track_stable_identity_and_velocity():
    frames = linear_scene(12)
    state, outs = run(frames)
    ids = [o["ids"][o["alive"]] for o in outs]
    assert all(len(i) == 1 for i in ids)
    assert all(int(i[0]) == 0 for i in ids), "one object -> one stable id"
    # constant-velocity KF must converge to the true (1.0, 0.2) m/frame
    vel = outs[-1]["velocities"][outs[-1]["alive"]][0]
    np.testing.assert_allclose(vel[:2], [1.0, 0.2], atol=0.05)
    # smoothed box tracks the true trajectory
    box = outs[-1]["boxes"][outs[-1]["alive"]][0]
    np.testing.assert_allclose(box[1], 10.0 + 11.0, atol=0.2)


def test_confirmation_after_min_hits():
    frames = linear_scene(4)
    _, outs = run(frames, min_hits=3)
    confirmed = [int(o["confirmed"].sum()) for o in outs]
    assert confirmed == [0, 0, 1, 1], "confirm only after 3 matches"


def test_death_after_max_age_misses():
    # object present 5 frames, then gone for good
    frames = linear_scene(10, drop_frames=range(5, 10))
    _, outs = run(frames, max_age=3)
    alive = [int(o["alive"].sum()) for o in outs]
    # survives 2 coasting frames (misses 1, 2), dies when misses hits 3
    assert alive == [1] * 7 + [0] * 3


def test_track_survives_short_occlusion_same_id():
    frames = linear_scene(9, drop_frames=(4,))
    _, outs = run(frames, max_age=3)
    ids = [o["ids"][o["alive"]] for o in outs]
    assert all(len(i) == 1 and int(i[0]) == 0 for i in ids), (
        "one dropped frame must coast, not re-identify"
    )


def test_two_objects_no_identity_swap():
    # two cars converging then passing — greedy IoU on predicted boxes
    # must keep them apart (they never overlap)
    frames = []
    for f in range(10):
        frames.append(make_frame([
            (5.0 + 1.0 * f, -6.0, -1.0, 1.6, 1.8, 4.2, 0.0, 0, 0.9),
            (25.0 - 1.0 * f, 6.0, -1.0, 1.6, 1.8, 4.2, 0.0, 0, 0.8),
        ]))
    _, outs = run(frames)
    last = outs[-1]
    a = last["alive"]
    assert int(a.sum()) == 2
    by_id = {int(i): b for i, b in zip(last["ids"][a], last["boxes"][a])}
    np.testing.assert_allclose(by_id[0][1], 14.0, atol=0.3)  # started at 5
    np.testing.assert_allclose(by_id[1][1], 16.0, atol=0.3)  # started at 25


def test_class_gating_blocks_cross_class_match():
    # same spot, class flips -> the tracker must NOT update the class-0
    # track with a class-1 detection; it births a new track instead
    f0 = make_frame([(10.0, 0.0, -1.0, 1.6, 1.8, 4.2, 0.0, 0, 0.9)])
    f1 = make_frame([(10.0, 0.0, -1.0, 1.6, 1.8, 4.2, 0.0, 1, 0.9)])
    state = init_tracks(32)
    state, _ = tracker_step(state, *f0)
    state, out = tracker_step(state, *f1)
    alive = np.asarray(out["alive"])
    ids = np.asarray(out["ids"])[alive]
    assert set(ids.tolist()) == {0, 1}, "cross-class match must be a birth"


def test_orientation_correction_pi_flip():
    # detector alternates the reported facing by pi (BEV-symmetric box);
    # the track's yaw must stay near the true 0.3, never near pi
    frames = []
    for f in range(8):
        yaw = 0.3 if f % 2 == 0 else 0.3 - np.pi
        frames.append(
            make_frame([(10.0 + f, 0.0, -1.0, 1.6, 1.8, 4.2, yaw, 0, 0.9)])
        )
    _, outs = run(frames)
    for o in outs:
        trk_yaw = o["boxes"][o["alive"]][0][7]
        d = abs((trk_yaw - 0.3 + np.pi) % (2 * np.pi) - np.pi)
        d = min(d, abs(np.pi - d))  # pi-symmetric distance
        assert d < 0.2, f"yaw dragged to {trk_yaw}"


def test_birth_capacity_drops_extras_without_error():
    objs = [
        (5.0 + 6.0 * i, -20.0 + 5.0 * i, -1.0, 1.6, 1.8, 4.2, 0.0, 0, 0.9)
        for i in range(6)
    ]
    b, s, v = make_frame(objs)
    state = init_tracks(4)  # fewer slots than detections
    state, out = tracker_step(state, b, s, v)
    assert int(np.asarray(out["alive"]).sum()) == 4
    assert int(state.next_id) == 4, "only placed births consume ids"


def test_track_sequence_one_scan_matches_step_loop():
    frames = linear_scene(8, noise=0.05)
    boxes = jnp.stack([f[0] for f in frames])
    scores = jnp.stack([f[1] for f in frames])
    valid = jnp.stack([f[2] for f in frames])
    outs_scan = jax.jit(
        lambda b, s, v: track_sequence(b, s, v, max_tracks=32)
    )(boxes, scores, valid)
    _, outs_loop = run(frames)
    for f in range(8):
        np.testing.assert_allclose(
            np.asarray(outs_scan["boxes"][f]), outs_loop[f]["boxes"],
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(outs_scan["ids"][f]), outs_loop[f]["ids"]
        )


def test_empty_frames_are_a_noop():
    state = init_tracks(8)
    b, s, v = make_frame([])
    for _ in range(3):
        state, out = tracker_step(state, b, s, v)
    assert int(np.asarray(out["alive"]).sum()) == 0
    assert int(state.next_id) == 0


def test_moving_scene_gt_detections_keep_identities():
    """Integration with the moving-scene fixture generator
    (data/synthetic.moving_scene_sequence): the SAME physical objects move
    with constant velocities across frames; feeding their ground-truth
    boxes as detections must yield one stable track id per object for the
    whole sequence, with no swaps and no spurious births after frame 0.
    Label rows are already in the tracker's (cls,x,y,z,h,w,l,yaw) layout
    (detections_to_real convention)."""
    from sfa3d_tpu.data.synthetic import moving_scene_sequence

    F, n_obj = 10, 6
    frames = moving_scene_sequence(F, seed=11, n_objects=n_obj,
                                   points_per_object=8, n_ground=8,
                                   n_clutter=8)
    boxes = np.zeros((F, K, 8), np.float32)
    scores = np.zeros((F, K), np.float32)
    valid = np.zeros((F, K), bool)
    for f, (_pts, labels, gt_ids) in enumerate(frames):
        assert list(gt_ids) == list(range(n_obj))  # row index == object id
        # shuffle rows per frame so identity can't come from slot order
        perm = np.random.default_rng(f).permutation(n_obj)
        boxes[f, :n_obj] = labels[perm]
        scores[f, :n_obj] = 0.9
        valid[f, :n_obj] = True
        frames[f] = (perm,)  # remember for id bookkeeping
    outs = jax.jit(
        lambda b, s, v: track_sequence(b, s, v, max_tracks=32, min_hits=1)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))

    # map emitted track ids back to ground-truth object ids per frame:
    # match each alive track box to the closest GT center that frame
    id_by_obj = [set() for _ in range(n_obj)]
    for f in range(F):
        alive = np.asarray(outs["alive"][f])
        tb = np.asarray(outs["boxes"][f])[alive]
        tid = np.asarray(outs["ids"][f])[alive]
        assert alive.sum() == n_obj, f"frame {f}: {alive.sum()} tracks"
        (perm,) = frames[f]
        gt = boxes[f, :n_obj]  # rows are labels[perm]
        for b, i in zip(tb, tid):
            d = np.linalg.norm(gt[:, 1:3] - b[1:3], axis=1)
            obj = int(perm[int(np.argmin(d))])
            assert d.min() < 1.0, f"frame {f}: track {i} far from any GT"
            id_by_obj[obj].add(int(i))
    for obj, ids in enumerate(id_by_obj):
        assert len(ids) == 1, f"object {obj} changed track id: {ids}"
    assert len({next(iter(s)) for s in id_by_obj}) == n_obj  # no merges


# ---------------------------------------------------------------------------
# CLEAR-MOT / IDF1 metrics (tracking/metrics.py)
# ---------------------------------------------------------------------------

def _f(ids, xys):
    return (np.asarray(ids, np.int64),
            np.asarray(xys, np.float64).reshape(len(ids), 2))


def test_clear_mot_perfect_tracking():
    from sfa3d_tpu.tracking.metrics import clear_mot
    gt = [_f([0, 1], [(0, 0), (10, 0)]), _f([0, 1], [(1, 0), (11, 0)])]
    m = clear_mot(gt, gt)
    assert m["mota"] == 1.0 and m["idf1"] == 1.0
    assert m["id_switches"] == 0 and m["motp"] == 0.0
    assert m["mostly_tracked"] == 2 and m["mostly_lost"] == 0


def test_clear_mot_counts_fp_fn_and_rates():
    from sfa3d_tpu.tracking.metrics import clear_mot
    gt = [_f([0], [(0, 0)]), _f([0], [(1, 0)]), _f([0], [(2, 0)])]
    pred = [
        _f([7], [(0.1, 0)]),            # match
        _f([], []),                      # miss -> FN
        _f([7, 8], [(2.1, 0), (50, 0)]),  # match + far FP
    ]
    m = clear_mot(gt, pred)
    assert m["misses"] == 1 and m["false_positives"] == 1
    assert m["id_switches"] == 0
    assert m["mota"] == pytest.approx(1.0 - 2 / 3)


def test_clear_mot_id_switch_detected():
    from sfa3d_tpu.tracking.metrics import clear_mot
    gt = [_f([0], [(0, 0)])] * 4
    pred = [_f([1], [(0, 0)])] * 2 + [_f([2], [(0, 0)])] * 2
    m = clear_mot(gt, pred)
    assert m["id_switches"] == 1
    assert m["mota"] == pytest.approx(1.0 - 1 / 4)
    # identity metrics: best global map covers only 2 of 4 frames
    assert m["idf1"] == pytest.approx(2 * 2 / (4 + 4))


def test_clear_mot_sticky_match_beats_closer_thief():
    """A GT keeps its existing track while within the gate even if another
    track is momentarily closer — the CLEAR rule that keeps jitter from
    manufacturing ID switches."""
    from sfa3d_tpu.tracking.metrics import clear_mot
    gt = [_f([0], [(0, 0)]), _f([0], [(0, 0)])]
    pred = [
        _f([1], [(0.5, 0)]),
        _f([1, 2], [(0.6, 0), (0.1, 0)]),  # 2 is closer, 1 still gated
    ]
    m = clear_mot(gt, pred)
    assert m["id_switches"] == 0
    assert m["false_positives"] == 1  # track 2 goes unmatched


def test_clear_mot_crossing_objects_no_idsw_for_consistent_tracker():
    from sfa3d_tpu.tracking.metrics import clear_mot
    # two objects swap positions over 5 frames; tracker keeps identities
    gt, pred = [], []
    for t in range(5):
        a, b = (float(t), 0.0), (4.0 - t, 0.0)
        gt.append(_f([0, 1], [a, b]))
        pred.append(_f([10, 11], [a, b]))
    m = clear_mot(gt, pred)
    assert m["id_switches"] == 0 and m["mota"] == 1.0 and m["idf1"] == 1.0


def test_clear_mot_rejects_length_mismatch():
    from sfa3d_tpu.tracking.metrics import clear_mot
    with pytest.raises(ValueError):
        clear_mot([_f([], [])], [])


def test_tracker_on_moving_scene_scores_perfect_mot_on_gt_detections():
    """End-to-end: moving fixture -> tracker -> CLEAR-MOT. GT boxes as
    detections must produce MOTA 1.0 / IDF1 1.0 / zero switches once
    tracks are confirmed (min_hits=1)."""
    from sfa3d_tpu.data.synthetic import moving_scene_sequence
    from sfa3d_tpu.tracking.metrics import clear_mot, tracker_output_to_frames

    F, n_obj = 8, 5
    frames = moving_scene_sequence(F, seed=3, n_objects=n_obj,
                                   points_per_object=8, n_ground=8,
                                   n_clutter=8)
    boxes = np.zeros((F, K, 8), np.float32)
    scores = np.zeros((F, K), np.float32)
    valid = np.zeros((F, K), bool)
    gt = []
    for f, (_pts, labels, gt_ids) in enumerate(frames):
        boxes[f, :n_obj] = labels
        scores[f, :n_obj] = 0.9
        valid[f, :n_obj] = True
        gt.append((gt_ids, labels[:, 1:3]))
    outs = track_sequence(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(valid), max_tracks=32, min_hits=1)
    pred = tracker_output_to_frames({k: np.asarray(v) for k, v in outs.items()})
    m = clear_mot(gt, pred)
    assert m["mota"] == 1.0, m
    assert m["idf1"] == 1.0 and m["id_switches"] == 0
    assert m["mostly_tracked"] == n_obj


def test_tracker_output_to_frames_class_filter():
    from sfa3d_tpu.tracking.metrics import tracker_output_to_frames
    outs = {
        "alive": np.array([[True, True, False]]),
        "ids": np.array([[4, 5, 6]]),
        "boxes": np.array([[[0, 1, 2, 0, 1, 1, 1, 0],
                            [1, 3, 4, 0, 1, 1, 1, 0],
                            [1, 9, 9, 0, 1, 1, 1, 0]]], np.float32),
    }
    (ids, xy), = tracker_output_to_frames(outs, cls=1)
    assert list(ids) == [5] and xy.tolist() == [[3.0, 4.0]]


def test_tracking_check_script_oracle_mode(tmp_path):
    """scripts/tracking_check.py plumbing: oracle mode must run the full
    sequence->tracker->CLEAR-MOT loop and write the artifact with a
    passing Car IDF1 (GT+noise detections are near-perfect input)."""
    import json

    from scripts.tracking_check import main as check_main

    out = str(tmp_path / "TRACKING_CHECK.json")
    check_main(["--oracle", "--n_seqs", "1", "--n_frames", "6",
                "--n_objects", "4", "--out", out])
    rec = json.load(open(out))
    assert rec["mode"] == "oracle(gt+noise)"
    assert rec["summary"]["overall"]["n_gt"] == 24
    assert rec["summary"]["car"]["idf1"] is None or \
        rec["summary"]["car"]["idf1"] >= 0.5
