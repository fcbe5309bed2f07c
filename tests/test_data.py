"""Data layer: KITTI reader, augmentation, loader -> train step integration,
all against an on-disk synthetic mini-KITTI fixture."""

import numpy as np
import pytest

import jax

from sfa3d_tpu.config import kitti as cnf
from sfa3d_tpu.data.augment import OneOf, RandomRotation, RandomScaling, default_train_aug
from sfa3d_tpu.data.kitti import KittiDataset, Object3d, parse_labels_camera
from sfa3d_tpu.data.loader import KittiTrainLoader, EpochSampler
from sfa3d_tpu.data.synthetic import synthetic_scene, write_mini_kitti


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    return write_mini_kitti(str(root), n_frames=4)


def test_dataset_reads_and_pads(mini_kitti):
    ds = KittiDataset(mini_kitti, mode="val", hflip_prob=0.0, max_points=131072)
    assert len(ds) == 4
    s = ds[0]
    assert s.points.shape == (131072, 4)
    assert s.valid.sum() > 10000
    assert s.labels.shape == (50, 8)
    assert 1 <= int(s.n_labels) <= 12
    # label roundtrip: camera->velodyne conversion must land inside the range
    lab = s.labels[: int(s.n_labels)]
    assert (lab[:, 1] >= 0).all() and (lab[:, 1] <= 50).all()
    assert (np.abs(lab[:, 2]) <= 25).all()


def test_label_roundtrip_preserves_yaw(mini_kitti):
    """write (velodyne->camera) then read (camera->velodyne) must be identity."""
    ds = KittiDataset(mini_kitti, mode="val", hflip_prob=0.0)
    s = ds[0]
    _, orig = synthetic_scene(seed=0)
    got = s.labels[: int(s.n_labels)]
    # in-range originals only, same order
    m = (
        (orig[:, 1] >= 0) & (orig[:, 1] < 50)
        & (orig[:, 2] >= -25) & (orig[:, 2] < 25)
        & (orig[:, 3] >= -2.73) & (orig[:, 3] < 1.27)
    )
    orig = orig[m]
    assert len(orig) == len(got)
    np.testing.assert_allclose(got[:, 1:7], orig[:, 1:7], atol=0.02)  # 2cm file rounding
    dyaw = np.abs(np.mod(got[:, 7] - orig[:, 7] + np.pi, 2 * np.pi) - np.pi)
    assert dyaw.max() < 0.02


def test_parse_labels_camera_skips_malformed_unknown_rows(tmp_path):
    """Regression: the class gate must run BEFORE float parsing (reference
    kitti_dataset.py:128-131) — a truncated/garbage row whose first token
    is not a known class is skipped, not a ValueError crash."""
    good = "Car 0.00 0 1.5 100 100 200 160 1.5 1.6 3.9 1.0 1.5 20.0 0.5"
    f = tmp_path / "000000.txt"
    f.write_text("\n".join([
        good,
        "garbage_header",               # stray non-numeric row
        "1.0 2.0 3.0",                  # truncated numeric row, unknown type
        "Tram 0.00 0 1.5 1 1 2 2 1 1 1 1 1 10 0",  # known-but-ignored class
        "",                             # blank line
    ]) + "\n")
    rows, levels, has = parse_labels_camera(str(f))
    assert has and rows.shape == (1, 8) and rows[0, 0] == 1  # just the Car


def test_object3d_difficulty():
    line = "Car 0.10 0 1.5 100 100 200 160 1.5 1.6 3.9 1.0 1.5 20.0 0.5"
    o = Object3d(line)
    assert o.cls_id == 1
    assert o.level == 1  # height 61 >= 40, trunc .1 <= .15, occ 0
    assert o.to_kitti_format().startswith("Car 0.10 0 1.50")


def test_augmentations_consistent(rng):
    points, labels = synthetic_scene(seed=3, n_objects=4)
    aug = OneOf([RandomRotation(np.pi / 4, p=1.0), RandomScaling((0.95, 1.05), p=1.0)], p=1.0)
    g = np.random.default_rng(0)
    p2, b2 = aug(points, labels[:, 1:].copy(), g)
    assert p2.shape == points.shape
    assert b2.shape == labels[:, 1:].shape
    # rigid/scale transforms preserve box heights within tolerance
    np.testing.assert_allclose(b2[:, 3] / labels[:, 4], b2[0, 3] / labels[0, 4], rtol=0.2)


def test_sampler_epoch_shuffling():
    s = EpochSampler(10, shuffle=True, seed=1)
    s.set_epoch(0)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert sorted(e0) == list(range(10))
    assert e0 != e1
    # process sharding covers all indices disjointly
    a = EpochSampler(10, shuffle=False, process_index=0, process_count=2)
    b = EpochSampler(10, shuffle=False, process_index=1, process_count=2)
    assert sorted(list(a) + list(b)) == list(range(10))


def test_loader_feeds_train_step(mini_kitti):
    from sfa3d_tpu.config.train import OptimConfig
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.parallel import create_train_state, make_train_step
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.runtime.schedules import create_optimizer

    ds = KittiDataset(mini_kitti, mode="train",
                      lidar_aug=default_train_aug(), hflip_prob=0.5,
                      max_points=32768)
    loader = KittiTrainLoader(ds, batch_size=1, subdivisions=2)
    assert len(loader) == 2
    batch = next(iter(loader))
    assert batch["bev"].shape == (2, 1, 608, 608, 3)
    assert batch["targets"]["hm_cen"].shape == (2, 1, 152, 152, 3)
    assert float(batch["targets"]["obj_mask"].sum()) > 0

    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(608, 608))
    tx = create_optimizer(OptimConfig(), 2, 1)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx)
    state, stats = step(state, batch)
    assert np.isfinite(float(stats["total_loss"]))
    assert float(stats["hm_cen_loss"]) > 0


def test_hflip_consistency(mini_kitti):
    """hflip: BEV mirrored AND targets mirrored together."""
    from sfa3d_tpu.data.loader import prepare_train_batch

    ds = KittiDataset(mini_kitti, mode="val", hflip_prob=0.0)
    s = ds[0]
    args = (
        s.points[None], s.valid[None], s.labels[None],
        np.asarray([s.n_labels], np.int32),
    )
    bev_n, tg_n = prepare_train_batch(*args, np.asarray([False]))
    bev_f, tg_f = prepare_train_batch(*args, np.asarray([True]))
    np.testing.assert_allclose(
        np.asarray(bev_f)[0], np.asarray(bev_n)[0, :, ::-1, :], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tg_f["hm_cen"])[0].sum(), np.asarray(tg_n["hm_cen"])[0].sum(), rtol=0.05
    )
    # flipped heatmap is (approximately) the W-mirror of the unflipped one:
    # centers flip as W - x - 1
    nz_n = np.argwhere(np.asarray(tg_n["hm_cen"])[0].max(-1) > 0.999)
    nz_f = np.argwhere(np.asarray(tg_f["hm_cen"])[0].max(-1) > 0.999)
    assert len(nz_n) == len(nz_f)
    # the flip happens on the FLOAT center before int truncation
    # (kitti_dataset.py:196-199), so the mirrored peak may land one pixel
    # left of the naive integer mirror
    for y, x in nz_n:
        mirror = 152 - x - 1
        assert any(
            yf == y and xf in (mirror, mirror - 1) for yf, xf in nz_f
        ), (y, x, nz_f)


def test_synthetic_objects_are_yaw_identifiable():
    """Synthetic boxes must NOT be pi-symmetric: a box whose point cloud
    looks identical under yaw -> yaw+pi gives contradictory direction
    targets across the dataset and the trained direction head collapses to
    random yaw (round-3 generalization run). The generator breaks the
    symmetry with front-biased intensity."""
    from sfa3d_tpu.data.synthetic import synthetic_scene

    pts, labels = synthetic_scene(seed=11)
    checked = 0
    for cls, x, y, z, h, w, l, neg_yaw in labels:
        yaw = -neg_yaw
        c, s = np.cos(yaw), np.sin(yaw)
        rel = pts[:, :2] - [x, y]
        lx = c * rel[:, 0] + s * rel[:, 1]   # local x (front +)
        ly = -s * rel[:, 0] + c * rel[:, 1]
        inside = (np.abs(lx) <= l / 2 + 1e-3) & (np.abs(ly) <= w / 2 + 1e-3) \
            & (pts[:, 2] >= z - 1e-3) & (pts[:, 2] <= z + h + 1e-3)
        if inside.sum() < 100:
            continue
        front = pts[inside & (lx > 0), 3]
        back = pts[inside & (lx < 0), 3]
        if len(front) < 20 or len(back) < 20:
            continue
        assert front.mean() - back.mean() > 0.15, (
            f"object at ({x:.1f},{y:.1f}) front/back intensity not separable"
        )
        checked += 1
    assert checked >= 5, f"only {checked} objects checked"


def test_annotate_labels_camera_oracle():
    """Hand-constructed scene with known projective geometry: a near
    centered car must come out Easy (big bbox, no truncation/occlusion), a
    car directly behind it fully covered -> occlusion 2, and a car
    straddling the image edge -> truncated. Bbox heights must match the
    pinhole prediction fx * h / depth."""
    from sfa3d_tpu.config import kitti as cnf
    from sfa3d_tpu.data.synthetic import annotate_labels_camera

    P2 = np.asarray(cnf.P2[:3], np.float64).reshape(3, 4)
    fx = P2[0, 0]
    h_car = 1.52
    # velodyne rows [cls, x, y, z_bottom, h, w, l, yaw]; yaw 0
    labels = np.array(
        [
            [1, 10.0, 0.0, -1.73, h_car, 1.63, 3.88, 0.0],   # A: near, centered
            [1, 30.0, 0.0, -1.73, h_car, 1.63, 3.88, 0.0],   # B: dead behind A
            [1, 10.0, -9.0, -1.73, h_car, 1.63, 3.88, 0.0],  # C: at right edge
        ],
        np.float32,
    )
    anns = annotate_labels_camera(labels, P2)

    a, b, c = anns
    # A: fully visible, nothing nearer -> Easy by every rule
    assert a["truncation"] < 0.01 and a["occlusion"] == 0
    ha = a["bbox"][3] - a["bbox"][1]
    # pinhole bounds: the box spans depths z +- l/2 (~7.8..11.7 m), so the
    # bbox height lies between fx*h/z_far (all-far) and fx*(h+eps)/z_near
    # where eps absorbs the near-bottom/far-top skew (<= cam-height h_cam
    # spread: 1.73 * l/ (z^2) * fx ~ 11 px)
    assert fx * h_car / 11.7 < ha < fx * h_car / 7.8 + 12
    assert ha >= 40  # Easy 2D-height rule territory at 10 m
    # B: its image footprint lies inside A's (same bearing, 3x depth,
    # nearer box is 3x larger) -> fully covered -> occlusion 2
    assert b["occlusion"] == 2 and b["truncation"] < 0.01
    hb = b["bbox"][3] - b["bbox"][1]
    assert hb < ha / 2.5  # ~3x farther -> ~3x smaller
    # C: y=-9 m at 10 m depth projects ~ fx*9/10 = 648 px right of center
    # (cx=608): the box straddles the right edge -> truncated, not occluded
    assert c["truncation"] > 0.15 and c["occlusion"] == 0
    assert c["bbox"][2] >= 1241.0  # clipped at the image boundary

    # the written KITTI rows then bucket non-trivially via Object3d
    def level(ann, row):
        from sfa3d_tpu.geometry.transforms import lidar_to_camera_box
        cam = np.asarray(lidar_to_camera_box(row[None, 1:8]))[0]
        x, y, z, h, w, l, ry = cam
        x1, y1, x2, y2 = ann["bbox"]
        line = (f"Car {ann['truncation']:.2f} {ann['occlusion']} "
                f"{ann['alpha']:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}")
        return Object3d(line).level

    assert level(a, labels[0]) == 1          # Easy
    assert level(b, labels[1]) == 3          # occ 2 -> Hard (height ~36 ok)
    assert level(c, labels[2]) >= 2          # truncated -> not Easy


def test_mini_kitti_difficulty_nondegenerate(tmp_path):
    """The on-disk fixture must exercise ALL the difficulty plumbing: the
    written truncation/occlusion/bbox fields parse back into a non-constant
    Easy/Moderate/Hard level distribution (round-3 verdict: every recorded
    eval had Easy == Moderate == Hard because the fixture wrote constant
    annotation fields)."""
    from sfa3d_tpu.data.kitti import read_label

    root = write_mini_kitti(str(tmp_path / "k"), n_frames=6, cameras=False,
                            range_falloff=20.0)
    levels = []
    heights = []
    for i in range(6):
        for o in read_label(f"{root}/training/label_2/{i:06d}.txt"):
            levels.append(o.level)
            heights.append(o.box2d[3] - o.box2d[1])
    levels = np.asarray(levels)
    assert len(levels) >= 60
    # Easy present AND at least two harder/unknown levels present
    assert (levels == 1).sum() >= 5, levels
    assert len(set(levels.tolist())) >= 3, set(levels.tolist())
    # bbox heights vary with range (not the old constant 50-px stub)
    assert np.std(heights) > 10.0
