"""Visualization + observability smoke tests (headless)."""

import os

import numpy as np

import jax
import jax.numpy as jnp


def test_draw_pipeline(tmp_path, rng):
    import cv2

    from sfa3d_tpu.viz.draw import (
        bev_map_to_image,
        draw_predictions_bev,
        merge_rgb_to_bev,
        show_rgb_image_with_boxes,
    )
    from sfa3d_tpu.geometry.calibration import KittiCalibration

    bev = rng.uniform(0, 1, (608, 608, 3)).astype(np.float32)
    img = bev_map_to_image(bev)
    assert img.dtype == np.uint8 and img.shape == (608, 608, 3)

    boxes = np.zeros((5, 9), np.float32)
    boxes[:, 0] = rng.integers(0, 3, 5)
    boxes[:, 2] = rng.uniform(100, 500, 5)  # x
    boxes[:, 3] = rng.uniform(100, 500, 5)  # y
    boxes[:, 6] = 20  # w px
    boxes[:, 7] = 40  # l px
    mask = np.ones(5, bool)
    out = draw_predictions_bev(img.copy(), boxes, mask)
    assert (out != img).any()  # something was drawn

    rgb = np.zeros((375, 1242, 3), np.uint8)
    calib = KittiCalibration(None)
    cam_labels = np.array([[1, 2.0, 1.5, 15.0, 1.5, 1.6, 3.9, 0.3]], np.float32)
    rgb2 = show_rgb_image_with_boxes(rgb.copy(), cam_labels, calib)
    assert (rgb2 != rgb).any()

    merged = merge_rgb_to_bev(rgb2, out, output_width=608)
    assert merged.shape[1] == 608


def test_write_credit():
    from sfa3d_tpu.viz.draw import write_credit

    img = np.zeros((300, 700, 3), np.uint8)
    out = write_credit(img, org_author=(10, 100), org_fps=(10, 140), fps=42.5)
    assert out is img and (img != 0).any()
    # without fps only the author line is drawn
    img2 = np.zeros((300, 700, 3), np.uint8)
    write_credit(img2, org_author=(10, 100))
    assert (img2 != 0).any()


def test_kfpn_viz_dumps(tmp_path):
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.viz.kfpn_viz import save_all

    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    _, viz = model.apply(
        variables, jnp.zeros((1, 64, 64, 3)), train=False, capture_features=True
    )
    out = str(tmp_path / "viz")
    save_all(viz, out)
    files = os.listdir(out)
    assert any(f.startswith("backbone_") for f in files)
    assert any(f.startswith("pyramid_") for f in files)
    assert any(f.startswith("attention_") for f in files)
    assert any(f.startswith("fpn_") for f in files)


def test_bev_projection_example(tmp_path):
    from sfa3d_tpu.viz.bev_projection import example_usage_bev_projection

    path = str(tmp_path / "bev.png")
    example_usage_bev_projection(save_path=path)
    assert os.path.isfile(path) and os.path.getsize(path) > 10000


def test_logger_and_meters(tmp_path):
    from sfa3d_tpu.runtime.logger import AverageMeter, Logger, ProgressMeter

    logger = Logger(str(tmp_path), "t")
    logger.info("hello")
    log_file = os.path.join(str(tmp_path), "logger_t.txt")
    assert os.path.isfile(log_file)
    assert "hello" in open(log_file).read()

    m = AverageMeter("Loss", ":.2f")
    m.update(2.0, n=2)
    m.update(4.0, n=2)
    assert m.avg == 3.0
    p = ProgressMeter(100, [m], prefix="Train")
    msg = p.get_message(5)
    assert "Train[" in msg and "Loss" in msg
