"""AOT export (runtime/export.py): serialize -> deserialize -> numerical
identity with the live pipeline, symbolic-batch artifacts, the fused
pipeline export, CLI entry, and the persistent compilation cache hook.

The reference has no deployment/export path at all (every entry script
rebuilds the torch model and re-reads the .pth); this capability is
beyond-parity, so the tests are self-referential: the live jit program is
the oracle.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfa3d_tpu.data.synthetic import synthetic_scene
from sfa3d_tpu.models import create_model
from sfa3d_tpu.ops.bev import filter_and_pad_points
from sfa3d_tpu.pipeline import detect_frames, init_detector
from sfa3d_tpu.runtime.export import (
    enable_compilation_cache,
    export_detector,
    export_fused,
    load_exported,
    save_exported,
)
import sfa3d_tpu.config.kitti as cnf

MAXP = 4096  # small point budget keeps the CPU trace fast


@pytest.fixture(scope="module")
def det():
    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0))
    return model, variables


def _scan_batch(n, seed=0):
    pts, valid = [], []
    for i in range(n):
        scan, _ = synthetic_scene(np.random.default_rng(seed + i))
        p, v = filter_and_pad_points(scan, MAXP, cnf.boundary)
        pts.append(p)
        valid.append(v)
    return np.stack(pts), np.stack(valid)


def test_export_roundtrip_matches_live_pipeline(det, tmp_path):
    model, variables = det
    exported, manifest = export_detector(
        model, variables, K=50, peak_thresh=0.2, max_points=MAXP, batch=2
    )
    path = str(tmp_path / "det.sfa3dx")
    save_exported(path, exported, manifest)

    art = load_exported(path)
    assert art.manifest["kind"] == "detector"
    assert art.manifest["K"] == 50

    pts, valid = _scan_batch(2)
    got = art.call(pts, valid)
    want = detect_frames(model, variables, jnp.asarray(pts),
                         jnp.asarray(valid), K=50, peak_thresh=0.2)
    for k in ("detections", "boxes_real", "mask"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=1e-5,
            err_msg=f"output {k} diverged through serialization",
        )


def test_symbolic_batch_serves_multiple_batch_sizes(det, tmp_path):
    model, variables = det
    exported, manifest = export_detector(
        model, variables, max_points=MAXP, batch=None
    )
    assert manifest["batch"] is None
    path = str(tmp_path / "poly.sfa3dx")
    save_exported(path, exported, manifest)
    art = load_exported(path)
    for b in (1, 3):
        pts, valid = _scan_batch(b, seed=10 * b)
        out = art.call(pts, valid)
        assert np.asarray(out["detections"]).shape == (b, 50, 10)
        assert np.isfinite(np.asarray(out["detections"])).all()


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.bin")
    with open(path, "wb") as f:
        f.write(b"NOTANEXPORT-----")
    with pytest.raises(ValueError, match="not a sfa3d_tpu export"):
        load_exported(path)


def test_fused_export_roundtrip(det, tmp_path):
    from sfa3d_tpu.models.yolov8 import YOLOv8

    model, variables = det
    yolo = YOLOv8(scale="n")
    yvars = yolo.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    exported, manifest = export_fused(
        model, variables, yolo, yvars,
        batch=1, max_points=MAXP, img_hw=(48, 64), letterbox=64,
        K=10, max_yolo=10,
    )
    path = str(tmp_path / "fused.sfa3dx")
    save_exported(path, exported, manifest)
    art = load_exported(path)
    assert art.manifest["kind"] == "fused"

    pts, valid = _scan_batch(1)
    # the artifact contract: letterboxed RGB in [0,1] (what
    # models.yolov8.letterbox produces) — NOT raw 0..255 frames
    assert "[0,1]" in art.manifest["images"]
    images = np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    V2C = np.tile(np.eye(3, 4, dtype=np.float32), (1, 1, 1))
    R0 = np.tile(np.eye(3, dtype=np.float32), (1, 1, 1))
    P2 = np.tile(np.eye(3, 4, dtype=np.float32) * 100.0, (1, 1, 1))
    out = art.call(pts, valid, images, V2C, R0, P2)
    assert np.asarray(out["scores"]).shape == (1, 20)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_cli_export_fused_entry_bakes_geometry(tmp_path):
    """export CLI --fused with --img_hw/--letterbox: the camera geometry
    lands in the manifest (what cli fuse --artifact validates against)."""
    from sfa3d_tpu.cli.export import main as export_main

    out = str(tmp_path / "fused_cli.sfa3dx")
    manifest = export_main([
        "--fused", "--batch", "1", "--letterbox", "64",
        "--img_hw", "48", "64", "-o", out,
    ])
    assert manifest["kind"] == "fused"
    assert manifest["letterbox"] == 64
    assert manifest["img_hw"] == [48, 64]
    assert os.path.getsize(out) > 1_000_000
    art = load_exported(out)
    assert art.manifest["letterbox_pad"] == manifest["letterbox_pad"]


def test_cli_export_entry(tmp_path):
    from sfa3d_tpu.cli.export import main as export_main

    out = str(tmp_path / "cli.sfa3dx")
    manifest = export_main([
        "--batch", "1", "--K", "10", "-o", out,
    ])
    assert manifest["kind"] == "detector"
    assert os.path.getsize(out) > 1_000_000  # weights are baked in
    art = load_exported(out)
    pts, valid = _scan_batch(1)
    # CLI export uses the production MAX_POINTS budget; repad to it
    full = np.zeros((1, art.manifest["max_points"], 4), np.float32)
    fullv = np.zeros((1, art.manifest["max_points"]), bool)
    full[:, :MAXP] = pts
    fullv[:, :MAXP] = valid
    outd = art.call(full, fullv)
    assert np.asarray(outd["detections"]).shape == (1, 10, 10)


def test_artifact_backs_batching_server(det, tmp_path):
    """End-to-end deployment story: export -> ArtifactDetector ->
    BatchingDetectorServer. Served results must match the artifact called
    directly to 1e-4: a symbolic-batch Exported re-compiles per concrete
    bucket size, and batch padding may change XLA fusion order, so bit
    equality is not guaranteed (same caveat as tests/test_serving.py)."""
    from sfa3d_tpu.detector import ArtifactDetector
    from sfa3d_tpu.runtime.serving import BatchingDetectorServer

    model, variables = det
    exported, manifest = export_detector(
        model, variables, max_points=MAXP, batch=None, peak_thresh=0.0
    )
    path = str(tmp_path / "serve.sfa3dx")
    save_exported(path, exported, manifest)

    ad = ArtifactDetector(path)
    assert ad.max_points == MAXP and ad.fixed_batch is None
    server = BatchingDetectorServer(ad, max_batch=4, max_delay_ms=2.0)
    try:
        scans = [synthetic_scene(np.random.default_rng(40 + i))[0]
                 for i in range(4)]
        futs = [server.submit(s) for s in scans]
        got = [f.result(timeout=600) for f in futs]
    finally:
        server.stop()

    for scan, dets in zip(scans, got):
        want = ad.detect(scan)
        assert len(dets) == len(want)
        for da, db in zip(dets, want):
            assert da["class_id"] == db["class_id"]
            for k in ("score", "x", "y", "z", "h", "w", "l", "yaw"):
                assert abs(da[k] - db[k]) <= 1e-4, (k, da, db)
    assert any(len(d) for d in got), "peak_thresh=0 should yield detections"


def test_fixed_batch_artifact_served_by_padding(det, tmp_path):
    """A fixed-batch artifact has exactly one runnable batch size: the
    server must clamp max_batch to it, warm only that bucket, and pad
    every partial batch up to it (2 requests through a batch-4 artifact)."""
    from sfa3d_tpu.detector import ArtifactDetector
    from sfa3d_tpu.runtime.serving import BatchingDetectorServer

    model, variables = det
    exported, manifest = export_detector(
        model, variables, max_points=MAXP, batch=4, peak_thresh=0.0
    )
    path = str(tmp_path / "fixed4.sfa3dx")
    save_exported(path, exported, manifest)

    ad = ArtifactDetector(path)
    server = BatchingDetectorServer(ad, max_batch=8, max_delay_ms=2.0)
    try:
        assert server.max_batch == 4  # clamped to the artifact's size
        server.warmup()  # must not raise (warms only bucket 4)
        futs = [server.submit(synthetic_scene(np.random.default_rng(60 + i))[0])
                for i in range(2)]
        got = [f.result(timeout=600) for f in futs]
    finally:
        server.stop()
    assert len(got) == 2 and all(isinstance(d, list) for d in got)
    assert server.stats["padded"] >= 2  # partial batches padded up to 4


def test_artifact_detector_rejects_fused_kind(det, tmp_path):
    from sfa3d_tpu.models.yolov8 import YOLOv8
    from sfa3d_tpu.detector import ArtifactDetector

    model, variables = det
    yolo = YOLOv8(scale="n")
    yvars = yolo.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    exported, manifest = export_fused(
        model, variables, yolo, yvars,
        batch=1, max_points=MAXP, img_hw=(48, 64), letterbox=64,
        K=10, max_yolo=10,
    )
    path = str(tmp_path / "fused2.sfa3dx")
    save_exported(path, exported, manifest)
    with pytest.raises(ValueError, match="kind"):
        ArtifactDetector(path)


def test_artifact_fused_serving(tmp_path, det):
    """The fused pipeline served from ONE artifact file: an
    ArtifactFusedDetector behind BatchingFusedServer — weights, fusion
    config, and camera geometry all baked; also exercises the fixed-batch
    pad-up path and the baked-geometry frame validation."""
    from sfa3d_tpu.detector import ArtifactFusedDetector
    from sfa3d_tpu.geometry.calibration import KittiCalibration
    from sfa3d_tpu.models.yolov8 import YOLOv8
    from sfa3d_tpu.runtime.serving import BatchingFusedServer

    model, variables = det
    yolo = YOLOv8(scale="n")
    yvars = yolo.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    exported, manifest = export_fused(
        model, variables, yolo, yvars,
        batch=1, max_points=MAXP, img_hw=(48, 64), letterbox=64,
        K=10, max_yolo=10,
    )
    path = str(tmp_path / "served.sfa3dx")
    save_exported(path, exported, manifest)

    afd = ArtifactFusedDetector(path)
    assert afd.imgsz == 64 and afd.img_hw == (48, 64)
    assert afd.max_points == MAXP and afd.fixed_batch == 1

    rng = np.random.default_rng(3)
    points = np.stack([
        rng.uniform(0, 40, 512), rng.uniform(-20, 20, 512),
        rng.uniform(-1.5, 1.0, 512), rng.uniform(0, 1, 512),
    ], axis=1).astype(np.float32)
    image = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    calib = KittiCalibration(None)

    # one-frame facade parity surface
    single = afd.detect(points, image, calib)
    assert set(single) >= {"boxes", "scores", "classes", "source", "boxes_3d"}

    server = BatchingFusedServer(afd, max_batch=4, max_delay_ms=1.0)
    try:
        assert server.max_batch == 1  # clamped to the fixed-batch artifact
        futs = [server.submit_fused(points, image, calib) for _ in range(2)]
        for fut in futs:
            res = fut.result(timeout=600)
            assert set(res) >= {"boxes", "scores", "classes", "source"}
            assert np.isfinite(res["scores"]).all()
        # frames must match the baked letterbox geometry
        with pytest.raises(ValueError, match="img_hw"):
            server.submit_fused(points, np.zeros((50, 64, 3), np.uint8), calib)
    finally:
        server.stop()


def test_enable_compilation_cache(tmp_path):
    # jax pins the persistent cache backend to the FIRST directory used
    # (module-level singleton) — conftest already enabled the suite-wide
    # cache, so redirecting requires resetting that singleton, and the
    # suite's dir must be restored afterward for later tests
    from jax._src import compilation_cache as _cc

    prev_dir = jax.config.jax_compilation_cache_dir
    cache_dir = str(tmp_path / "xla_cache")
    _cc.reset_cache()
    got = enable_compilation_cache(cache_dir)
    try:
        assert got == cache_dir and os.path.isdir(cache_dir)
        # a fresh program must land an entry in the persistent cache
        @jax.jit
        def f(x):
            return jnp.tanh(x) * 3.0 + jnp.sin(x)

        np.asarray(f(jnp.arange(17.0)))
        entries = os.listdir(cache_dir)
        assert entries, "no persistent-cache entry written"
    finally:
        _cc.reset_cache()
        jax.config.update("jax_compilation_cache_dir", prev_dir)
