"""sfa3d_tpu — TPU-native multi-modal 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`SAGARCHRY0777/lidar-image_object-detection_-fpn_resnet-yolov8` (an SFA3D +
YOLOv8 camera-LiDAR fusion research codebase):

- LiDAR-only 3D detection: KITTI velodyne -> BEV raster -> KFPN ResNet ->
  CenterNet-style peak decode -> 7-DOF boxes.
- 2D camera detection: YOLOv8n re-implemented in JAX.
- Camera-LiDAR late fusion: NMS-union / confidence-weighted / Bayesian
  inverse-variance fusion.
- Dynamic calibration / SLAM simulation, targetless stereo self-calibration.
- Argoverse v1 dataset support.
- Data-parallel training over a `jax.sharding.Mesh` (the TPU-native
  replacement for the reference's NCCL DistributedDataParallel).

Everything on the device side is fixed-shape, jit-compiled, and mesh-aware.
Host-side code (file IO, OpenCV drawing) lives in `data/` and `viz/`.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: keep `import sfa3d_tpu` cheap (no jax import at module load)
    if name in ("Detector", "FusedDetector"):
        from sfa3d_tpu import detector

        return getattr(detector, name)
    raise AttributeError(name)
