"""Subcommand dispatcher: python -m sfa3d_tpu.cli <command> [args...]."""

import sys


COMMANDS = {
    "train": ("sfa3d_tpu.cli.train", "KITTI training over the device mesh"),
    "yolo-train": ("sfa3d_tpu.cli.yolo_train",
                   "train the YOLOv8 camera detector (2D boxes)"),
    "test": ("sfa3d_tpu.cli.test", "inference + visualization on the test split"),
    "demo": ("sfa3d_tpu.cli.demo", "raw-drive video demo (front / two-sides)"),
    "track": ("sfa3d_tpu.cli.track", "3D multi-object tracking over a raw drive"),
    "fuse": ("sfa3d_tpu.cli.fuse", "camera-LiDAR fusion (nms/weighted/bayesian)"),
    "eval": ("sfa3d_tpu.cli.eval", "KITTI 3D/BEV AP evaluation on the val split"),
    "serve": ("sfa3d_tpu.cli.serve", "batched JSON detection server (stdio/TCP)"),
    "export": ("sfa3d_tpu.cli.export", "AOT StableHLO artifact (weights baked in)"),
    "slam": ("sfa3d_tpu.cli.slam", "fusion with dynamic SLAM-simulated calibration"),
    "stereo-calib": ("sfa3d_tpu.cli.stereo_calib", "targetless stereo self-calibration"),
    "argoverse-test": ("sfa3d_tpu.cli.argoverse_test", "Argoverse pipeline runner"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m sfa3d_tpu.cli <command> [args...]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:15s} {desc}")
        sys.exit(0)
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd} (choose from {', '.join(COMMANDS)})")
        sys.exit(2)
    module_name, _ = COMMANDS[cmd]
    import importlib

    module = importlib.import_module(module_name)
    module.main(sys.argv[2:])


if __name__ == "__main__":
    main()
