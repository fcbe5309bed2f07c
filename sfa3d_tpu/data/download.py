"""KITTI raw-drive fetch helper.

Parity with reference utils/demo_utils.py:96-106 (download_and_unzip wget +
zipfile): downloads the synced+rectified data and tracklet zips for a raw
drive date/id into `demo_dataset_dir` and extracts them. Uses urllib (no
wget dependency); no-ops with a clear message when the network is
unavailable or the files already exist.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
import zipfile

KITTI_RAW_URL = "https://s3.eu-central-1.amazonaws.com/avg-kitti/raw_data"


def download_and_unzip(demo_dataset_dir: str, demo_date: str, demo_id: str) -> str:
    """Fetch {date}_drive_{id}_sync.zip (+ calib zip) and extract.
    Returns the extracted drive directory path."""
    os.makedirs(demo_dataset_dir, exist_ok=True)
    drive = f"{demo_date}_drive_{demo_id}_sync"
    drive_dir = os.path.join(demo_dataset_dir, demo_date, drive)
    targets = [
        (f"{KITTI_RAW_URL}/{demo_date}_drive_{demo_id}/{drive}.zip", f"{drive}.zip",
         drive_dir),
        (f"{KITTI_RAW_URL}/{demo_date}_calib.zip", f"{demo_date}_calib.zip",
         os.path.join(demo_dataset_dir, demo_date, "calib_cam_to_cam.txt")),
    ]
    for url, name, extracted_marker in targets:
        zip_path = os.path.join(demo_dataset_dir, name)
        if os.path.isfile(zip_path):
            print(f"{name} already downloaded")
        else:
            print(f"downloading {url} ...")
            try:
                urllib.request.urlretrieve(url, zip_path)
            except (urllib.error.URLError, OSError) as e:
                raise RuntimeError(
                    f"could not download {url} ({e}); fetch the KITTI raw "
                    f"drive manually into {demo_dataset_dir}"
                ) from e
        if os.path.exists(extracted_marker):
            print(f"{name} already extracted")
            continue
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(demo_dataset_dir)
    return drive_dir
