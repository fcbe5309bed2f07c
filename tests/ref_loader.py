"""Load modules from the READ-ONLY reference tree for parity testing.

The reference locates its package root by crawling parents until a directory
named 'sfa' (e.g. train.py:28-32), which never terminates from
/root/reference. We therefore copy the tree to /tmp/sfa once per test
session and import from there. Nothing from the reference is ever copied
into this repository — this is test-time oracle plumbing only.
"""

import os
import shutil
import sys

REF = "/root/reference"
TMP = "/tmp/sfa"


def available() -> bool:
    return os.path.isdir(REF)


def load(module_name: str):
    """Import e.g. 'data_process.kitti_bev_utils' from the reference tree."""
    if not os.path.isdir(TMP):
        shutil.copytree(
            REF,
            TMP,
            ignore=shutil.ignore_patterns(
                "*.jpg", "*.png", "*.pyc", "__pycache__", "previous_saves", "test3_saves"
            ),
        )
    if TMP not in sys.path:
        sys.path.insert(0, TMP)
    import importlib

    return importlib.import_module(module_name)
