"""Native (C++) host-side runtime for the input pipeline.

The TPU compute path is JAX/XLA/Pallas; the host runtime around it — scan
reading, range filtering, fixed-shape padding — is implemented in C++
(preproc.cpp) and called through ctypes so loader threads run it without the
GIL. The module self-builds with the system compiler on first use, caches
the shared library per source-hash, and degrades silently to the numpy path
when no compiler is available (``available()`` reports which).

Replaces: reference get_filtered_lidar (kitti_data_utils.py:228-251) +
np.fromfile scan reads (kitti_dataset.py:119), which the reference runs in
DataLoader worker processes.

Env: SFA3D_TPU_NO_NATIVE=1 disables the native path entirely.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "preproc.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_build_error: Optional[str] = None


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "sfa3d_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _host_tag() -> str:
    """Host/CPU identifier mixed into the cache filename: the library is
    built with -march=native, so a binary cached on a shared (e.g. NFS)
    home by a newer CPU must not be silently reused on an older one
    (SIGILL instead of the numpy fallback)."""
    import platform

    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    bits.append(line)
                    break
    except OSError:
        bits.append(platform.processor() or platform.node())
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:8]


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"preproc_{digest}_{_host_tag()}.so")
    if not os.path.exists(so_path):
        # build into a temp file then atomically rename: concurrent loader
        # processes may race on first use
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_cache_dir())
        os.close(fd)
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except BaseException as e:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise RuntimeError(f"{' '.join(cmd)}: {e}") from e
    lib = ctypes.CDLL(so_path)
    lib.sfa_filter_pad.restype = ctypes.c_int64
    lib.sfa_filter_pad.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.sfa_read_filter_pad.restype = ctypes.c_int64
    lib.sfa_read_filter_pad.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried, _build_error
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        if os.environ.get("SFA3D_TPU_NO_NATIVE"):
            _build_error = "disabled via SFA3D_TPU_NO_NATIVE"
        else:
            try:
                _lib = _build()
            except Exception as e:  # no compiler / sandbox: numpy fallback
                _build_error = str(e)
                print(
                    f"sfa3d_tpu.native: build failed, using numpy fallback "
                    f"({e})",
                    file=sys.stderr,
                )
        _tried = True
    return _lib


def available() -> bool:
    """True when the compiled native library is usable."""
    return _get_lib() is not None


def build_error() -> Optional[str]:
    _get_lib()
    return _build_error


def _bound_arr(boundary: Dict[str, float]) -> np.ndarray:
    return np.asarray(
        [boundary["minX"], boundary["maxX"], boundary["minY"],
         boundary["maxY"], boundary["minZ"], boundary["maxZ"]],
        dtype=np.float32,
    )


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def filter_pad_points(
    points: np.ndarray, max_points: int, boundary: Dict[str, float]
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native analog of ops.bev.filter_and_pad_points (same semantics,
    single pass). Returns None when the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if pts.ndim != 2 or pts.shape[1] != 4:
        return None  # unusual layout: let the numpy path handle/raise
    out = np.empty((max_points, 4), np.float32)
    valid = np.empty((max_points,), np.uint8)
    kept = lib.sfa_filter_pad(
        _fptr(pts), pts.shape[0], _fptr(_bound_arr(boundary)),
        max_points, _fptr(out),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    _warn_on_overflow(kept, max_points)
    return out, valid.astype(bool)


def _warn_on_overflow(kept: int, max_points: int) -> None:
    """Truncation must never be silent (CLAUDE.md invariant): the kernels
    return the TOTAL in-range count, which exceeds max_points when a scan
    overflows the fixed point budget. One shared warning site with the
    numpy fallback (ops/bev.py) so the messages cannot drift."""
    # lazy import: ops.bev imports this module (lazily) for the fast path
    from sfa3d_tpu.ops.bev import warn_point_overflow

    warn_point_overflow(kept, max_points)


def read_velodyne_filtered(
    path: str, max_points: int, boundary: Dict[str, float]
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused .bin read + range filter + pad: the raw cloud is never
    materialized. Returns None when unavailable or the file can't be read
    (caller falls back to the numpy path, which raises a precise error)."""
    lib = _get_lib()
    if lib is None:
        return None
    out = np.empty((max_points, 4), np.float32)
    valid = np.empty((max_points,), np.uint8)
    kept = lib.sfa_read_filter_pad(
        path.encode(), _fptr(_bound_arr(boundary)), max_points, _fptr(out),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if kept < 0:
        return None
    _warn_on_overflow(kept, max_points)
    return out, valid.astype(bool)
