"""ctypes loader for the native C++ runtime helpers.

The reference is pure Python (SURVEY.md §2: zero native components); its hot
*host-side* loops are the windowing scan, the O(n²) siamese pair builder
(reference dataset_utils.py:534-757), and frame preprocessing
(preprocessing_utils.py:16-86). Those are implemented in C++
(``native/medtpu_native.cpp``) and loaded here; every entry point has a NumPy
fallback so the framework works without the compiled library.

Build: ``make -C native`` (or ``python -m med_tpu.utils.native`` to
build on demand).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np
from numpy.ctypeslib import ndpointer

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmedtpu_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_i32 = ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i64 = ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_f32 = ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_u8 = ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")


def build_native(verbose: bool = False) -> bool:
    """Compile the native library in-place. Returns True on success."""
    src = os.path.join(_NATIVE_DIR, "medtpu_native.cpp")
    if not os.path.exists(src):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, src,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if verbose and res.returncode != 0:
            print(res.stderr)
        return res.returncode == 0
    except Exception:
        return False


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("MEDTPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not build_native():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None

        lib.window_scan.restype = ctypes.c_int64
        lib.window_scan.argtypes = [
            _i32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _i64,
        ]
        lib.siamese_train_pairs.restype = ctypes.c_int64
        lib.siamese_train_pairs.argtypes = [
            _i32,              # gesture labels (n,)
            _i32,              # binary error labels (n,)
            _i32,              # subject ids (n,)
            ctypes.c_int64,    # n windows
            _i64,              # out pos_1
            _i64,              # out pos_2
            _i32,              # out instance_1
            _i32,              # out instance_2
            _i32,              # out label
            ctypes.c_int64,    # max pairs (output capacity)
        ]
        lib.preprocess_frames.restype = None
        lib.preprocess_frames.argtypes = [
            _u8,               # raw frames (N, H, W, 3) uint8
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,   # N, H, W
            _f32,              # mean (3,)
            _f32,              # std (3,)
            _f32,              # out (N, 224, 224, 3) float32
        ]
        _lib = lib
        return _lib


if __name__ == "__main__":
    ok = build_native(verbose=True)
    print("native build:", "ok" if ok else "FAILED")
