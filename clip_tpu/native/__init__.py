"""Native (C++) host runtime pieces, loaded via ctypes.

``libclip_tpu_native.so`` is built lazily from ``preprocess.cpp`` with g++ on
first use and cached next to the source.  Everything here has a pure
numpy fallback — the native path exists because host preprocessing is the
feed pipeline in front of the TPU and benefits from -O3 plus a thread pool
without the GIL in the inner loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = os.path.join(_DIR, "libclip_tpu_native.so")
_STAMP = _LIB + ".host"  # ISA fingerprint of the machine that built the .so

_lock = threading.Lock()
_lib: "ctypes.CDLL | None | bool" = None  # None=untried, False=unavailable


def _host_isa() -> str:
    """Fingerprint of this host's instruction set (the .so is built with
    -march=native, so a binary from a different microarchitecture can carry
    illegal instructions — SIGILL at first call, not at dlopen)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    import platform
    return platform.machine()


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        with open(_STAMP, "w") as f:
            f.write(_host_isa())
        return True
    except Exception:
        return False


def _stamp_matches() -> bool:
    try:
        with open(_STAMP) as f:
            return f.read() == _host_isa()
    except OSError:
        return False


def load() -> "ctypes.CDLL | None":
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is None:
            if not os.path.exists(_SRC):
                # source missing from a stripped install: use the prebuilt
                # .so ONLY if its build-host ISA stamp matches this machine
                # (-march=native binaries SIGILL on other microarchitectures)
                if not os.path.exists(_LIB) or not _stamp_matches():
                    _lib = False
                    return None
            elif (not os.path.exists(_LIB)
                  or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
                  or not _stamp_matches()):
                if not _build():
                    _lib = False
                    return None
            try:
                lib = ctypes.CDLL(_LIB)
                lib.ctpu_preprocess.restype = ctypes.c_int
                lib.ctpu_preprocess_batch.restype = ctypes.c_int
                _lib = lib
            except OSError:
                _lib = False
        return _lib or None


def available() -> bool:
    return load() is not None


def preprocess_native(img: np.ndarray, image_size: int, mean, std) -> np.ndarray:
    """Single-image preprocess through the C++ pipeline."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) uint8")
    h, w = img.shape[:2]
    out = np.empty((image_size, image_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.ctpu_preprocess(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(image_size),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"ctpu_preprocess failed with code {rc}")
    return out


def preprocess_batch_native(
    images: list[np.ndarray], image_size: int, mean, std, n_threads: int = 4
) -> np.ndarray:
    """Batch preprocess on the C++ thread pool (GIL released for the whole
    batch, unlike the numpy path which re-enters Python per image)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(images)
    if n == 0:
        return np.zeros((0, image_size, image_size, 3), np.float32)
    arrs = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    for a in arrs:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("expected (H, W, 3) uint8 images")
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrs]
    )
    hs = (ctypes.c_int * n)(*[a.shape[0] for a in arrs])
    ws = (ctypes.c_int * n)(*[a.shape[1] for a in arrs])
    out = np.empty((n, image_size, image_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.ctpu_preprocess_batch(
        ptrs, hs, ws, ctypes.c_int(n), ctypes.c_int(image_size),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads),
    )
    if rc != 0:
        raise RuntimeError(f"ctpu_preprocess_batch failed with code {rc}")
    return out
