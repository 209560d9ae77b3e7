"""On-demand g++ build + ctypes loader for the native C++ components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ("rvl.cpp", "ccl.cpp", "image_io.cpp", "apriltag_mid.cpp", "capture.cpp")
_LIB_NAME = "_kornia_native.so"

_lock = threading.Lock()
_lib: "ctypes.CDLL | None" = None
_load_failed = False


def _needs_rebuild(lib_path: str, sources: list) -> bool:
    if not os.path.exists(lib_path):
        return True
    lib_mtime = os.path.getmtime(lib_path)
    return any(os.path.getmtime(s) > lib_mtime for s in sources)


def _build(lib_path: str, sources: list) -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", lib_path, *sources,
    ]
    subprocess.run(cmd, check=True, capture_output=True, cwd=_DIR)


def load_native_library() -> "ctypes.CDLL | None":
    """Build (if stale) and load the native library; None if unavailable.

    Thread-safe; the build runs at most once per process. Failures are
    sticky — callers fall back to numpy implementations.
    """
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        sources = [os.path.join(_DIR, s) for s in _SOURCES
                   if os.path.exists(os.path.join(_DIR, s))]
        lib_path = os.path.join(_DIR, _LIB_NAME)
        try:
            if _needs_rebuild(lib_path, sources):
                _build(lib_path, sources)
            _lib = ctypes.CDLL(lib_path)
        except (OSError, subprocess.CalledProcessError):
            _load_failed = True
            _lib = None
        return _lib


def native_available() -> bool:
    return load_native_library() is not None
