"""ctypes bindings for the native V4L2 webcam shim (camera_v4l2.cc).

The role cv2.VideoCapture plays in the reference demo
(``slowfast/visualization/demo_loader.py:28-47``); here the kernel V4L2
API is used directly so the webcam path needs no OpenCV.  The YUV
conversion is exposed separately (``yuyv_to_rgb``) so its numerics are
unit-testable without a physical camera.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsvit_camera.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    import fcntl

    try:
        with open(os.path.join(_DIR, ".build.lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            if os.path.isfile(_SO):
                return True
            subprocess.run(
                ["make", "-s", "-C", _DIR, "libsvit_camera.so"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return os.path.isfile(_SO)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.svit_yuyv_to_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.svit_camera_open.restype = ctypes.c_void_p
        lib.svit_camera_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.svit_camera_read.restype = ctypes.c_int
        lib.svit_camera_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.svit_camera_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def yuyv_to_rgb(yuyv: np.ndarray, w: int, h: int) -> np.ndarray:
    """BT.601 YUYV -> RGB via the native shim; yuyv is [h*w*2] uint8."""
    lib = _load()
    assert lib is not None, "native camera shim unavailable"
    yuyv = np.ascontiguousarray(yuyv, np.uint8)
    out = np.empty(h * w * 3, np.uint8)
    lib.svit_yuyv_to_rgb(
        yuyv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(h, w, 3)


class CameraSource:
    """Streaming RGB frames from /dev/video<index> (context manager).

    Equivalent of the reference's ``VideoManager`` webcam branch
    (``slowfast/visualization/demo_loader.py:28-47``): opens the device,
    then iterates uint8 RGB [H, W, 3] frames until closed.
    """

    def __init__(self, index: int, width: int = 0, height: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native V4L2 camera shim failed to build/load")
        dev = f"/dev/video{index}"
        w = ctypes.c_int()
        h = ctypes.c_int()
        self._lib = lib
        self._cam = lib.svit_camera_open(
            dev.encode(), width, height, ctypes.byref(w), ctypes.byref(h)
        )
        if not self._cam:
            raise RuntimeError(
                f"could not open {dev} for V4L2 streaming capture"
            )
        self.width = w.value
        self.height = h.value

    def read(self) -> Optional[np.ndarray]:
        """Next frame, or None on timeout (camera stalled >2s)."""
        out = np.empty(self.height * self.width * 3, np.uint8)
        rc = self._lib.svit_camera_read(
            self._cam, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc == -1:
            return None
        if rc < 0:
            raise RuntimeError("V4L2 device error during capture")
        return out.reshape(self.height, self.width, 3)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    def close(self) -> None:
        if getattr(self, "_cam", None):
            self._lib.svit_camera_close(self._cam)
            self._cam = None

    def __enter__(self) -> "CameraSource":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self) -> None:  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass
