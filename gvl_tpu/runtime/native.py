"""ctypes bindings over the C++ runtime (gvl_runtime.cpp).

The shared library builds lazily on first use (g++ -O3 -shared) and is
cached beside the source; every entry point degrades to the pure-Python
implementations in :mod:`gvl_tpu.io` / :mod:`gvl_tpu.audio` when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import shutil
import subprocess
import threading
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "csrc" / "gvl_runtime.cpp"
_LIB = Path(__file__).parent / "csrc" / "libgvl_runtime.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[Path]:
    gxx = shutil.which("g++")
    if gxx is None:
        return None
    cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return _LIB
    except Exception as exc:
        logger.warning("native runtime build failed: %s", exc)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if _build() is None:
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        # signatures
        lib.y4m_open.restype = ctypes.c_void_p
        lib.y4m_open.argtypes = [ctypes.c_char_p]
        lib.y4m_info.restype = ctypes.c_int
        lib.y4m_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_double)]
        lib.y4m_next_frame.restype = ctypes.c_int
        lib.y4m_next_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.y4m_close.argtypes = [ctypes.c_void_p]
        lib.wav_read.restype = ctypes.c_long
        lib.wav_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.wav_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.prefetch_create.restype = ctypes.c_void_p
        lib.prefetch_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.c_int]
        lib.prefetch_info.restype = ctypes.c_int
        lib.prefetch_info.argtypes = lib.y4m_info.argtypes
        lib.prefetch_next.restype = ctypes.c_int
        lib.prefetch_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_double)]
        lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.resize_u8.restype = ctypes.c_int
        lib.resize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, u8p, ctypes.c_int,
                                  ctypes.c_int]
        lib.resize_u8_batch.restype = ctypes.c_int
        lib.resize_u8_batch.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int, u8p,
                                        ctypes.c_int, ctypes.c_int]
        lib.resize_nearest_u8.restype = ctypes.c_int
        lib.resize_nearest_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                          u8p, ctypes.c_int, ctypes.c_int]
        _lib = lib
        logger.info("native runtime loaded: %s", _LIB)
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeY4MReader:
    """Streaming y4m frames decoded in C++."""

    def __init__(self, path: str | Path):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._handle = lib.y4m_open(str(path).encode())
        if not self._handle:
            raise ValueError(f"cannot open y4m: {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        lib.y4m_info(self._handle, ctypes.byref(w), ctypes.byref(h),
                     ctypes.byref(fps))
        self.width, self.height, self.fps = w.value, h.value, fps.value

    def __iter__(self) -> Iterator[np.ndarray]:
        out = np.empty((self.height, self.width, 3), np.uint8)
        while True:
            got = self._lib.y4m_next_frame(
                self._handle, out.ctypes.data_as(ctypes.c_void_p))
            if got != 1:
                return
            yield out.copy()

    def close(self) -> None:
        if self._handle:
            self._lib.y4m_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativePrefetchSource:
    """Background-thread decode with a bounded ring buffer.

    Decode (C++ thread) overlaps with whatever the consumer does with the
    frames (preprocess, device transfer) — the double-buffered host
    pipeline SURVEY §7.1 stage 2 calls for.
    """

    def __init__(self, path: str | Path, capacity: int = 8, stride: int = 1):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._handle = lib.prefetch_create(str(path).encode(), capacity, stride)
        if not self._handle:
            raise ValueError(f"cannot open y4m: {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        lib.prefetch_info(self._handle, ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(fps))
        self.width, self.height, self.fps = w.value, h.value, fps.value

    def __iter__(self) -> Iterator[tuple[float, np.ndarray]]:
        out = np.empty((self.height, self.width, 3), np.uint8)
        ts = ctypes.c_double()
        while True:
            got = self._lib.prefetch_next(
                self._handle, out.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(ts))
            if got != 1:
                return
            yield ts.value, out.copy()

    def close(self) -> None:
        if self._handle:
            self._lib.prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def read_wav_native(path: str | Path) -> tuple[np.ndarray, int]:
    """Mono float32 waveform + sample rate, decoded in C++."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    rate = ctypes.c_int()
    n = lib.wav_read(str(path).encode(), ctypes.byref(out), ctypes.byref(rate))
    if n <= 0:
        raise ValueError(f"wav_read failed ({n}) for {path}")
    try:
        data = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.wav_free(out)
    return data, rate.value


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_image(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """uint8 HWC resize in C++ (area-average down, bilinear up).

    Falls back to PIL when the native library is unavailable."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    if image.ndim == 2:
        image = image[..., None]
    if lib is None:
        from PIL import Image

        arr = image[..., 0] if image.shape[-1] == 1 else image
        out = np.asarray(Image.fromarray(arr).resize(
            (width, height), Image.BILINEAR))
        return out if out.ndim == 3 else out[..., None]
    sh, sw, c = image.shape
    out = np.empty((height, width, c), np.uint8)
    if not lib.resize_u8(_as_u8p(image), sh, sw, c,
                         _as_u8p(out), height, width):
        raise ValueError("resize_u8 failed")
    return out


def resize_batch(images: np.ndarray, height: int, width: int) -> np.ndarray:
    """uint8 [N, H, W, C] → [N, height, width, C], one C++ call."""
    lib = _load()
    images = np.ascontiguousarray(images, np.uint8)
    n, sh, sw, c = images.shape
    if lib is None:
        return np.stack([resize_image(img, height, width)
                         for img in images])
    out = np.empty((n, height, width, c), np.uint8)
    if not lib.resize_u8_batch(_as_u8p(images), n, sh, sw, c,
                               _as_u8p(out), height, width):
        raise ValueError("resize_u8_batch failed")
    return out


def resize_mask(mask: np.ndarray, height: int, width: int) -> np.ndarray:
    """bool [H, W] → bool [height, width], nearest-neighbor in C++."""
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.fromarray(
            mask.astype(np.uint8) * 255
        ).resize((width, height), Image.NEAREST)) > 127
    src = np.ascontiguousarray(mask, np.uint8)
    out = np.empty((height, width), np.uint8)
    if not lib.resize_nearest_u8(_as_u8p(src), src.shape[0], src.shape[1],
                                 _as_u8p(out), height, width):
        raise ValueError("resize_nearest_u8 failed")
    return out.astype(bool)
