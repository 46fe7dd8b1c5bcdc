"""ctypes bindings for the native image pipeline (native/imgproc.cpp).

Builds on demand with make (g++, libjpeg, libpng); every entry point has a
pure-Python fallback so the package works without the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .phi3v_processor import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    hd_transform_scale,
    padded_size,
)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimgproc.so")
_lib = None
_tried = False


class _HdTask(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("len", ctypes.c_int64),
        ("transposed", ctypes.c_int32),
        ("new_h", ctypes.c_int32),
        ("new_w", ctypes.c_int32),
        ("pad_h", ctypes.c_int32),
        ("dst", ctypes.c_void_p),
        ("status", ctypes.c_int32),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lrt_decode_jpeg.restype = ctypes.c_int
        lib.lrt_decode_png.restype = ctypes.c_int
        lib.lrt_resize_rgb8_f32.restype = ctypes.c_int
        lib.lrt_phi3v_hd_normalize.restype = ctypes.c_int
        lib.lrt_phi3v_hd_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return load_native() is not None


def decode_image(data: bytes) -> Optional[np.ndarray]:
    """JPEG/PNG bytes -> (h, w, 3) uint8, or None if the native lib is
    unavailable/can't decode."""
    lib = load_native()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    for fn in (lib.lrt_decode_jpeg, lib.lrt_decode_png):
        if fn(
            buf.ctypes.data_as(ctypes.c_void_p), len(data), None,
            ctypes.byref(h), ctypes.byref(w),
        ) == 0:
            out = np.empty((h.value, w.value, 3), np.uint8)
            if fn(
                buf.ctypes.data_as(ctypes.c_void_p), len(data),
                out.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(h), ctypes.byref(w),
            ) == 0:
                return out
    return None


def resize_rgb8(img: np.ndarray, out_h: int, out_w: int, mode: str = "bilinear") -> Optional[np.ndarray]:
    """(h, w, 3) uint8 -> (out_h, out_w, 3) float32, PIL-style antialiased."""
    lib = load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.lrt_resize_rgb8_f32(
        img.ctypes.data_as(ctypes.c_void_p),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.c_void_p),
        out_h, out_w, 1 if mode == "bicubic" else 0,
    )
    return out if rc == 0 else None


def phi3v_hd_batch(
    blobs: Sequence[bytes],
    sizes: Sequence[Tuple[int, int]],  # (w, h) per image (from headers)
    num_crops: int = 16,
    num_threads: int = 8,
) -> Optional[List[np.ndarray]]:
    """Fused decode + HD transform + normalise for a batch. Returns the
    normalised (final_h, final_w, 3) float32 arrays, or None without the lib.
    """
    lib = load_native()
    if lib is None:
        return None
    mean = np.ascontiguousarray(OPENAI_CLIP_MEAN, np.float32)
    std = np.ascontiguousarray(OPENAI_CLIP_STD, np.float32)
    tasks = (_HdTask * len(blobs))()
    keep = []  # prevent GC of buffers
    outs: List[np.ndarray] = []
    for i, (blob, (w, h)) in enumerate(zip(blobs, sizes)):
        new_w, new_h, transposed = hd_transform_scale(w, h, num_crops)
        _, pad_h = padded_size(new_w, new_h)
        final_h, final_w = (new_w, pad_h) if transposed else (pad_h, new_w)
        dst = np.empty((final_h, final_w, 3), np.float32)
        buf = np.frombuffer(blob, np.uint8)
        keep.append((buf, dst))
        outs.append(dst)
        tasks[i].data = buf.ctypes.data_as(ctypes.c_void_p).value
        tasks[i].len = len(blob)
        tasks[i].transposed = int(transposed)
        tasks[i].new_h = new_h
        tasks[i].new_w = new_w
        tasks[i].pad_h = pad_h
        tasks[i].dst = dst.ctypes.data_as(ctypes.c_void_p).value
        tasks[i].status = 0
    rc = lib.lrt_phi3v_hd_batch(
        tasks, len(blobs),
        mean.ctypes.data_as(ctypes.c_void_p),
        std.ctypes.data_as(ctypes.c_void_p),
        num_threads,
    )
    return outs if rc == 0 else None
