"""ctypes bindings for the native host-preprocessing library.

``native/libtuxresize.so`` implements the data pipeline's hot host op —
PIL-semantics antialiased bilinear resize — in C++ with OpenMP row
parallelism (see native/resize.cpp). This module loads it lazily, builds it
on first use if the toolchain is present, and degrades to a pure
numpy/PIL fallback otherwise; callers use :func:`resize_bilinear_u8` /
:func:`resize_to_model_input` without caring which backend ran.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtuxresize.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        lib.tux_resize_bilinear_u8.argtypes = [
            u8, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8, ctypes.c_int, ctypes.c_int]
        lib.tux_resize_bilinear_u8.restype = ctypes.c_int
        lib.tux_resize_bilinear_u8_to_f32.argtypes = [
            u8, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32, ctypes.c_int, ctypes.c_int]
        lib.tux_resize_bilinear_u8_to_f32.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fallback_u8(src: np.ndarray, out_hw) -> np.ndarray:
    from PIL import Image

    h, w = out_hw
    return np.asarray(
        Image.fromarray(src).resize((w, h), Image.BILINEAR))


def resize_bilinear_u8(src: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """HWC uint8 -> HWC uint8, PIL-antialias bilinear semantics."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    lib = _load()
    h, w = out_hw
    if lib is None:
        return _fallback_u8(src, out_hw)
    ih, iw, c = src.shape
    dst = np.empty((h, w, c), np.uint8)
    rc = lib.tux_resize_bilinear_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ih, iw, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
    if rc != 0:
        return _fallback_u8(src, out_hw)
    return dst


def resize_to_model_input(src: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """HWC uint8 -> HWC float32 in [0, 1] (resize + normalize in one pass)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    lib = _load()
    h, w = out_hw
    if lib is None:
        return _fallback_u8(src, out_hw).astype(np.float32) / 255.0
    ih, iw, c = src.shape
    dst = np.empty((h, w, c), np.float32)
    rc = lib.tux_resize_bilinear_u8_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ih, iw, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w)
    if rc != 0:
        return _fallback_u8(src, out_hw).astype(np.float32) / 255.0
    return dst
