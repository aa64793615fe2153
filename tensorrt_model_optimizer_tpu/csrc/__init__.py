"""Native extension loader (ctypes; lazily compiled like the reference's
`quantization/extensions.py:28-74` JIT loader, but with make instead of
torch.cpp_extension)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB: Optional[ctypes.CDLL] = None


def _build() -> str:
    so = os.path.join(_DIR, "libpack_ext.so")
    src = os.path.join(_DIR, "pack_ext.cpp")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    return so


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, or None if no toolchain is available."""
    global _LIB
    if _LIB is None:
        try:
            _LIB = ctypes.CDLL(_build())
            _LIB.int4_round_and_pack.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            _LIB.nvfp4_quantize_and_pack.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float), ctypes.c_float,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            _LIB.int4_unpack.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int64,
            ]
        except Exception:
            _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def int4_round_and_pack(w: np.ndarray, scale: np.ndarray, block: int) -> np.ndarray:
    """Fast INT4 round + adjacent-nibble pack. w [R, C] f32, scale [R, C/block]."""
    lib = get_lib()
    w = np.ascontiguousarray(w, np.float32)
    scale = np.ascontiguousarray(scale, np.float32)
    rows, cols = w.shape
    out = np.empty((rows, cols // 2), np.uint8)
    lib.int4_round_and_pack(
        _fp(w), _fp(scale), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows, cols, block,
    )
    return out


def nvfp4_quantize_and_pack(
    w: np.ndarray, global_scale: float, block: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Fast NVFP4 quantize+pack. Returns (packed [R, C/2], scales [R, C/block])."""
    lib = get_lib()
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    out = np.empty((rows, cols // 2), np.uint8)
    scales = np.empty((rows, cols // block), np.float32)
    lib.nvfp4_quantize_and_pack(
        _fp(w), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _fp(scales), ctypes.c_float(global_scale), rows, cols, block,
    )
    return out, scales


def int4_unpack(packed: np.ndarray) -> np.ndarray:
    lib = get_lib()
    packed = np.ascontiguousarray(packed, np.uint8)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), np.int8)
    lib.int4_unpack(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        packed.size,
    )
    return out


def nf4_quantize_and_pack(w: np.ndarray, block: int = 64):
    """Native NF4 quantize+pack. Returns (packed [n/2] u8, absmax [n/block])."""
    lib = get_lib()
    w = np.ascontiguousarray(w, np.float32).reshape(-1)
    n = w.size
    assert n % block == 0
    out = np.empty(n // 2, np.uint8)
    am = np.empty(n // block, np.float32)
    lib.nf4_quantize_and_pack(_fp(w), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                              _fp(am), ctypes.c_int64(n), ctypes.c_int64(block))
    return out, am


def nf4_dequantize(packed: np.ndarray, absmax: np.ndarray, block: int = 64):
    lib = get_lib()
    n = packed.size * 2
    out = np.empty(n, np.float32)
    lib.nf4_dequantize(packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       _fp(np.ascontiguousarray(absmax, np.float32)), _fp(out),
                       ctypes.c_int64(n), ctypes.c_int64(block))
    return out
