"""ctypes binding for the native host library (native/dspi_host.cpp).

Builds the shared library on first use (g++ via make), then exposes the
packet (de)framing and the fast exact oracle.  All entry points degrade
gracefully: ``available()`` is False if no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libdspi_host.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or (
                _LIB_PATH.stat().st_mtime
                < (_NATIVE_DIR / "dspi_host.cpp").stat().st_mtime):
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
    except (OSError, subprocess.CalledProcessError):
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.dspi_q28_mul.restype = ctypes.c_int32
    lib.dspi_q28_mul.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.dspi_q15_mul.restype = ctypes.c_int32
    lib.dspi_q15_mul.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.dspi_crc32.restype = ctypes.c_uint32
    lib.dspi_crc32.argtypes = [u8p, ctypes.c_uint64]
    lib.dspi_unpack_s16.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
    lib.dspi_unpack_s24.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
    lib.dspi_pack_s24.argtypes = [i32p, i32p, ctypes.c_int64, u8p]
    lib.dspi_to_time_major.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.dspi_q28_cascade_block.argtypes = [i32p, i32p, ctypes.c_int32, i32p,
                                           ctypes.c_int64]
    lib.dspi_pdm_block.argtypes = [i32p, i32p, ctypes.c_int64, u32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a):
    return (ctypes.c_uint8 * len(a)).from_buffer_copy(a)


def unpack_s16(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved s16 LRLR bytes -> (left, right) int32 arrays."""
    lib = _load()
    frames = len(data) // 4
    out_l = np.empty(frames, np.int32)
    out_r = np.empty(frames, np.int32)
    lib.dspi_unpack_s16(_u8p(data), frames, _i32p(out_l), _i32p(out_r))
    return out_l, out_r


def unpack_s24(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Packed s24 LRLR bytes (6 B/frame) -> (left, right) int32 arrays."""
    lib = _load()
    frames = len(data) // 6
    out_l = np.empty(frames, np.int32)
    out_r = np.empty(frames, np.int32)
    lib.dspi_unpack_s24(_u8p(data), frames, _i32p(out_l), _i32p(out_r))
    return out_l, out_r


def pack_s24(left: np.ndarray, right: np.ndarray) -> bytes:
    lib = _load()
    left = np.ascontiguousarray(left, np.int32)
    right = np.ascontiguousarray(right, np.int32)
    out = np.empty(len(left) * 6, np.uint8)
    lib.dspi_pack_s24(_i32p(left), _i32p(right), len(left),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def to_time_major(planar: np.ndarray) -> np.ndarray:
    """[B, T] int32 -> [T, B] int32 via the native transpose."""
    lib = _load()
    planar = np.ascontiguousarray(planar, np.int32)
    b, t = planar.shape
    out = np.empty((t, b), np.int32)
    lib.dspi_to_time_major(_i32p(planar), b, t, _i32p(out))
    return out


def q28_mul(a: int, b: int) -> int:
    return _load().dspi_q28_mul(a, b)


def q15_mul(a: int, b: int) -> int:
    return _load().dspi_q15_mul(a, b)


def crc32(data: bytes) -> int:
    return _load().dspi_crc32(_u8p(data), len(data))


def q28_cascade_block(coeffs: np.ndarray, state: np.ndarray,
                      samples: np.ndarray) -> None:
    """In-place Q28 TDF2 cascade. coeffs [bands,5], state [bands,2] (updated),
    samples [count] (updated)."""
    lib = _load()
    coeffs = np.ascontiguousarray(coeffs, np.int32)
    assert state.dtype == np.int32 and samples.dtype == np.int32
    lib.dspi_q28_cascade_block(_i32p(coeffs), _i32p(state), coeffs.shape[0],
                               _i32p(samples), len(samples))


def pdm_block(state: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Delta-sigma modulate a block.  state: int32[9]
    [err, err2, x1, x2, y1, y2, err_acc, rng, fade] (updated in place);
    x: int32 [count] Q28.  Returns uint32 [count*8] PDM words."""
    lib = _load()
    assert state.dtype == np.int32 and len(state) == 9
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty(len(x) * 8, np.uint32)
    lib.dspi_pdm_block(_i32p(state), _i32p(x), len(x),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out
