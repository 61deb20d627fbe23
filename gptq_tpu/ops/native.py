"""ctypes bindings for the native packing library (native/packlib.cpp).

Host-side counterpart of the reference's CUDA-extension build
(reference: setup_cuda.py, lut_gemm/setup_lut.py) — here the device kernels
are Pallas-JIT'd, so the only native need is fast checkpoint-conversion
packing. Falls back to the numpy/jnp path transparently when the .so is
missing; `build()` compiles it with g++ -fopenmp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from gptq_tpu.ops.pack import subblock

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libpacklib.so")


def build(force: bool = False) -> str | None:
    src = os.path.join(_NATIVE_DIR, "packlib.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_SO) and not force:
        return _SO
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-march=native",
           src, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _SO if os.path.exists(_SO) else build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pack_field.argtypes = [i32p, u32p, i64, i64, i32, i32, i64]
    lib.unpack_field.argtypes = [u32p, i32p, i64, i64, i32, i32, i64]
    lib.quantize_codes.argtypes = [f32p, f32p, f32p, i32p, i64, i64, i64, i32]
    lib.pack_signs.argtypes = [f32p, u32p, i64, i64, i32, i64]
    lib.packlib_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_field_np(codes: np.ndarray, fb: int, shift: int,
                  groupsize: int = -1) -> np.ndarray | None:
    """Native byteplane field pack; returns None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    K, N = codes.shape
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    out = np.zeros((K // (32 // fb), N), dtype=np.uint32)
    lib.pack_field(_ptr(codes, ctypes.c_int32), _ptr(out, ctypes.c_uint32),
                   K, N, fb, shift, subblock(K, groupsize))
    return out.view(np.int32)


def unpack_field_np(words: np.ndarray, fb: int, shift: int,
                    groupsize: int = -1) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    P = 32 // fb
    Kw, N = words.shape
    words = np.ascontiguousarray(words).view(np.uint32)
    out = np.zeros((Kw * P, N), dtype=np.int32)
    lib.unpack_field(_ptr(words, ctypes.c_uint32), _ptr(out, ctypes.c_int32),
                     Kw * P, N, fb, shift, subblock(Kw * P, groupsize))
    return out


def quantize_codes_np(W: np.ndarray, scale: np.ndarray, zero: np.ndarray,
                      maxq: int) -> np.ndarray | None:
    """Fused round((W^T/scale)+zero)->clip. W: (N, K); scale/zero (ng, N)."""
    lib = get_lib()
    if lib is None:
        return None
    W = np.ascontiguousarray(W, dtype=np.float32)
    scale = np.ascontiguousarray(scale, dtype=np.float32)
    zero = np.ascontiguousarray(zero, dtype=np.float32)
    Nn, K = W.shape
    ng = scale.shape[0]
    out = np.zeros((K, Nn), dtype=np.int32)
    lib.quantize_codes(_ptr(W, ctypes.c_float), _ptr(scale, ctypes.c_float),
                       _ptr(zero, ctypes.c_float), _ptr(out, ctypes.c_int32),
                       Nn, K, ng, maxq)
    return out


def pack_signs_np(B: np.ndarray, groupsize: int = -1) -> np.ndarray | None:
    """B: (N, K, bits) in {-1,+1} -> (bits, K//32, N) int32 bitplanes."""
    lib = get_lib()
    if lib is None:
        return None
    B = np.ascontiguousarray(B, dtype=np.float32)
    Nn, K, bits = B.shape
    out = np.zeros((bits, K // 32, Nn), dtype=np.uint32)
    lib.pack_signs(_ptr(B, ctypes.c_float), _ptr(out, ctypes.c_uint32),
                   Nn, K, bits, subblock(K, groupsize))
    return out.view(np.int32)
