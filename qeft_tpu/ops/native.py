"""ctypes bindings for the native host library (native/qeft_host.cpp).

Host-side packing/codec runs in multi-threaded C++ when the shared library is
present (built with `make -C native`); every entry point has a NumPy fallback
so the framework works without the native build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                 "native", "libqeft_host.so"),
    "libqeft_host.so",
]

_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        lib.qeft_pack_codes.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ]
        lib.qeft_unpack_codes.argtypes = lib.qeft_pack_codes.argtypes
        lib.qeft_quantize_codes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ]
        _lib = lib
        return lib
    return None


def available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pack_codes(codes: np.ndarray, group_size: int) -> np.ndarray:
    """[K, N] int32 codes -> packed int32 [K/8, N] (native or NumPy)."""
    k, n = codes.shape
    lib = _load()
    if lib is None:
        from qeft_tpu.ops.packing import pack_codes_np

        return pack_codes_np(codes, group_size)
    codes = np.ascontiguousarray(codes, np.int32)
    out = np.empty((k // 8, n), np.int32)
    lib.qeft_pack_codes(_i32p(codes), _i32p(out), k, n, group_size)
    return out


def unpack_codes(packed: np.ndarray, k: int, group_size: int) -> np.ndarray:
    lib = _load()
    n = packed.shape[1]
    if lib is None:
        import jax.numpy as jnp

        from qeft_tpu.ops.packing import unpack_codes as jnp_unpack

        return np.asarray(jnp_unpack(jnp.asarray(packed), group_size))
    packed = np.ascontiguousarray(packed, np.int32)
    out = np.empty((k, n), np.int32)
    lib.qeft_unpack_codes(_i32p(packed), _i32p(out), k, n, group_size)
    return out


def quantize_codes(
    w_kn: np.ndarray, scales_gn: np.ndarray, zeros_gn: np.ndarray,
    group_size: int, n_outlier: int,
) -> np.ndarray:
    """Fused quantize-to-codes + outlier zero-point overwrite (host)."""
    k, n = w_kn.shape
    lib = _load()
    if lib is None:
        g = group_size if group_size > 0 else k
        scales = np.repeat(scales_gn, g, axis=0)
        zeros = np.repeat(zeros_gn, g, axis=0)
        codes = np.clip(np.round(w_kn / scales + zeros), 0, 15).astype(np.int32)
        if n_outlier > 0:
            codes[k - n_outlier:] = np.clip(
                np.round(zeros[k - n_outlier:]), 0, 15
            ).astype(np.int32)
        return codes
    w = np.ascontiguousarray(w_kn, np.float32)
    s = np.ascontiguousarray(scales_gn, np.float32)
    z = np.ascontiguousarray(zeros_gn, np.float32)
    out = np.empty((k, n), np.int32)
    lib.qeft_quantize_codes(_f32p(w), _f32p(s), _f32p(z), _i32p(out),
                            k, n, group_size, n_outlier)
    return out
