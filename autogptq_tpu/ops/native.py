"""ctypes bindings for the native pack library (csrc/packlib.cpp), with
automatic build-on-first-use and transparent NumPy fallback.

The native path multithreads the host-side nibble shuffling done at model
load (reference counterpart: the single-threaded CPU pack loops,
modeling/_utils.py:301-322); NumPy remains the reference implementation and
is what tests compare against.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_TRIED = False
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_CSRC, "libpacklib.so"))
    src = os.path.abspath(os.path.join(_CSRC, "packlib.cpp"))
    stale = (
        os.path.isfile(so)
        and os.path.isfile(src)
        and os.path.getmtime(src) > os.path.getmtime(so)
    )
    if not os.path.isfile(so) or stale:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC), "-B"] if stale
                else ["make", "-C", os.path.abspath(_CSRC)],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError) as e:
            if not os.path.isfile(so):
                logger.info(
                    "packlib build unavailable (%s); using NumPy fallback", e
                )
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logger.info("packlib load failed (%s); using NumPy fallback", e)
        return None

    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.pack_rows_pow2.argtypes = [u32p, u32p, i64, i64, ctypes.c_int]
    lib.unpack_rows_pow2.argtypes = [u32p, u32p, i64, i64, ctypes.c_int]
    lib.pack_rows_3bit.argtypes = [u32p, u32p, i64, i64]
    lib.unpack_rows_3bit.argtypes = [u32p, u32p, i64, i64]
    lib.repack_kint4.argtypes = [u32p, i32p, u8p, i64, i64]
    lib.repack_planar.argtypes = [u32p, i32p, u8p, i64, i64, ctypes.c_int, ctypes.c_int]
    try:
        for fn in ("repack_ki32", "pack_ki32_values", "repack_k2i32"):
            getattr(lib, fn).argtypes = [u32p, i32p, u32p, i64, i64, i64, i64, i64]
    except AttributeError:
        logger.info("stale libpacklib.so (missing i32 repacks); NumPy fallback")
        return None
    lib.packlib_num_threads.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def pack_rows(values: np.ndarray, bits: int) -> np.ndarray | None:
    """Native pack along axis 0 (reference qweight layout); None if no lib."""
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.uint32)
    k, n = values.shape
    out = np.empty((k * bits // 32, n), dtype=np.uint32)
    if bits == 3:
        lib.pack_rows_3bit(_u32(values), _u32(out), k, n)
    else:
        lib.pack_rows_pow2(_u32(values), _u32(out), k, n, bits)
    return out


def unpack_rows(packed: np.ndarray, bits: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed).view(np.uint32)
    r, n = packed.shape
    out = np.empty((r * 32 // bits, n), dtype=np.uint32)
    if bits == 3:
        lib.unpack_rows_3bit(_u32(packed), _u32(out), r, n)
    else:
        lib.unpack_rows_pow2(_u32(packed), _u32(out), r, n, bits)
    return out


def repack_kint4(values: np.ndarray, perm: np.ndarray | None) -> np.ndarray | None:
    """K-interleaved nibble repack (TPU runtime layout); None if no lib."""
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.uint32)
    k, n = values.shape
    out = np.empty((k // 2, n), dtype=np.uint8)
    permp = (
        None
        if perm is None
        else np.ascontiguousarray(perm, dtype=np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        )
    )
    lib.repack_kint4(_u32(values), permp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), k, n)
    return out


def repack_planar(
    values: np.ndarray, perm: np.ndarray | None, planes: int, sbits: int
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.uint32)
    k, n = values.shape
    out = np.empty((k, n // planes), dtype=np.uint8)
    permp = (
        None
        if perm is None
        else np.ascontiguousarray(perm, dtype=np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        )
    )
    lib.repack_planar(
        _u32(values), permp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        k, n, planes, sbits,
    )
    return out


def _i32_repack(fn_name, src, perm, k_in, k_out, n, n_out, gs, words_per_row):
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src).view(np.uint32)
    out = np.empty((k_out // words_per_row, n_out), dtype=np.int32)
    # keep a ref so the perm buffer outlives the call
    perm_arr = None if perm is None else np.ascontiguousarray(perm, np.int32)
    permp = (
        None
        if perm_arr is None
        else perm_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    getattr(lib, fn_name)(
        _u32(src), permp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        k_in, k_out, n, n_out, gs,
    )
    return out


def repack_ki32(qweight, perm, k_in, k_out, n, n_out, gs):
    """Fused reference-4-bit-qweight -> ki32 runtime words; None if no lib.

    Equivalent to ``_ki32_pack(pad(unpack_qweight(qweight)[:k_in][perm]))``
    with zero-code K rows >= k_in and zero columns >= n."""
    return _i32_repack("repack_ki32", qweight, perm, k_in, k_out, n, n_out, gs, 8)


def pack_ki32_values(values, perm, k_in, k_out, n, n_out, gs):
    """ki32 pack from unpacked uint32 codes (3-bit path); None if no lib."""
    return _i32_repack("pack_ki32_values", values, perm, k_in, k_out, n, n_out, gs, 8)


def repack_k2i32(qweight, perm, k_in, k_out, n, n_out, gs):
    """Fused reference-2-bit-qweight -> k2i32 runtime words; None if no lib."""
    return _i32_repack("repack_k2i32", qweight, perm, k_in, k_out, n, n_out, gs, 16)


__all__ = [
    "available", "pack_rows", "unpack_rows", "repack_kint4", "repack_planar",
    "repack_ki32", "pack_ki32_values", "repack_k2i32",
]
