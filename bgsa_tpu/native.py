"""ctypes loader for the native host-runtime library (native/bgsa_native.cpp).

Builds libbgsa_native.so on first use (g++ -O3 -shared) into a cache dir and
exposes the fast paths; every caller has a pure-Python fallback, so a missing
toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native",
                    "bgsa_native.cpp")


def _build(so_path: str) -> bool:
    # Compile to a process-private temp name, then atomically rename:
    # concurrent --host roles on one machine all build on first use, and a
    # peer must never CDLL a half-written .so.
    tmp = f"{so_path}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("BGSA_NO_NATIVE"):
            return None
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "bgsa_tpu", "native"
        )
        so_path = os.path.join(cache, "libbgsa_native.so")
        try:
            os.makedirs(cache, exist_ok=True)
            src_mtime = os.path.getmtime(_SRC)
            if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
                if not _build(so_path):
                    return None
            lib = ctypes.CDLL(so_path)
        except Exception:
            return None
        lib.bgsa_convert_result.restype = ctypes.c_int
        lib.bgsa_convert_result.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bgsa_pack_banded.restype = None
        lib.bgsa_pack_eq.restype = None
        lib.bgsa_two_bit_pack.restype = None
        lib.bgsa_nibble_pack.restype = None
        lib.bgsa_count_n.restype = ctypes.c_int64
        _lib = lib
        return _lib


def convert_result(result_path: str, out_path: str, itemsize: int,
                   ref_bucket_count: int) -> bool:
    """Native blocked-result conversion; returns False if unavailable/failed."""
    lib = get_lib()
    if lib is None:
        return False
    rc = lib.bgsa_convert_result(
        result_path.encode(), (result_path + ".info").encode(), out_path.encode(),
        itemsize, ref_bucket_count,
    )
    return rc == 0


def pack_banded(codes: np.ndarray, k: int, query_len: int, threads: int = 1):
    """Native banded packing; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    S, L = codes.shape
    n_inj = max(query_len - k, 1)
    W = -(-n_inj // 32)
    init_lo = np.empty((5, S), np.uint32)
    init_hi = np.empty((5, S), np.uint32)
    inj = np.empty((5, W, S), np.uint32)
    lib.bgsa_pack_banded(
        codes.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(S), ctypes.c_int64(L),
        ctypes.c_int32(k), ctypes.c_int32(query_len),
        init_lo.ctypes.data_as(ctypes.c_void_p), init_hi.ctypes.data_as(ctypes.c_void_p),
        inj.ctypes.data_as(ctypes.c_void_p), ctypes.c_int32(W),
        ctypes.c_int32(threads),
    )
    return init_lo, init_hi, inj


def transport_pack(codes: np.ndarray, two_bit: bool, threads: int = 1):
    """Native 2-bit / nibble transport packing; returns None if unavailable.

    ``threads`` fans the row loop out over std::threads (the reference's
    handle_reads runs under its -N-thread OpenMP region); ctypes releases
    the GIL for the call, so the pipeline's reader thread keeps running.
    """
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    S, L = codes.shape
    W = -(-L // 4) if two_bit else -(-L // 2)
    out = np.empty((S, W), np.uint8)
    fn = lib.bgsa_two_bit_pack if two_bit else lib.bgsa_nibble_pack
    fn(codes.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(S),
       ctypes.c_int64(L), out.ctypes.data_as(ctypes.c_void_p),
       ctypes.c_int32(threads))
    return out


def count_n(codes: np.ndarray):
    """Native count of N codes (> 3); returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    return int(lib.bgsa_count_n(codes.ctypes.data_as(ctypes.c_void_p),
                                ctypes.c_int64(codes.size)))


def pack_eq(codes: np.ndarray, word_bits: int):
    """Native Eq packing; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    S, L = codes.shape
    W = -(-L // word_bits)
    eq = np.empty((5, W, S), np.uint32)
    lib.bgsa_pack_eq(
        codes.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(S), ctypes.c_int64(L),
        ctypes.c_int32(word_bits), eq.ctypes.data_as(ctypes.c_void_p), ctypes.c_int32(W),
    )
    return eq
