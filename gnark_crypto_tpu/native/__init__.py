"""ctypes bindings for the native host-ops library (hostops.cpp).

Builds lazily with g++ into _build/ on first use; every entry point has a
pure-Python fallback, so the package works without a toolchain (the analogue
of the reference's purego build tag).  See hostops.cpp for the layout
contract (AoS (n, nl) uint32 limbs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD_DIR, "libgcthostops.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    tmp = _SO + ".tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return _SO
    except Exception:
        try:
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
            return _SO
        except Exception:
            return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GCT_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.gct_mont_mul_batch.argtypes = [
            u32p, u32p, u32p, u32p,
            ctypes.c_uint32, ctypes.c_int, ctypes.c_longlong, ctypes.c_int,
        ]
        lib.gct_bytes_to_limbs.argtypes = [
            u8p, u32p, ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
        ]
        lib.gct_limbs_to_bytes.argtypes = [
            u32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
        ]
        lib.gct_geq_q_batch.argtypes = [
            u32p, u8p, u32p, ctypes.c_int, ctypes.c_longlong,
        ]
        _lib = lib
        return _lib


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def mont_mul_batch(spec, a_aos: np.ndarray, b_aos: np.ndarray) -> np.ndarray | None:
    """out[i] = a[i]*b[i]*R^-1 mod q.  a_aos: (n, nl) uint32 C-contiguous;
    b_aos: (n, nl) or (nl,) broadcast.  Returns None if native lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    a_aos = np.ascontiguousarray(a_aos, dtype=np.uint32)
    b_aos = np.ascontiguousarray(b_aos, dtype=np.uint32)
    n, nl = a_aos.shape
    assert nl == spec.n_limbs and nl <= 64
    out = np.empty_like(a_aos)
    q = np.ascontiguousarray(spec.q_limbs, dtype=np.uint32)
    lib.gct_mont_mul_batch(
        _u32p(a_aos), _u32p(b_aos), _u32p(out), _u32p(q),
        ctypes.c_uint32(spec.qinv_neg), nl, n, 1 if b_aos.ndim == 2 else 0,
    )
    return out


def bytes_to_limbs(data: bytes | np.ndarray, nbytes: int, nl: int) -> np.ndarray | None:
    """(n*nbytes,) big-endian bytes -> (n, nl) uint32 limbs (AoS)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = buf.shape[0] // nbytes
    out = np.empty((n, nl), dtype=np.uint32)
    lib.gct_bytes_to_limbs(_u8p(buf), _u32p(out), nbytes, nl, n)
    return out


def limbs_to_bytes(limbs_aos: np.ndarray, nbytes: int) -> np.ndarray | None:
    """(n, nl) uint32 limbs -> (n, nbytes) big-endian bytes."""
    lib = get_lib()
    if lib is None:
        return None
    limbs_aos = np.ascontiguousarray(limbs_aos, dtype=np.uint32)
    n, nl = limbs_aos.shape
    out = np.empty((n, nbytes), dtype=np.uint8)
    lib.gct_limbs_to_bytes(_u32p(limbs_aos), _u8p(out), nbytes, nl, n)
    return out


def geq_q_batch(spec, limbs_aos: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    limbs_aos = np.ascontiguousarray(limbs_aos, dtype=np.uint32)
    n, nl = limbs_aos.shape
    out = np.empty((n,), dtype=np.uint8)
    q = np.ascontiguousarray(spec.q_limbs, dtype=np.uint32)
    lib.gct_geq_q_batch(_u32p(limbs_aos), _u8p(out), _u32p(q), nl, n)
    return out
