"""ctypes bindings for the native safetensors reader (csrc/).

The native library mmaps cache payload files and copies a tensor's bytes
straight into a numpy buffer — the data-loader hot path without per-read
JSON parsing.  Builds on demand with ``make -C csrc``; every caller has a
pure-Python fallback, so the framework runs identically without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libfast_safetensors.so"
_lib = None
_lib_failed = False


def _load_library(build: bool = True):
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists() and build and (_CSRC / "Makefile").exists():
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fast_st_read_tensor.restype = ctypes.c_longlong
        lib.fast_st_read_tensor.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
        lib.fast_st_tensor_nbytes.restype = ctypes.c_longlong
        lib.fast_st_tensor_nbytes.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        _lib = lib
    except Exception:  # noqa: BLE001 — missing toolchain -> Python fallback
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load_library() is not None


def read_tensor_bytes(path, name: str) -> np.ndarray | None:
    """Raw tensor bytes as a uint8 array, or None (missing tensor or no lib)."""
    lib = _load_library()
    if lib is None:
        return None
    p = str(path).encode()
    n = name.encode()
    nbytes = lib.fast_st_tensor_nbytes(p, n)
    if nbytes <= 0:
        return None
    out = np.empty(nbytes, np.uint8)
    got = lib.fast_st_read_tensor(
        p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nbytes)
    if got != nbytes:
        return None
    return out


def read_tensor(path, name: str, dtype, shape) -> np.ndarray | None:
    """Typed tensor read via the native library (None -> use Python path)."""
    raw = read_tensor_bytes(path, name)
    if raw is None:
        return None
    return raw.view(np.dtype(dtype)).reshape(shape)
