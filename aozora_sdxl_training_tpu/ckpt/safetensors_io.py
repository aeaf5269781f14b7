"""Streaming safetensors IO (read lazily, write tensor-by-tensor).

A hand-rolled writer in the spirit of the reference's streaming save
(/root/reference/train_anima.py:1499-1538): header with precomputed offsets,
tensors streamed straight to disk in order, tmp-file + atomic rename, and a
post-write verification pass (keys + shapes + dtypes).  Unlike the library's
``save_file`` this never materialises the whole checkpoint in memory — a
6.9 GB SDXL merge-back writes at disk speed with one tensor resident.

Readers use ``safe_open`` streaming; bf16 round-trips through ml_dtypes
(numpy has no native bfloat16).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import ml_dtypes
import numpy as np

_DTYPE_TO_ST = {
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(ml_dtypes.bfloat16): "BF16",
    np.dtype(ml_dtypes.float8_e4m3fn): "F8_E4M3",
    np.dtype(ml_dtypes.float8_e5m2): "F8_E5M2",
    np.dtype(np.float64): "F64",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.bool_): "BOOL",
}
_ST_TO_DTYPE = {v: k for k, v in _DTYPE_TO_ST.items()}


_FLOAT_DTYPES = frozenset(
    np.dtype(d) for d in (np.float64, np.float32, np.float16,
                          ml_dtypes.bfloat16, ml_dtypes.float8_e4m3fn,
                          ml_dtypes.float8_e5m2))


def is_float_dtype(dtype) -> bool:
    """True for any float dtype INCLUDING the ml_dtypes extension types.

    numpy reports bfloat16/float8 as kind 'V' (void), so ``dtype.kind ==
    'f'`` silently misses them — which made the quantizer/GGUF exporter
    skip every tensor of a BF16 checkpoint (the trainers' standard output
    format)."""
    d = np.dtype(dtype)
    return d.kind == "f" or d in _FLOAT_DTYPES


_F8_DTYPES = frozenset(np.dtype(d) for d in (ml_dtypes.float8_e4m3fn,
                                             ml_dtypes.float8_e5m2))


def is_requantizable_dtype(dtype) -> bool:
    """True for f64/f32/f16/bf16 — raw float weights a quantizer may convert.

    Deliberately EXCLUDES the float8 dtypes: an f8 tensor in a checkpoint is
    already a quantized code tensor whose values are meaningless without its
    scale sidecar, so re-quantizing or dtype-casting it would corrupt it.
    Use ``is_float_dtype`` when f8 should count as float (e.g. raw IO)."""
    d = np.dtype(dtype)
    return is_float_dtype(d) and d not in _F8_DTYPES


def st_dtype_name(dtype) -> str:
    return _DTYPE_TO_ST[np.dtype(dtype)]


def numpy_dtype_for(st_name: str):
    return _ST_TO_DTYPE[st_name]


def write_streaming(path, tensors, metadata: dict | None = None) -> None:
    """Write ``{name: array-like}`` to safetensors format, streaming.

    ``tensors`` maps names to numpy arrays (any bf16 via ml_dtypes) or
    callables returning one (lazy production, e.g. layout-transposing a
    device array only when its turn comes).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    # First pass: shapes/dtypes. Callables must also expose .shape/.dtype via
    # a (shape, dtype, fn) tuple.
    entries = {}
    offset = 0
    for name, value in tensors.items():
        if callable(value):
            raise TypeError(
                "lazy tensors must be (shape, dtype, callable) tuples")
        if isinstance(value, tuple):
            shape, dtype, _ = value
            shape = tuple(int(s) for s in shape)
            nbytes = int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize
        else:
            arr = np.asarray(value)
            shape, dtype, nbytes = arr.shape, arr.dtype, arr.nbytes
        entries[name] = {
            "dtype": st_dtype_name(dtype),
            "shape": list(shape),
            "data_offsets": [offset, offset + nbytes],
        }
        offset += nbytes

    header: dict = dict(entries)
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    header_bytes = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad to 8-byte alignment (spec allows trailing spaces)
    pad = (8 - len(header_bytes) % 8) % 8
    header_bytes += b" " * pad

    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        for name, value in tensors.items():
            if isinstance(value, tuple):
                shape, dtype, fn = value
                arr = np.asarray(fn())
                arr = arr.astype(dtype, copy=False).reshape(shape)
            else:
                arr = np.ascontiguousarray(np.asarray(value))
            f.write(arr.tobytes())
            del arr
    tmp.replace(path)
    verify_file(path, entries)


def verify_file(path, expected_entries: dict) -> None:
    """Post-write check: every key present with matching shape/dtype/offsets."""
    written = read_header(path)
    for name, spec in expected_entries.items():
        got = written.get(name)
        if got is None:
            raise IOError(f"verification failed: {name} missing from {path}")
        if (got["dtype"] != spec["dtype"] or got["shape"] != spec["shape"]
                or got["data_offsets"] != spec["data_offsets"]):
            raise IOError(f"verification failed for {name}: {got} != {spec}")


def read_header(path) -> dict:
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    header.pop("__metadata__", None)
    return header


def read_metadata(path) -> dict:
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    return header.get("__metadata__", {}) or {}


def read_tensor(path, name: str):
    """Read one tensor as numpy (bf16 via ml_dtypes)."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
        spec = header[name]
        start, end = spec["data_offsets"]
        f.seek(8 + n + start)
        raw = f.read(end - start)
    dtype = numpy_dtype_for(spec["dtype"])
    return np.frombuffer(raw, dtype=dtype).reshape(spec["shape"])


def load_all(path, keys=None) -> dict:
    """Load many tensors; single sequential read of the data section."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
        header.pop("__metadata__", None)
        base = 8 + n
        wanted = set(keys) if keys is not None else None
        out = {}
        for name, spec in sorted(header.items(),
                                 key=lambda kv: kv[1]["data_offsets"][0]):
            if wanted is not None and name not in wanted:
                continue
            start, end = spec["data_offsets"]
            f.seek(base + start)
            raw = f.read(end - start)
            out[name] = np.frombuffer(
                raw, dtype=numpy_dtype_for(spec["dtype"])).reshape(spec["shape"])
    return out
