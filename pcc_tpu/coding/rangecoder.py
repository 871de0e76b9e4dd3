"""Arithmetic coding of quantized latents against float CDFs.

API mirror of the torchac calls in the reference
(`encode_float_cdf(cdf, sym)` / `decode_float_cdf(cdf, bytes)`,
compress.py:134-136, decompress.py:92-93). The heavy lifting is the C++
range coder in _native/rangecoder.cpp (auto-compiled on first use, loaded
via ctypes); a pure-Python mirror of the identical coder serves as fallback
and as a cross-check in tests.

Float CDFs are quantized to integers with 16-bit precision plus an +arange
staircase so every symbol keeps probability >= 2^-16 — the same guard
torchac applies so zero-probability symbols remain codable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

PRECISION = 16

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librangecoder.so")
_lib = None
_lib_failed = False


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    src = os.path.join(_NATIVE_DIR, "rangecoder.cpp")
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _LIB_PATH, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rc_encode.restype = ctypes.c_int64
        lib.rc_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.rc_decode.restype = ctypes.c_int64
        lib.rc_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.rc_encode_bounds.restype = ctypes.c_int64
        lib.rc_encode_bounds.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


def quantize_cdf(cdf_float: np.ndarray) -> np.ndarray:
    """[..., Lp] float cdf (leading 0, final ~1) -> int32 cdf rows.

    Monotonicity is enforced by a running max plus a strict +arange
    staircase; every row total is exactly 2^16 - 1.
    """
    cdf_float = np.asarray(cdf_float, dtype=np.float64)
    Lp = cdf_float.shape[-1]
    scaled = np.round(np.clip(cdf_float, 0.0, 1.0) * ((1 << PRECISION) - Lp))
    scaled = np.maximum.accumulate(scaled, axis=-1)
    return (scaled + np.arange(Lp)).astype(np.int32)


def encode_float_cdf(cdf_float: np.ndarray, sym: np.ndarray,
                     force_python: bool = False) -> bytes:
    """Encode int symbols [n] under per-slot float CDFs [n, Lp] -> bytes."""
    return encode_quantized_cdf(quantize_cdf(cdf_float), sym,
                                force_python=force_python)


def encode_quantized_cdf(cdf_int: np.ndarray, sym: np.ndarray,
                         force_python: bool = False) -> bytes:
    """Encode under pre-quantized integer CDF rows [n, Lp] (the
    quantize_cdf staircase — or pmf.pmf_to_quantized_cdf computed on
    device, which lets the host fetch uint16 instead of float32)."""
    cdf = np.ascontiguousarray(
        np.asarray(cdf_int, dtype=np.int32).reshape(-1, cdf_int.shape[-1]))
    syms = np.ascontiguousarray(np.asarray(sym, dtype=np.int16).reshape(-1))
    n, Lp = cdf.shape
    assert syms.shape[0] == n, (syms.shape, cdf.shape)
    lib = None if force_python else _load_native()
    if lib is not None:
        cap = max(1024, 4 * n)
        out = np.zeros(cap, dtype=np.uint8)
        written = lib.rc_encode(
            cdf.ctypes.data, n, Lp, syms.ctypes.data, out.ctypes.data, cap
        )
        if written < 0:
            raise ValueError("range coder encode failed (bad symbol or overflow)")
        return out[:written].tobytes()
    return _py_encode(cdf, syms)


def encode_bounds(start: np.ndarray, size: np.ndarray, total: int,
                  force_python: bool = False) -> bytes:
    """Encode from per-symbol (start, size) interval pairs under one shared
    row total — the encoder-side shortcut for CDFs whose total is a known
    constant (the integer staircase always totals 2^16 - 1). Produces the
    same bytes as encode_quantized_cdf over the full rows; the device
    computes start/size exactly (iprob.iprob_encode_bounds), so the host
    never sees the PMF weights on the encode path."""
    starts = np.ascontiguousarray(np.asarray(start, np.uint16).reshape(-1))
    sizes = np.ascontiguousarray(np.asarray(size, np.uint16).reshape(-1))
    n = starts.shape[0]
    assert sizes.shape[0] == n
    lib = None if force_python else _load_native()
    if lib is not None:
        cap = max(1024, 4 * n)
        out = np.zeros(cap, dtype=np.uint8)
        written = lib.rc_encode_bounds(
            starts.ctypes.data, sizes.ctypes.data, n, total,
            out.ctypes.data, cap)
        if written < 0:
            raise ValueError(
                "range coder encode failed (zero-size or out-of-total bound)")
        return out[:written].tobytes()
    return _py_encode_bounds(starts, sizes, total)


def decode_float_cdf(cdf_float: np.ndarray, byte_stream: bytes,
                     force_python: bool = False) -> np.ndarray:
    """Decode bytes into int16 symbols shaped like cdf_float.shape[:-1]."""
    return decode_quantized_cdf(quantize_cdf(cdf_float), byte_stream,
                                force_python=force_python)


def decode_quantized_cdf(cdf_int: np.ndarray, byte_stream: bytes,
                         force_python: bool = False) -> np.ndarray:
    """Decode under pre-quantized integer CDF rows (see
    encode_quantized_cdf)."""
    shape = cdf_int.shape[:-1]
    cdf = np.ascontiguousarray(
        np.asarray(cdf_int, dtype=np.int32).reshape(-1, cdf_int.shape[-1]))
    n, Lp = cdf.shape
    lib = None if force_python else _load_native()
    if lib is not None:
        syms = np.zeros(n, dtype=np.int16)
        buf = np.ascontiguousarray(np.frombuffer(byte_stream, dtype=np.uint8))
        rc = lib.rc_decode(
            cdf.ctypes.data, n, Lp, buf.ctypes.data, len(buf), syms.ctypes.data
        )
        if rc != 0:
            raise ValueError("range coder decode failed")
        return syms.reshape(shape)
    return _py_decode(cdf, byte_stream).reshape(shape)


# ---------------------------------------------------------------------------
# Pure-Python mirror of the C++ coder (fallback + cross-check in tests).
# ---------------------------------------------------------------------------

_TOP = 1 << 24
_M32 = 0xFFFFFFFF


def _py_encode(cdf: np.ndarray, syms: np.ndarray) -> bytes:
    out = bytearray()
    low = 0          # uint64 semantics
    rng = _M32
    cache = 0
    cache_size = 1

    def shift_low():
        nonlocal low, cache, cache_size
        if (low & _M32) < 0xFF000000 or (low >> 32) != 0:
            carry = low >> 32
            b = cache
            while True:
                out.append((b + carry) & 0xFF)
                b = 0xFF
                cache_size -= 1
                if cache_size == 0:
                    break
            cache = (low >> 24) & 0xFF
        cache_size += 1
        low = ((low & _M32) << 8) & _M32

    for i in range(cdf.shape[0]):
        row = cdf[i]
        s = int(syms[i])
        start, size, total = int(row[s]), int(row[s + 1] - row[s]), int(row[-1])
        rng //= total
        low += start * rng
        rng *= size
        while rng < _TOP:
            shift_low()
            rng = (rng << 8) & _M32
    for _ in range(5):
        shift_low()
    return bytes(out)


def _py_encode_bounds(starts: np.ndarray, sizes: np.ndarray,
                      total: int) -> bytes:
    rows = np.stack([starts.astype(np.int32),
                     starts.astype(np.int32) + sizes.astype(np.int32),
                     np.full(starts.shape, total, np.int32)], axis=-1)
    # row layout [start, start+size, total] with sym=0 reproduces the exact
    # (start, size, total) triple sequence of the full-row coder
    return _py_encode(rows, np.zeros(starts.shape[0], np.int16))


def _py_decode(cdf: np.ndarray, byte_stream: bytes) -> np.ndarray:
    data = byte_stream
    pos = 0
    code = 0         # uint32 semantics
    rng = _M32

    def get():
        nonlocal pos
        b = data[pos] if pos < len(data) else 0
        pos += 1
        return b

    for _ in range(5):
        code = ((code << 8) | get()) & _M32

    n, Lp = cdf.shape
    syms = np.zeros(n, dtype=np.int16)
    for i in range(n):
        row = cdf[i]
        total = int(row[-1])
        rng //= total
        target = min(code // rng, total - 1)
        s = int(np.searchsorted(row, target, side="right")) - 1
        s = min(max(s, 0), Lp - 2)
        start, size = int(row[s]), int(row[s + 1] - row[s])
        code = (code - start * rng) & _M32
        rng *= size
        while rng < _TOP:
            code = ((code << 8) | get()) & _M32
            rng = (rng << 8) & _M32
        syms[i] = s
    return syms
