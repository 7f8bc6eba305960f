"""LEB128 varints + zigzag transform (ORC flavour).

Re-creation of the integer byte-level primitives of the reference
(/root/reference/utils.go:704-750 writeVulong/writeVslong/readVulong/readVslong,
/root/reference/utils.go:1196-1204 zigzagEncode/zigzagDecode). Varints appear
only in chunk headers (one or two per RLE run), so the scalar paths here are
not hot; the zigzag transform is vectorized because it touches every value.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_I64 = np.int64


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Vectorized zigzag: int64 -> uint64, small magnitudes -> small codes."""
    v = np.ascontiguousarray(v, dtype=_I64)
    u = v.view(_U64)
    sign = (v >> np.int64(63)).view(_U64)  # 0 or 0xFFFF...FF
    return (u << _U64(1)) ^ sign


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """Vectorized inverse zigzag: uint64 -> int64."""
    u = np.ascontiguousarray(u, dtype=_U64)
    neg = (_U64(0) - (u & _U64(1)))  # wraps: 0 or 0xFFFF...FF
    return ((u >> _U64(1)) ^ neg).view(_I64)


def zigzag_encode32(v: np.ndarray) -> np.ndarray:
    """32-bit zigzag: int32 -> uint32 (equals the int64 zigzag for values in
    int32 range, at half the memory traffic)."""
    v = np.ascontiguousarray(v, dtype=np.int32)
    u = v.view(np.uint32)
    sign = (v >> np.int32(31)).view(np.uint32)
    return (u << np.uint32(1)) ^ sign


def zigzag_encode_scalar(v: int) -> int:
    """Scalar zigzag on a 64-bit-wrapped Python int -> unsigned value."""
    v &= 0xFFFFFFFFFFFFFFFF
    sign = 0xFFFFFFFFFFFFFFFF if v >> 63 else 0
    return ((v << 1) ^ sign) & 0xFFFFFFFFFFFFFFFF


def zigzag_decode_scalar(u: int) -> int:
    u &= 0xFFFFFFFFFFFFFFFF
    r = (u >> 1) ^ ((0 - (u & 1)) & 0xFFFFFFFFFFFFFFFF)
    return r - (1 << 64) if r >> 63 else r


def write_vulong(out: bytearray, value: int) -> None:
    """Unsigned LEB128 of the low 64 bits of ``value`` (negative ints are
    treated as their two's-complement uint64, like the reference's int64
    unsigned shift loop)."""
    value &= 0xFFFFFFFFFFFFFFFF
    while True:
        if value & ~0x7F == 0:
            out.append(value)
            return
        out.append(0x80 | (value & 0x7F))
        value >>= 7


def write_vslong(out: bytearray, value: int) -> None:
    write_vulong(out, zigzag_encode_scalar(value))


def read_vulong(buf, pos: int) -> tuple[int, int]:
    """Returns (value_as_uint64, new_pos)."""
    result = 0
    offset = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << offset
        offset += 7
        if not b & 0x80:
            return result & 0xFFFFFFFFFFFFFFFF, pos


def read_vslong(buf, pos: int) -> tuple[int, int]:
    u, pos = read_vulong(buf, pos)
    return zigzag_decode_scalar(u), pos
