"""ORC byte-level RLE + boolean bitstream.

Re-creation of /root/reference/runlengthbytewriter.go:22-119 /
runlengthbytereader.go:17-99 (byte RLE: runs of 3..130 -> [count-3, value],
literal groups of 1..128 -> [256-count, bytes...]) and
/root/reference/booleanwriter.go:13-62 / booleanreader.go:13-49 (bools packed
MSB-first into bytes, then byte-RLE). Vectorized run detection instead of the
reference's per-byte state machine; output segmentation is byte-identical
(same min-repeat-3 / literal-128 / repeat-130 boundaries, including the
carve-out of a >=3 equal tail from a literal group).
"""

from __future__ import annotations

import numpy as np

MIN_REPEAT = 3
MAX_LITERAL = 128
MAX_REPEAT = 130


def encode_bytes(data: np.ndarray) -> bytes:
    """Byte-RLE encode a uint8 array."""
    v = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(v)
    out = bytearray()
    if n == 0:
        return b""
    eq = v[1:] == v[:-1]
    if n >= 3:
        triple_idx = np.flatnonzero(eq[:-1] & eq[1:])
    else:
        triple_idx = np.empty(0, dtype=np.int64)
    change = np.flatnonzero(~eq)
    c = 0
    while c < n:
        if c + 2 < n and eq[c] and eq[c + 1]:
            j = np.searchsorted(change, c)
            run_end = int(change[j]) + 1 if j < len(change) else n
            L = run_end - c
            while L >= MIN_REPEAT:
                k = min(L, MAX_REPEAT)
                out.append(k - MIN_REPEAT)
                out.append(int(v[c]))
                c += k
                L -= k
            if L == 0:
                continue
            # 1-2 leftover equal bytes fall into the literal group
        s = c
        j = np.searchsorted(triple_idx, s, side="right")
        t = int(triple_idx[j]) if j < len(triple_idx) else -1
        if t != -1 and t + 2 <= s + MAX_LITERAL - 1:
            if t > s:
                out.append(256 - (t - s))
                out.extend(v[s:t].tobytes())
            c = t
        else:
            e = min(s + MAX_LITERAL, n)
            out.append(256 - (e - s))
            out.extend(v[s:e].tobytes())
            c = e
    return bytes(out)


def decode_bytes(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode a byte-RLE stream to a uint8 array."""
    chunks: list[np.ndarray] = []
    pos = 0
    total = 0
    size = len(buf)
    while pos < size and (n is None or total < n):
        ctrl = buf[pos]
        pos += 1
        if ctrl < 0x80:  # repeat
            l = ctrl + MIN_REPEAT
            chunks.append(np.full(l, buf[pos], dtype=np.uint8))
            pos += 1
        else:  # literal group
            l = 256 - ctrl
            chunks.append(np.frombuffer(buf, dtype=np.uint8, count=l, offset=pos))
            pos += l
        total += l
    out = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
    if n is not None:
        out = out[:n]
    return out


def encode_bools(bits: np.ndarray) -> bytes:
    """Booleans -> MSB-first bit bytes -> byte RLE (the PRESENT stream
    carrier). Trailing partial byte is zero-padded low, like the reference's
    flushBools."""
    b = np.ascontiguousarray(bits, dtype=bool)
    if len(b) == 0:
        return b""
    return encode_bytes(np.packbits(b))


def decode_bools(buf: bytes, n: int) -> np.ndarray:
    nbytes = (n + 7) // 8
    raw = decode_bytes(buf, nbytes)
    return np.unpackbits(raw)[:n].astype(bool)
