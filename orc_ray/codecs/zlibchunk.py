"""ORC-style chunked zlib block compression with store-uncompressed fallback.

Re-creation of /root/reference/compressioncodec.go:169-217 (flate encoder
with per-chunk "keep original if compression grows the data"),
:302-314 (3-byte chunk header ``(len << 1) | isOriginal``) and the
BufferedWriter chunking (/root/reference/buffererwriter.go:10-173, 256 KiB
chunks). Raw DEFLATE (no zlib wrapper), like the reference's flate streams.
"""

from __future__ import annotations

import zlib

DEFAULT_CHUNK = 256 * 1024  # writer.go:25 DefaultCompressionChunkSize
MAX_CHUNK = 2 ** 23  # header length field is 23 bits


def _header(length: int, original: bool) -> bytes:
    v = (length << 1) | (1 if original else 0)
    return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])


def compress(data: bytes, chunk_size: int = DEFAULT_CHUNK, level: int = -1) -> bytes:
    if chunk_size > MAX_CHUNK:
        raise ValueError(f"chunk size {chunk_size} exceeds {MAX_CHUNK}")
    out = bytearray()
    for i in range(0, len(data), chunk_size):
        chunk = data[i: i + chunk_size]
        comp = zlib.compressobj(level, zlib.DEFLATED, -15)
        cd = comp.compress(chunk) + comp.flush()
        if len(cd) >= len(chunk):
            out += _header(len(chunk), True)
            out += chunk
        else:
            out += _header(len(cd), False)
            out += cd
    return bytes(out)


def chunk_offsets(data: bytes) -> list[int]:
    """Compressed byte offset of each chunk (raw offsets are implicit:
    chunk i covers raw bytes [i*chunk_size, (i+1)*chunk_size)). Stored in
    stream metadata so range reads can decompress only covering chunks."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        out.append(pos)
        h = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3 + (h >> 1)
    return out


def decompress(data: bytes) -> bytearray:
    # appends into one bytearray and returns it directly — the final
    # ``bytes(out)`` of the original version re-copied every decoded
    # stream (deflate self-describes length, so unlike zstdchunk the
    # output can't be preallocated without a second header walk)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        h = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        length = h >> 1
        if h & 1:  # original
            out += data[pos: pos + length]
        else:
            out += zlib.decompress(data[pos: pos + length], -15)
        pos += length
    return out
