"""Snappy block decoder (decode-only, matching the reference's support:
/root/reference/compressioncodec.go:222-284 decodes snappy streams while
its encoder is unimplemented, :286-300, and SetCompression rejects snappy
for writes, writer.go:70-87).

Implements the raw snappy block format (public format description:
google/snappy format_description.txt): varint uncompressed length, then
tagged elements — 2-bit tag: 00 literal, 01/10/11 copies with 1/2/4-byte
little-endian offsets. Pure Python: this is a compatibility path for
reading foreign streams, not a hot kernel (our own streams use
zlib/none — exactly the codecs the reference can write)."""

from __future__ import annotations


def decompress_raw(data: bytes) -> bytes:
    """Decompress one raw snappy block."""
    # varint uncompressed length
    n = 0
    shift = 0
    pos = 0
    while True:
        b = data[pos]
        n |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    size = len(data)
    while pos < size:
        tag = data[pos]
        pos += 1
        kind = tag & 0x3
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = int.from_bytes(data[pos: pos + extra], "little") + 1
                pos += extra
            out += data[pos: pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos: pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos: pos + 4], "little")
            pos += 4
        if offset == 0:
            raise ValueError("snappy: zero copy offset")
        start = len(out) - offset
        if start < 0:
            raise ValueError("snappy: offset before start")
        # overlapping copies are byte-at-a-time by definition
        if offset >= length:
            out += out[start: start + length]
        else:
            for i in range(length):
                out.append(out[start + i])
    if len(out) != n:
        raise ValueError(f"snappy: size mismatch {len(out)} != {n}")
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decompress an ORC-framed snappy stream: sequence of 3-byte chunk
    headers ``(len << 1) | isOriginal`` followed by snappy blocks (the
    same framing as the zlib codec, compressioncodec.go:302-314)."""
    out = bytearray()
    pos = 0
    size = len(data)
    while pos < size:
        h = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        length = h >> 1
        if h & 1:  # stored uncompressed
            out += data[pos: pos + length]
        else:
            out += decompress_raw(data[pos: pos + length])
        pos += length
    return bytes(out)
