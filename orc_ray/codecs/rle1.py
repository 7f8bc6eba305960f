"""ORC RLEv1 integer codec (legacy compatibility).

Re-creation of /root/reference/runlengthintegerwriter.go:28-158 /
runlengthintegerreader.go:20-122: runs of 3..130 values in arithmetic
progression with a byte delta in [-128, 127] encode as
``[count-3, delta_byte, base_varint]``; other values collect into literal
groups of up to 128 varints encoded as ``[256-count, varints...]``.

RLEv2 strictly dominates it for size (SURVEY.md §2.2 C6); this exists for
coverage/compatibility. The encoder derives the same flush boundaries as
the reference's per-value state machine: a >=3 arithmetic tail is carved
out of a literal group; a delta change inside a run restarts tracking from
the last pair.
"""

from __future__ import annotations

import numpy as np

from .varint import (
    read_vslong,
    read_vulong,
    write_vslong,
    write_vulong,
)

MIN_REPEAT = 3
MAX_REPEAT = 130
MAX_LITERAL = 128
MIN_DELTA = -128
MAX_DELTA = 127

_I64 = np.int64


def encode(values: np.ndarray, signed: bool) -> bytes:
    """Emulates WriteInt/Flush flush boundaries over vectorized delta-run
    detection, then emits per segment."""
    v = np.ascontiguousarray(values, dtype=_I64)
    n = len(v)
    out = bytearray()
    if n == 0:
        return b""
    deltas = (v[1:] - v[:-1]) if n > 1 else np.empty(0, _I64)
    ok = (deltas >= MIN_DELTA) & (deltas <= MAX_DELTA)
    # same-delta adjacent pairs: arithmetic run of >=3 values needs two
    # consecutive equal in-range deltas
    same = ok[:-1] & ok[1:] & (deltas[:-1] == deltas[1:]) if n > 2 else np.empty(0, bool)
    run_start_idx = np.flatnonzero(same)  # value-index where a 3-run starts
    # arithmetic run ends: for a run starting at t, extend while delta stays
    change = np.flatnonzero(~(ok[:-1] & ok[1:] & (deltas[:-1] == deltas[1:]))) if n > 2 else np.empty(0, np.int64)

    run_starts = run_start_idx.tolist()
    c = 0
    ri = 0
    nruns = len(run_starts)
    while c < n:
        # find first arithmetic 3-run starting at or after c
        while ri < nruns and run_starts[ri] < c:
            ri += 1
        t = run_starts[ri] if ri < nruns else -1
        if t == c:
            # run from c: extend while deltas equal
            d = int(deltas[c])
            e = c + 2
            while e + 1 <= n - 1 and int(deltas[e]) == d and e + 1 - c < MAX_REPEAT:
                e += 1
            e += 1  # exclusive end (number of values)
            L = e - c
            out.append(L - MIN_REPEAT)
            out.append(d & 0xFF)
            if signed:
                write_vslong(out, int(v[c]))
            else:
                write_vulong(out, int(v[c]))
            c = e
        else:
            # literal group until next run start (or cap/end)
            lim = t if t != -1 else n
            e = min(lim, c + MAX_LITERAL, n)
            out.append(256 - (e - c))
            for x in v[c:e].tolist():
                if signed:
                    write_vslong(out, x)
                else:
                    write_vulong(out, x)
            c = e
    return bytes(out)


def decode(buf: bytes, signed: bool, n: int | None = None) -> np.ndarray:
    chunks = []
    pos = 0
    size = len(buf)
    total = 0
    while pos < size and (n is None or total < n):
        ctrl = buf[pos]
        pos += 1
        if ctrl < 0x80:
            l = ctrl + MIN_REPEAT
            delta = buf[pos]
            if delta >= 0x80:
                delta -= 256
            pos += 1
            if signed:
                base, pos = read_vslong(buf, pos)
            else:
                u, pos = read_vulong(buf, pos)
                base = u - (1 << 64) if u >> 63 else u
            chunks.append(np.int64(base) + np.int64(delta) * np.arange(l, dtype=_I64))
            total += l
        else:
            l = 256 - ctrl
            vals = np.empty(l, dtype=_I64)
            for i in range(l):
                if signed:
                    x, pos = read_vslong(buf, pos)
                else:
                    u, pos = read_vulong(buf, pos)
                    x = u - (1 << 64) if u >> 63 else u
                vals[i] = x
            chunks.append(vals)
            total += l
    out = np.concatenate(chunks) if chunks else np.empty(0, dtype=_I64)
    return out[:n] if n is not None else out
