"""ORC timestamp split codec: DATA = seconds since 2015-01-01 (signed),
SECONDARY = nanos with trailing-zero count packed in the low 3 bits.

Re-creation of /root/reference/treewriter.go:913-1031 (write),
/root/reference/treereader.go:133-195 (read, base constant :128-131) and
formatNanos (/root/reference/utils.go:1206-1220), vectorized.

A timestamp ns value t splits as:
  seconds = floor(t / 1e9) - BASE_SECONDS
  nanos   = t mod 1e9   (always >= 0)
  secondary = nanos << 3                       if nanos % 100 != 0
            = (nanos / 10^z) << 3 | (z - 2)    stripping z in 2..8 zeros
Decode reverses exactly, so round-trip is bit-identical.
"""

from __future__ import annotations

import numpy as np

_I64 = np.int64

# seconds between 1970-01-01 and 2015-01-01 UTC (treereader.go:128-131)
BASE_SECONDS = 1420070400
NS = 1_000_000_000

UNIT_PER_SEC = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": NS}


def split_unit(vals: np.ndarray, unit: str) -> tuple[np.ndarray, np.ndarray]:
    """int64 values in an Arrow timestamp unit -> (seconds - base,
    formatted nanos). Sub-second fractions scale exactly to nanos."""
    f = UNIT_PER_SEC[unit]
    v = np.ascontiguousarray(vals, dtype=_I64)
    secs = np.floor_divide(v, f)
    frac = v - secs * f
    return secs - BASE_SECONDS, format_nanos(frac * (NS // f))


def join_unit(secs_rel: np.ndarray, fmt_nanos: np.ndarray, unit: str) -> np.ndarray:
    f = UNIT_PER_SEC[unit]
    secs = np.ascontiguousarray(secs_rel, dtype=_I64) + BASE_SECONDS
    nanos = parse_nanos(fmt_nanos)
    return secs * f + nanos // (NS // f)


def split_ns(ts_ns: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 ns-since-epoch -> (seconds - base, formatted nanos)."""
    ts = np.ascontiguousarray(ts_ns, dtype=_I64)
    secs = np.floor_divide(ts, NS)
    nanos = ts - secs * NS  # 0..1e9-1, floor semantics => non-negative
    return secs - BASE_SECONDS, format_nanos(nanos)


def join_ns(secs_rel: np.ndarray, fmt_nanos: np.ndarray) -> np.ndarray:
    secs = np.ascontiguousarray(secs_rel, dtype=_I64) + BASE_SECONDS
    nanos = parse_nanos(fmt_nanos)
    return secs * NS + nanos


def format_nanos(nanos: np.ndarray) -> np.ndarray:
    """Vectorized formatNanos: pack the count of stripped trailing decimal
    zeros (2..8, encoded as 1..7) into the low 3 bits."""
    n = np.ascontiguousarray(nanos, dtype=_I64)
    out = n << 3
    rem = n.copy()
    zeros = np.zeros(len(n), dtype=_I64)
    m = (n != 0) & (n % 100 == 0)
    if m.any():
        r = n[m] // 100
        z = np.ones(m.sum(), dtype=_I64)
        for _ in range(6):  # up to trailingZeros == 7
            more = (r % 10 == 0) & (z < 7)
            if not more.any():
                break
            r[more] //= 10
            z[more] += 1
        out[m] = (r << 3) | z
    out[n == 0] = 0
    return out


def parse_nanos(fmt: np.ndarray) -> np.ndarray:
    f = np.ascontiguousarray(fmt, dtype=_I64)
    z = f & 7
    base = f >> 3
    mult = np.where(z == 0, 1, 10 ** (z + 1))
    return base * mult
