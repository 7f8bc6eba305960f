"""ORC RLEv2 integer codec (short-repeat / direct / patched-base / delta).

From-scratch numpy re-creation of the reference's RLEv2 writer/reader
(/root/reference/runlengthintegerwriterv2.go:9-788,
/root/reference/runlengthintegerreaderv2.go:36-426). The reference is a
per-value state machine; here the same segmentation semantics are derived
up-front from the whole array (vectorized run detection), then each run is
emitted with vectorized kernels. Output is byte-identical to the reference
writer (validated against its test vectors in tests/test_rle2.py).

Segmentation semantics re-created (runlengthintegerwriterv2.go:87-212):
- >=3 consecutive equal values form a "fixed run"; when the 3rd equal value
  arrives inside a variable run, the preceding variable prefix is flushed
  first (the tail carve-out, lines 121-141).
- fixed runs of 3..10 -> SHORT_REPEAT; 11..512 -> DELTA with fixed delta 0;
  runs longer than 512 flush in 512-value chunks, a 1-2 value remainder
  joins the following variable run.
- variable runs flush at 512 values; encoding chosen by determineEncoding
  (lines 265-402): fixed-delta / monotonic -> DELTA, 90th/100th percentile
  zigzag width gap > 1 -> PATCHED_BASE (patch budget ~5%, lines 415-517),
  else DIRECT at the aligned 100th-percentile width.
"""

from __future__ import annotations

import numpy as np

from .bitpack import (
    DECODE_BIT_WIDTH,
    _CLOSEST_ALIGNED,
    _CLOSEST_FIXED,
    _ENCODE_BW,
    bit_length_u64,
    closest_fixed_bits_arr,
    decode_bit_width,
    encode_bit_width,
    get_closest_aligned_fixed_bits,
    get_closest_fixed_bits,
    pack_bits,
    percentile_bits,
    unpack_bits,
)

# plain-list width table for decode's pass-1 loop (list index beats a numpy
# scalar index ~10x in a hot Python loop)
_DBW_LIST = [int(w) for w in DECODE_BIT_WIDTH]
# lookup arrays for the batched encoder
_ENC_CODE_OF = _ENCODE_BW[_CLOSEST_FIXED]  # bit length (0..64) -> width code
_CLOSEST_ALIGNED_ARR = _CLOSEST_ALIGNED
_DECODE_BW_ARR = DECODE_BIT_WIDTH
# per width code, the largest value representable at that width (uint64):
# searchsorted(_WIDTH_UPPER, x) == encodeBitWidth(findClosestNumBits(x))
_WIDTH_UPPER = np.array(
    [(1 << int(w)) - 1 if w < 64 else (1 << 64) - 1 for w in DECODE_BIT_WIDTH],
    dtype=np.uint64,
)
_WIDTH_UPPER32 = np.array(
    [min((1 << int(w)) - 1, (1 << 32) - 1) for w in DECODE_BIT_WIDTH],
    dtype=np.uint32,
)
from .varint import (
    read_vslong,
    read_vulong,
    write_vslong,
    write_vulong,
    zigzag_decode,
    zigzag_encode,
    zigzag_encode32,
)

_U64 = np.uint64
_I64 = np.int64

MIN_REPEAT = 3
MAX_SHORT_REPEAT = 10
MAX_SCOPE = 512

# 2-bit encoding tags (runlengthintegerreaderv2.go:29-34)
SHORT_REPEAT = 0
DIRECT = 1
PATCHED_BASE = 2
DELTA = 3


def _u64(v: int) -> int:
    return v & 0xFFFFFFFFFFFFFFFF


def _as_i64(v: int) -> int:
    v = _u64(v)
    return v - (1 << 64) if v >> 63 else v


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode(values: np.ndarray, signed: bool) -> bytes:
    """Encode an int64 array into an RLEv2 byte stream.

    All variable scopes are classified in one ragged vectorized pass
    (per-scope percentile widths / monotonicity / fixed-delta flags computed
    with reduceat kernels over the concatenated scope values); DIRECT scopes
    with byte-aligned widths are bit-packed in per-width groups. Fixed runs
    and the rare non-DIRECT scopes use the scalar emitters.

    int32 inputs whose value range fits 32-bit delta arithmetic stay in
    32-bit end-to-end (identical output bytes, half the memory traffic —
    the dominant cost for token streams under many concurrent workers)."""
    values = np.asarray(values)
    if values.dtype == np.int32 and len(values):
        vmn = int(values.min())
        vmx = int(values.max())
        if (vmx - vmn) <= 2**31 - 1 and (signed or vmn >= 0):
            v = np.ascontiguousarray(values)
        else:
            v = np.ascontiguousarray(values, dtype=_I64)
    else:
        v = np.ascontiguousarray(values, dtype=_I64)
    segs = list(_segments(v))
    if not segs:
        return b""
    pieces: list[bytes | None] = [None] * len(segs)
    var_idx = [i for i, (k, s, e) in enumerate(segs) if k == 1]
    if len(var_idx) >= 4:
        starts = np.array([segs[i][1] for i in var_idx], dtype=np.int64)
        ends = np.array([segs[i][2] for i in var_idx], dtype=np.int64)
        for idx, piece in zip(var_idx, _encode_var_ragged(v, starts, ends, signed)):
            pieces[idx] = piece
    for i, (kind, s, e) in enumerate(segs):
        if pieces[i] is not None:
            continue
        out = bytearray()
        if kind == 0:
            _emit_fixed(out, int(v[s]), e - s, signed)
        else:
            _emit_variable(out, v[s:e].astype(_I64, copy=False), signed)
        pieces[i] = bytes(out)
    return b"".join(pieces)


def _encode_var_ragged(
    v: np.ndarray, starts: np.ndarray, ends: np.ndarray, signed: bool
) -> list[bytes]:
    """Vectorized determineEncoding + emit for k variable scopes of any
    sizes. Stats follow runlengthintegerwriterv2.go:265-402 exactly."""
    k = len(starts)
    narrow = v.dtype == np.int32
    lengths = ends - starts
    total = int(lengths.sum())
    off = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(lengths, out=off[1:])
    seg_of = np.repeat(np.arange(k, dtype=np.int32), lengths)
    if total == len(v):
        V = v  # scopes tile the whole array: no gather needed
    else:
        flat_idx = starts[seg_of] + (np.arange(total, dtype=np.int64) - off[:-1][seg_of])
        V = v[flat_idx]
    if narrow:
        ZZ = zigzag_encode32(V) if signed else V.view(np.uint32)
    else:
        ZZ = zigzag_encode(V) if signed else V.view(_U64)

    # per-scope percentile widths from ragged histograms; width code found
    # by one searchsorted against the 32 encodable-width upper bounds
    # (findClosestNumBits + encodeBitWidth fused, no float temps); key math
    # kept in int32 to halve the traffic of these full-length temporaries
    codes = np.searchsorted(
        _WIDTH_UPPER32 if narrow else _WIDTH_UPPER, ZZ, side="left"
    ).astype(np.int32, copy=False)
    hist = np.bincount(seg_of * np.int32(32) + codes, minlength=k * 32).reshape(k, 32)
    zz100 = _pct_from_hist_ragged(hist, lengths, 1.0)
    zz90 = _pct_from_hist_ragged(hist, lengths, 0.9)

    # delta stats: boundary gaps neutralized per reduction
    is_first = np.zeros(total, dtype=bool)
    is_first[off[:-1][lengths > 0]] = True
    D = np.empty(total, dtype=V.dtype)
    if total:
        D[0] = 0
        np.subtract(V[1:], V[:-1], out=D[1:])
    # initial delta per scope (scopes of length 1 get 0)
    has2 = lengths >= 2
    initial = np.zeros(k, dtype=V.dtype)
    first_pos = off[:-1]
    initial[has2] = D[first_pos[has2] + 1]
    # is_fixed: every in-scope delta equals initial
    eq_init = D == initial[seg_of]
    eq_init[is_first] = True
    is_fixed = np.logical_and.reduceat(eq_init, off[:-1]) if k else np.empty(0, bool)
    # monotonicity from delta signs (valid wherever safe-subtract holds;
    # unsafe scopes go DIRECT regardless, matching the reference's ordering)
    geq = D >= 0
    leq = D <= 0
    geq[is_first] = True
    leq[is_first] = True
    is_inc = np.logical_and.reduceat(geq, off[:-1])
    is_dec = np.logical_and.reduceat(leq, off[:-1])
    vmin = np.minimum.reduceat(V, off[:-1])
    vmax = np.maximum.reduceat(V, off[:-1])
    if narrow:
        # the 32-bit path is only entered when the global range fits int32
        # delta arithmetic, so int64 subtraction can never overflow
        safe = np.ones(k, dtype=bool)
    else:
        diff = vmax - vmin
        safe = ((vmax ^ vmin) >= 0) | ((vmax ^ diff) >= 0)
    const = vmin == vmax
    short = lengths <= MIN_REPEAT
    mono = (initial != 0) & (is_inc | is_dec)

    direct = short | ~safe | (safe & ~const & ~is_fixed & ~mono & (zz100 - zz90 <= 1))
    maybe_patched = ~direct & safe & ~const & ~is_fixed & ~mono

    pieces: list[bytes | None] = [None] * k

    # DIRECT scopes: group-pack per aligned width. Scopes whose bit count
    # isn't byte-aligned get zero padding values appended (identical bytes
    # to per-scope packing, which zero-pads the final byte).
    direct_idx = np.flatnonzero(direct)
    if len(direct_idx):
        fbs = _CLOSEST_ALIGNED_ARR[zz100[direct_idx]]
        for fb in np.unique(fbs):
            fb = int(fb)
            rows = direct_idx[fbs == fb]
            if len(rows) > 1:
                packed, byte_off = _group_pack(ZZ, off[rows], lengths[rows], fb)
                for j, r in enumerate(rows):
                    run = int(lengths[r]) - 1
                    header = bytes([
                        (DIRECT << 6) | (encode_bit_width(fb) << 1) | ((run & 0x100) >> 8),
                        run & 0xFF,
                    ])
                    pieces[r] = header + packed[byte_off[j]: byte_off[j + 1]]
            else:
                for r in rows:
                    run = int(lengths[r]) - 1
                    header = bytes([
                        (DIRECT << 6) | (encode_bit_width(fb) << 1) | ((run & 0x100) >> 8),
                        run & 0xFF,
                    ])
                    pieces[r] = header + pack_bits(ZZ[off[r]: off[r + 1]], fb)

    # DELTA-var scopes (monotonic): group the abs-delta tails by width too
    mono_emit = np.flatnonzero(~direct & safe & ~const & ~is_fixed & mono)
    if len(mono_emit) > 3:
        absD = np.abs(D)
        tail_starts = off[mono_emit] + 2
        tail_lens = lengths[mono_emit] - 2
        tail_max = _ragged_max(absD, tail_starts, tail_lens)
        dmax = np.maximum(initial[mono_emit].astype(_I64), tail_max.astype(_I64))
        codes_d = np.searchsorted(_WIDTH_UPPER, dmax.view(_U64))
        fbs_d = _CLOSEST_ALIGNED_ARR[_DECODE_BW_ARR[codes_d]]
        fbs_d = np.where(fbs_d == 1, 2, fbs_d)
        for fb in np.unique(fbs_d):
            fb = int(fb)
            rows = mono_emit[fbs_d == fb]
            packed, byte_off = _group_pack(absD, tail_starts[fbs_d == fb],
                                           tail_lens[fbs_d == fb], fb)
            for j, r in enumerate(rows):
                out = bytearray()
                run = int(lengths[r]) - 1
                out.append((DELTA << 6) | (encode_bit_width(fb) << 1) | ((run & 0x100) >> 8))
                out.append(run & 0xFF)
                if signed:
                    write_vslong(out, int(V[off[r]]))
                else:
                    write_vulong(out, int(V[off[r]]))
                write_vslong(out, int(initial[r]))
                out.extend(packed[byte_off[j]: byte_off[j + 1]])
                pieces[r] = bytes(out)

    for r in np.flatnonzero(~direct):
        if pieces[r] is not None:
            continue
        out = bytearray()
        seg = V[off[r]: off[r + 1]]
        if narrow:
            seg = seg.astype(_I64)
        if const[r]:
            _emit_delta_fixed(out, int(vmin[r]), 0, int(lengths[r]), signed)
        elif is_fixed[r]:
            _emit_delta_fixed(out, int(seg[0]), int(initial[r]), int(lengths[r]), signed)
        elif mono[r]:
            deltas = D[off[r] + 1: off[r + 1]].astype(_I64, copy=False)
            abs_tail = np.abs(deltas[1:])
            delta_max = int(initial[r])
            if len(abs_tail):
                delta_max = max(delta_max, int(abs_tail.max()))
            bits_delta_max = get_closest_fixed_bits(_u64(delta_max).bit_length())
            _emit_delta_var(out, seg, int(initial[r]), abs_tail, bits_delta_max, signed)
        elif maybe_patched[r]:
            base_red = (seg - vmin[r]).view(_U64)
            br95 = percentile_bits(base_red, 0.95)
            br100 = percentile_bits(base_red, 1.0)
            if br100 - br95 != 0:
                _emit_patched_base(out, base_red, int(vmin[r]), br95, br100)
            else:
                _emit_direct(out, ZZ[off[r]: off[r + 1]], int(zz100[r]))
        else:
            _emit_direct(out, ZZ[off[r]: off[r + 1]], int(zz100[r]))
        pieces[r] = bytes(out)
    return pieces  # type: ignore[return-value]


def _group_pack(values: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                fb: int) -> tuple[bytes, np.ndarray]:
    """Pack many ragged scopes at the same width in ONE pack_bits call.
    Scopes are zero-padded to byte boundaries (bit-identical to per-scope
    packing, whose final byte is zero-padded). Returns (packed bytes,
    per-scope byte offsets)."""
    k = len(starts)
    pads = ((-(lens * fb)) % 8) // fb
    pl = lens + pads
    doff = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(pl, out=doff[1:])
    soff = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(lens, out=soff[1:])
    stotal = int(soff[-1])
    out = np.zeros(int(doff[-1]), dtype=values.dtype)
    pos = np.arange(stotal, dtype=np.int64) - np.repeat(soff[:-1], lens)
    src = np.repeat(starts, lens) + pos
    dst = np.repeat(doff[:-1], lens) + pos
    out[dst] = values[src]
    if out.dtype == np.int32:
        out = out.view(np.uint32)
    packed = pack_bits(out, fb)
    return packed, doff * fb // 8


def _ragged_max(values: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-scope max over non-contiguous ranges via paired reduceat."""
    k = len(starts)
    idx = np.empty(2 * k, dtype=np.int64)
    idx[0::2] = starts
    idx[1::2] = starts + lens
    if idx[-1] >= len(values):
        res = np.maximum.reduceat(values, idx[:-1])
    else:
        res = np.maximum.reduceat(values, idx)
    return res[0::2]


def _pct_from_hist_ragged(hist: np.ndarray, lengths: np.ndarray, p: float) -> np.ndarray:
    per_len = lengths.astype(np.float64) * (1.0 - p)
    cum = np.cumsum(hist[:, ::-1], axis=1)
    j = np.argmax(cum > per_len[:, None], axis=1)
    return _DECODE_BW_ARR[31 - j]


def _segments(v: np.ndarray):
    """Yield (kind, start, end) with kind 0=fixed-run, 1=variable, matching
    the reference state machine's flush boundaries. Single vectorized run
    detection, then a pointer walk over the BIG (>=MIN_REPEAT) runs only —
    O(#big runs + #segments) Python steps, never O(#values): short runs
    can't start a fixed segment, so their boundaries are irrelevant."""
    n = len(v)
    if n == 0:
        return
    if n == 1:
        yield (1, 0, 1)
        return
    change_idx = np.flatnonzero(v[1:] != v[:-1])
    run_bounds = np.empty(len(change_idx) + 2, dtype=np.int64)
    run_bounds[0] = 0
    run_bounds[1:-1] = change_idx + 1
    run_bounds[-1] = n
    big = (run_bounds[1:] - run_bounds[:-1]) >= MIN_REPEAT
    big_starts = run_bounds[:-1][big].tolist()  # python ints: fast iteration
    big_ends = run_bounds[1:][big].tolist()
    nbig = len(big_starts)

    c = 0
    bi = 0  # first big run with end > c
    bj = 0  # next big run with start > current variable-span start
    while c < n:
        while bi < nbig and big_ends[bi] <= c:
            bi += 1
        if bi < nbig and big_starts[bi] <= c:
            # c is inside a big run (at its start, or at a post-512-cut tail)
            L = big_ends[bi] - c
            if L >= MIN_REPEAT:
                while L >= MAX_SCOPE:
                    yield (0, c, c + MAX_SCOPE)
                    c += MAX_SCOPE
                    L -= MAX_SCOPE
                if L >= MIN_REPEAT:
                    yield (0, c, c + L)
                    c += L
                    continue
                if L == 0:
                    continue
            # 1-2 leftover equal values fall into the variable span
        s = c
        while bj < nbig and big_starts[bj] <= s:
            bj += 1
        t = big_starts[bj] if bj < nbig else -1
        while True:
            if t != -1 and t + 2 <= s + MAX_SCOPE - 1:
                # carve-out: flush variable prefix, fixed run continues at t
                yield (1, s, t)
                c = t
                break
            e = min(s + MAX_SCOPE, n)
            yield (1, s, e)
            c = e
            if e == n or (t != -1 and e >= t):
                # hit the end, or the 512-cut swallowed the start of run t:
                # outer loop re-evaluates the remaining tail of that run
                break
            s = e
            while bj < nbig and big_starts[bj] <= s:
                bj += 1
            t = big_starts[bj] if bj < nbig else -1


def _emit_fixed(out: bytearray, val: int, length: int, signed: bool) -> None:
    """Fixed run of `length` (3..512) equal values: SHORT_REPEAT for 3..10,
    DELTA(fixed 0) otherwise (writer Flush/variable-branch paths)."""
    if length <= MAX_SHORT_REPEAT:
        rep = zigzag_encode(np.array([val], dtype=_I64))[0] if signed else _u64(val)
        rep = int(rep)
        width = get_closest_fixed_bits(rep.bit_length())
        nbytes = (width + 7) // 8 if width % 8 else width // 8
        header = (SHORT_REPEAT << 6) | ((nbytes - 1) << 3) | (length - MIN_REPEAT)
        out.append(header)
        out.extend(rep.to_bytes(8, "big")[8 - nbytes:])
    else:
        _emit_delta_fixed(out, val, 0, length, signed)


def _emit_delta_fixed(out: bytearray, first: int, delta: int, length: int, signed: bool) -> None:
    """DELTA run with fixed delta (width code 0)."""
    run = length - 1
    out.append((DELTA << 6) | ((run & 0x100) >> 8))
    out.append(run & 0xFF)
    if signed:
        write_vslong(out, first)
    else:
        write_vulong(out, first)
    write_vslong(out, delta)


def _emit_variable(out: bytearray, chunk: np.ndarray, signed: bool) -> None:
    """determineEncoding (runlengthintegerwriterv2.go:265-402) + emit."""
    n = len(chunk)
    zz = zigzag_encode(chunk) if signed else chunk.view(_U64)
    zz100 = percentile_bits(zz, 1.0)
    if n <= MIN_REPEAT:
        _emit_direct(out, zz, zz100)
        return

    deltas = chunk[1:] - chunk[:-1]  # wrapping int64
    initial = int(deltas[0])
    is_fixed_delta = bool(np.all(deltas == deltas[0]))
    vmin = int(chunk.min())
    vmax = int(chunk.max())
    # direct comparisons like the reference (delta subtraction may wrap)
    is_inc = bool(np.all(chunk[1:] >= chunk[:-1]))
    is_dec = bool(np.all(chunk[1:] <= chunk[:-1]))
    # adjDeltas: [initial, |d2|, |d3|, ...]; deltaMax = max over these
    abs_tail = np.abs(deltas[1:])  # wrapping abs like the reference
    delta_max = initial
    if len(abs_tail):
        delta_max = max(initial, int(abs_tail.max()))

    if not _is_safe_subtract(vmax, vmin):
        _emit_direct(out, zz, zz100)
        return
    if vmin == vmax:
        _emit_delta_fixed(out, vmin, 0, n, signed)
        return
    if is_fixed_delta:
        _emit_delta_fixed(out, int(chunk[0]), initial, n, signed)
        return
    if initial != 0 and (is_inc or is_dec):
        bits_delta_max = get_closest_fixed_bits(_u64(delta_max).bit_length())
        _emit_delta_var(out, chunk, initial, abs_tail, bits_delta_max, signed)
        return

    zz90 = percentile_bits(zz, 0.9)
    if zz100 - zz90 > 1:
        base_red = (chunk - vmin).view(_U64)
        br95 = percentile_bits(base_red, 0.95)
        br100 = percentile_bits(base_red, 1.0)
        if br100 - br95 != 0:
            _emit_patched_base(out, base_red, vmin, br95, br100)
            return
    _emit_direct(out, zz, zz100)


def _emit_direct(out: bytearray, zz: np.ndarray, zz100: int) -> None:
    fb = get_closest_aligned_fixed_bits(zz100)
    run = len(zz) - 1
    out.append((DIRECT << 6) | (encode_bit_width(fb) << 1) | ((run & 0x100) >> 8))
    out.append(run & 0xFF)
    out.extend(pack_bits(zz, fb))


def _emit_delta_var(
    out: bytearray,
    chunk: np.ndarray,
    initial: int,
    abs_tail: np.ndarray,
    bits_delta_max: int,
    signed: bool,
) -> None:
    fb = get_closest_aligned_fixed_bits(bits_delta_max)
    if fb == 1:
        fb = 2
    run = len(chunk) - 1
    out.append((DELTA << 6) | (encode_bit_width(fb) << 1) | ((run & 0x100) >> 8))
    out.append(run & 0xFF)
    if signed:
        write_vslong(out, int(chunk[0]))
    else:
        write_vulong(out, int(chunk[0]))
    write_vslong(out, initial)
    out.extend(pack_bits(abs_tail.view(_U64), fb))


def _emit_patched_base(out: bytearray, base_red: np.ndarray, vmin: int, br95: int, br100: int) -> None:
    """preparePatchedBlob + writePatchedBaseValues
    (runlengthintegerwriterv2.go:415-517, 609-699)."""
    n = len(base_red)
    patch_width = get_closest_fixed_bits(br100 - br95)
    if patch_width == 64:
        patch_width = 56
        br95 = 8
    mask = (1 << br95) - 1

    br = base_red.copy()
    over = np.flatnonzero(br > _U64(mask))
    patches = (br[over] >> _U64(br95)).astype(_U64)
    br[over] &= _U64(mask)
    # gaps are relative to the previous patched index (first one is absolute)
    gaps = np.diff(np.concatenate(([0], over))).astype(np.int64) if len(over) else np.empty(0, np.int64)
    max_gap = int(gaps.max()) if len(gaps) else 0

    if max_gap == 0 and len(gaps) != 0:
        patch_gap_width = 1
    else:
        patch_gap_width = get_closest_fixed_bits(_u64(max_gap).bit_length())
    extra = 0
    if patch_gap_width > 8:
        patch_gap_width = 8
        extra = 2 if max_gap == 511 else 1
    # build gap-vs-patch entries, splitting gaps > 255 into 255-gap/0-patch escapes
    gvp: list[int] = []
    for g, p in zip(gaps.tolist(), patches.tolist()):
        while g > 255:
            gvp.append(255 << patch_width)
            g -= 255
        gvp.append((g << patch_width) | int(p))
    patch_length = len(gvp)
    assert patch_length == len(gaps) + extra

    run = n - 1
    fb = br95
    out.append((PATCHED_BASE << 6) | (encode_bit_width(fb) << 1) | ((run & 0x100) >> 8))
    out.append(run & 0xFF)

    base = vmin
    is_neg = base < 0
    if is_neg:
        base = -base
    base_width = get_closest_fixed_bits(_u64(base).bit_length()) + 1
    base_bytes = base_width // 8 if base_width % 8 == 0 else base_width // 8 + 1
    if is_neg:
        base |= 1 << (base_bytes * 8 - 1)
    out.append(((base_bytes - 1) << 5) | encode_bit_width(patch_width))
    out.append(((patch_gap_width - 1) << 5) | patch_length)
    out.extend(_u64(base).to_bytes(8, "big")[8 - base_bytes:])
    out.extend(pack_bits(br, get_closest_fixed_bits(fb)))
    out.extend(
        pack_bits(
            np.array(gvp, dtype=_U64),
            get_closest_fixed_bits(patch_gap_width + patch_width),
        )
    )


def _is_safe_subtract(left: int, right: int) -> bool:
    return (left ^ right) >= 0 or (left ^ _as_i64(left - right)) >= 0


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def run_index(buf: bytes, stride: int) -> list[tuple[int, int]]:
    """Seek-point index for an RLEv2 stream: for every `stride` values,
    the (value position, byte offset) of the run containing that stride
    boundary. Mirrors ORC's ROW_INDEX positions (positionrecorder.go:1-12,
    writer.go:337-384): decode can start at any entry's byte offset and
    skip (boundary - value position) values. Header-scan only — O(#runs),
    never unpacks payloads."""
    size = len(buf)
    entries: list[tuple[int, int]] = []
    pos = 0
    total = 0
    next_boundary = 0
    while pos < size:
        first = buf[pos]
        tag = (first >> 6) & 0x3
        if tag == SHORT_REPEAT:
            sz = ((first >> 3) & 0x7) + 1
            cnt = (first & 0x7) + MIN_REPEAT
            nxt = pos + 1 + sz
        elif tag == DIRECT:
            fb = decode_bit_width((first >> 1) & 0x1F)
            cnt = ((first & 0x1) << 8 | buf[pos + 1]) + 1
            nxt = pos + 2 + (cnt * fb + 7) // 8
        elif tag == PATCHED_BASE:
            fb = decode_bit_width((first >> 1) & 0x1F)
            cnt = ((first & 0x1) << 8 | buf[pos + 1]) + 1
            third = buf[pos + 2]
            base_bytes = ((third >> 5) & 0x7) + 1
            patch_width = decode_bit_width(third & 0x1F)
            fourth = buf[pos + 3]
            patch_gap_width = ((fourth >> 5) & 0x7) + 1
            pll = fourth & 0x1F
            gvp_w = get_closest_fixed_bits(patch_width + patch_gap_width)
            nxt = pos + 4 + base_bytes + (cnt * fb + 7) // 8 + (pll * gvp_w + 7) // 8
        else:  # DELTA
            fbo = (first >> 1) & 0x1F
            fb = decode_bit_width(fbo) if fbo != 0 else 0
            cnt = ((first & 0x1) << 8 | buf[pos + 1]) + 1
            p = pos + 2
            _, p = read_vulong(buf, p)
            _, p = read_vslong(buf, p)
            if fb != 0:
                p += ((cnt - 2) * fb + 7) // 8
            nxt = p
        while next_boundary < total + cnt:
            entries.append((total, pos))
            next_boundary += stride
        total += cnt
        pos = nxt
    return entries


def _batch_vulongs(raw: np.ndarray, starts: np.ndarray,
                   ends: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 decode of k varints given their [start, end] byte
    ranges (``end`` = the terminator byte, < 0x80). One gather + a 7-bit
    Horner combine instead of k Python byte loops."""
    k = len(starts)
    if k == 0:
        return np.empty(0, dtype=_U64)
    L = (ends - starts + 1).astype(np.int64)
    width = int(L.max())
    pad = np.zeros(len(raw) + width, dtype=np.uint8)
    pad[: len(raw)] = raw
    mat = pad[starts[:, None] + np.arange(width)]
    mask = np.arange(width)[None, :] < L[:, None]
    sep = (mat & 0x7F).astype(_U64) * mask
    val = np.zeros(k, dtype=_U64)
    for j in range(width - 1, -1, -1):
        val = (val << _U64(7)) | sep[:, j]
    return val


def decode(buf: bytes, signed: bool, n: int | None = None,
           out_dtype=np.int64) -> np.ndarray:
    """Decode an RLEv2 byte stream to an integer array (``out_dtype`` may be
    int32 when the caller knows values fit — halves the output traffic for
    token streams). Stops after ``n`` values when given, else consumes the
    whole buffer.

    Two passes: a cheap sequential header scan collects every run's
    (tag, position, count, width) — DELTA header varints are skipped via a
    tight terminator byte scan, not parsed — then DIRECT, DELTA and
    SHORT_REPEAT runs all decode in vectorized groups (DELTA header varints
    batch-decode through ``_batch_vulongs``); only the rare PATCHED_BASE
    runs decode individually."""
    size = len(buf)
    raw = np.frombuffer(buf, dtype=np.uint8)
    # pass 1: header scan into flat per-field lists (cheap scalar appends;
    # np.array over an int list is far faster than over a tuple list)
    tags = []
    positions_l = []
    counts = []
    widths = []
    t_add = tags.append; p_add = positions_l.append
    c_add = counts.append; w_add = widths.append
    dbw = _DBW_LIST
    delta_i_l = []; delta_e1 = []; delta_e2 = []
    di_add = delta_i_l.append; d1_add = delta_e1.append; d2_add = delta_e2.append
    nrun = 0
    pos = 0
    total = 0
    while pos < size and (n is None or total < n):
        first = buf[pos]
        tag = first >> 6
        if tag == DELTA:
            fbo = (first >> 1) & 0x1F
            fb = dbw[fbo] if fbo != 0 else 0
            cnt = ((first & 0x1) << 8 | buf[pos + 1]) + 1
            # varints are <=10 bytes: a tight byte scan for the two
            # terminators beats any precomputed index on large streams
            e1 = pos + 2
            while buf[e1] >= 0x80:
                e1 += 1
            e2 = e1 + 1
            while buf[e2] >= 0x80:
                e2 += 1
            p = e2 + 1
            if fb != 0:
                p += ((cnt - 2) * fb + 7) // 8
            di_add(nrun); d1_add(e1); d2_add(e2)
            t_add(tag); p_add(pos); c_add(cnt); w_add(fb)
            pos = p
        elif tag == DIRECT:
            fb = dbw[(first >> 1) & 0x1F]
            cnt = ((first & 0x1) << 8 | buf[pos + 1]) + 1
            t_add(tag); p_add(pos); c_add(cnt); w_add(fb)
            pos += 2 + (cnt * fb + 7) // 8
        elif tag == SHORT_REPEAT:
            sz = ((first >> 3) & 0x7) + 1
            cnt = (first & 0x7) + MIN_REPEAT
            t_add(tag); p_add(pos); c_add(cnt); w_add(sz)
            pos += 1 + sz
        else:  # PATCHED_BASE
            fb = dbw[(first >> 1) & 0x1F]
            cnt = ((first & 0x1) << 8 | buf[pos + 1]) + 1
            third = buf[pos + 2]
            base_bytes = ((third >> 5) & 0x7) + 1
            patch_width = dbw[third & 0x1F]
            fourth = buf[pos + 3]
            patch_gap_width = ((fourth >> 5) & 0x7) + 1
            pll = fourth & 0x1F
            gvp_w = get_closest_fixed_bits(patch_width + patch_gap_width)
            t_add(tag); p_add(pos); c_add(cnt); w_add(fb)
            pos += 4 + base_bytes + (cnt * fb + 7) // 8 + (pll * gvp_w + 7) // 8
        nrun += 1
        total += cnt

    tags_a = np.array(tags, dtype=np.int64) if tags else np.empty(0, np.int64)
    pos_a = np.array(positions_l, dtype=np.int64)
    cnt_a = np.array(counts, dtype=np.int64)
    w_a = np.array(widths, dtype=np.int64)
    positions = positions_l  # pass 2d indexes per run
    delta_i = np.array(delta_i_l, dtype=np.int64)

    out = np.empty(total, dtype=out_dtype)
    starts = np.zeros(nrun + 1, dtype=np.int64)
    np.cumsum(cnt_a, out=starts[1:])
    # pass 2a: grouped DIRECT decode
    direct_idx = np.flatnonzero(tags_a == DIRECT)
    if len(direct_idx):
        for key in np.unique(w_a[direct_idx] * 1024 + cnt_a[direct_idx]):
            w, c = int(key) // 1024, int(key) % 1024
            grp = direct_idx[(w_a[direct_idx] == w) & (cnt_a[direct_idx] == c)]
            if len(grp) == 1:
                g = int(grp[0])
                vals, _ = unpack_bits(buf, w, c, int(pos_a[g]) + 2)
                dec = zigzag_decode(vals) if signed else vals.view(_I64)
                out[starts[g]: starts[g] + c] = dec
                continue
            nb = (c * w + 7) // 8
            gather = pos_a[grp][:, None] + 2 + np.arange(nb)
            data = raw[gather]  # (k, nb)
            vals = _unpack_matrix(data, w, c)
            dec = zigzag_decode(vals.ravel()).reshape(len(grp), c) if signed \
                else vals.view(_I64)
            scatter = starts[grp][:, None] + np.arange(c)
            out[scatter.ravel()] = dec.ravel()
    # pass 2b: grouped DELTA decode — batch the header varints, then one
    # unpack + row-cumsum per (width, count) group
    if len(delta_i):
        di = delta_i
        e1 = np.array(delta_e1, dtype=np.int64)
        e2 = np.array(delta_e2, dtype=np.int64)
        u1 = _batch_vulongs(raw, pos_a[di] + 2, e1)
        first_vals = zigzag_decode(u1) if signed else u1.view(_I64)
        delta_bases = zigzag_decode(_batch_vulongs(raw, e1 + 1, e2))
        data_start = e2 + 1
        dcnt = cnt_a[di]
        dfb = w_a[di]
        for key in np.unique(dfb * 1024 + dcnt):
            w, c = int(key) // 1024, int(key) % 1024
            sel = (dfb == w) & (dcnt == c)
            grp = di[sel]
            k = len(grp)
            fv = first_vals[sel]
            db = delta_bases[sel]
            if w == 0:
                # fixed-delta runs: value_i = first + i * delta
                vals2d = fv[:, None] + db[:, None] * np.arange(c, dtype=_I64)
            elif k < 4:
                # small groups: per-run unpack_bits beats the matrix setup
                for j in range(k):
                    g = int(grp[j])
                    if c > 2:
                        absd, _ = unpack_bits(
                            buf, w, c - 2, int(data_start[sel][j]))
                        absd = absd.view(_I64)
                    else:
                        absd = np.empty(0, dtype=_I64)
                    step = np.empty(c, dtype=_I64)
                    step[0] = fv[j]
                    step[1] = db[j]
                    step[2:] = absd if db[j] >= 0 else -absd
                    out[starts[g]: starts[g] + c] = np.cumsum(step)
                continue
            else:
                nb = ((c - 2) * w + 7) // 8
                if c > 2 and nb > 0:
                    gather = data_start[sel][:, None] + np.arange(nb)
                    mat = raw[np.minimum(gather, size - 1)] \
                        if gather.max() >= size else raw[gather]
                    absd = _unpack_matrix(mat, w, c - 2).view(_I64)
                else:
                    absd = np.zeros((k, 0), dtype=_I64)
                steps = np.empty((k, c), dtype=_I64)
                steps[:, 0] = fv
                steps[:, 1] = db
                sign = np.where(db >= 0, _I64(1), _I64(-1))
                steps[:, 2:] = absd * sign[:, None]
                vals2d = np.cumsum(steps, axis=1)
            scatter = starts[grp][:, None] + np.arange(c)
            out[scatter.ravel()] = vals2d.ravel()
    # pass 2c: grouped SHORT_REPEAT decode — batch big-endian value gather
    # per byte-width, then one ragged repeat/scatter for all runs
    sr_idx = np.flatnonzero(tags_a == SHORT_REPEAT)
    if len(sr_idx):
        vals_u = np.zeros(len(sr_idx), dtype=_U64)
        srw = w_a[sr_idx]
        for w in np.unique(srw):
            m = srw == w
            gather = pos_a[sr_idx][m][:, None] + 1 + np.arange(int(w))
            mat = raw[gather].astype(_U64)
            v = np.zeros(len(mat), dtype=_U64)
            for j in range(int(w)):
                v = (v << _U64(8)) | mat[:, j]
            vals_u[m] = v
        dec = (zigzag_decode(vals_u) if signed
               else vals_u.view(_I64)).astype(out_dtype, copy=False)
        cnts = cnt_a[sr_idx]
        tot = int(cnts.sum())
        pos0 = np.repeat(starts[sr_idx], cnts)
        intra = np.arange(tot) - np.repeat(np.cumsum(cnts) - cnts, cnts)
        out[pos0 + intra] = np.repeat(dec, cnts)
    # pass 2d: PATCHED_BASE (rare), per run
    for i in np.flatnonzero(tags_a == PATCHED_BASE):
        s = starts[i]
        arr, _ = _read_patched_base(buf, positions[i])
        out[s: s + len(arr)] = arr
    if n is not None and total > n:
        out = out[:n]
    return out


def _unpack_matrix(data: np.ndarray, width: int, count: int) -> np.ndarray:
    """Unpack a (k, nbytes) uint8 matrix of bit-packed runs to (k, count)
    uint64."""
    k = len(data)
    if width == 8:
        return data[:, :count].astype(_U64)
    if width % 8 == 0 and width <= 64:
        nbytes = width // 8
        m = data[:, : count * nbytes].reshape(k, count, nbytes).astype(_U64)
        out = np.zeros((k, count), dtype=_U64)
        for j in range(nbytes):
            out = (out << _U64(8)) | m[:, :, j]
        return out
    bits = np.unpackbits(data, axis=1)[:, : count * width].reshape(k, count, width)
    out = np.zeros((k, count), dtype=_U64)
    for j in range(width):
        out = (out << _U64(1)) | bits[:, :, j].astype(_U64)
    return out


def _read_short_repeat(buf, pos, signed):
    first = buf[pos]
    size = ((first >> 3) & 0x7) + 1
    l = (first & 0x7) + MIN_REPEAT
    val = int.from_bytes(buf[pos + 1: pos + 1 + size], "big")
    if signed:
        val = _as_i64((val >> 1) ^ (0 - (val & 1)))
    else:
        val = _as_i64(val)
    return np.full(l, val, dtype=_I64), pos + 1 + size


def _read_direct(buf, pos, signed):
    first = buf[pos]
    fb = decode_bit_width((first >> 1) & 0x1F)
    l = ((first & 0x1) << 8 | buf[pos + 1]) + 1
    vals, pos = unpack_bits(buf, fb, l, pos + 2)
    if signed:
        return zigzag_decode(vals), pos
    return vals.view(_I64).copy(), pos


def _read_delta(buf, pos, signed):
    first = buf[pos]
    fbo = (first >> 1) & 0x1F
    fb = decode_bit_width(fbo) if fbo != 0 else 0
    l = (first & 0x1) << 8 | buf[pos + 1]  # actual length - 1
    pos += 2
    if signed:
        first_val, pos = read_vslong(buf, pos)
    else:
        u, pos = read_vulong(buf, pos)
        first_val = _as_i64(u)
    if fb == 0:
        fd, pos = read_vslong(buf, pos)
        if fd == 0:
            return np.full(l + 1, first_val, dtype=_I64), pos
        out = np.int64(first_val) + np.int64(fd) * np.arange(l + 1, dtype=_I64)
        return out, pos
    delta_base, pos = read_vslong(buf, pos)
    abs_deltas, pos = unpack_bits(buf, fb, l - 1, pos)
    steps = np.empty(l + 1, dtype=_I64)
    steps[0] = first_val
    steps[1] = delta_base
    signed_tail = abs_deltas.view(_I64)
    steps[2:] = signed_tail if delta_base >= 0 else -signed_tail
    return np.cumsum(steps, dtype=_I64), pos


def _read_patched_base(buf, pos):
    first = buf[pos]
    fb = decode_bit_width((first >> 1) & 0x1F)
    l = ((first & 0x1) << 8 | buf[pos + 1]) + 1
    third = buf[pos + 2]
    base_bytes = ((third >> 5) & 0x7) + 1
    patch_width = decode_bit_width(third & 0x1F)
    fourth = buf[pos + 3]
    patch_gap_width = ((fourth >> 5) & 0x7) + 1
    patch_list_length = fourth & 0x1F
    pos += 4
    base = int.from_bytes(buf[pos: pos + base_bytes], "big")
    pos += base_bytes
    sign_mask = 1 << (base_bytes * 8 - 1)
    if base & sign_mask:
        base = -(base & ~sign_mask)

    unpacked, pos = unpack_bits(buf, fb, l, pos)
    gvp_width = get_closest_fixed_bits(patch_width + patch_gap_width)
    gvp, pos = unpack_bits(buf, gvp_width, patch_list_length, pos)

    out = unpacked.view(_I64) + np.int64(base)
    # apply patches: entries are (gap << patch_width) | patch; gap==255 &&
    # patch==0 entries are escapes adding 255 to the running gap
    patch_mask = _U64((1 << patch_width) - 1)
    gaps = (gvp >> _U64(patch_width)).astype(np.int64)
    patches = (gvp & patch_mask).astype(_U64)
    idx = 0
    i = 0
    while i < len(gvp):
        gap = 0
        while i < len(gvp) and gaps[i] == 255 and patches[i] == 0:
            gap += 255
            i += 1
        if i >= len(gvp):
            break
        gap += int(gaps[i])
        idx += gap
        out[idx] += _as_i64(int(patches[i]) << fb)
        i += 1
    return out, pos
