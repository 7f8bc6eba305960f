"""RLEv2 codec tests: byte-exact vectors from the reference test suite
(/root/reference/runlengthintegerwriterv2_test.go:10-118,
/root/reference/runlengthintegerreaderv2_test.go:26-36) plus randomized and
adversarial round-trips (FIXTURES.md F2/F3)."""

import numpy as np
import pytest

from orc_ray.codecs import rle2
from orc_ray.codecs.varint import (
    zigzag_decode,
    zigzag_encode,
    zigzag_decode_scalar,
    zigzag_encode_scalar,
)

# --- byte-exact vectors (reference writer must be reproduced exactly) -----

PATCHED_INPUT = [20, 2, 3, 2, 1, 3, 17, 71, 35, 2, 1, 139, 2, 2,
    3, 1783, 475, 2, 1, 1, 3, 1, 3, 2, 32, 1, 2, 3, 1, 8, 30, 1, 3, 414, 1,
    1, 135, 3, 3, 1, 414, 2, 1, 2, 2, 594, 2, 5, 6, 4, 11, 1, 2, 2, 1, 1,
    52, 4, 1, 2, 7, 1, 17, 334, 1, 2, 1, 2, 2, 6, 1, 266, 1, 2, 217, 2, 6,
    2, 13, 2, 2, 1, 2, 3, 5, 1, 2, 1, 7244, 11813, 1, 33, 2, -13, 1, 2, 3,
    13, 1, 92, 3, 13, 5, 14, 9, 141, 12, 6, 15, 25, 1, 1, 1, 46, 2, 1, 1,
    141, 3, 1, 1, 1, 1, 2, 1, 4, 34, 5, 78, 8, 1, 2, 2, 1, 9, 10, 2, 1, 4,
    13, 1, 5, 4, 4, 19, 5, 1, 1, 1, 68, 33, 399, 1, 1885, 25, 5, 2, 4, 1,
    1, 2, 16, 1, 2966, 3, 1, 1, 25501, 1, 1, 1, 66, 1, 3, 8, 131, 14, 5, 1,
    2, 2, 1, 1, 8, 1, 1, 2, 1, 5, 9, 2, 3, 112, 13, 2, 2, 1, 5, 10, 3, 1,
    1, 13, 2, 3, 4, 1, 3, 1, 1, 2, 1, 1, 2, 4, 2, 207, 1, 1, 2, 4, 3, 3, 2,
    2, 16]

PATCHED_EXPECTED = bytes([144, 109, 4, 164, 141, 16, 131, 194, 0, 240, 112,
    64, 60, 84, 24, 3, 193, 201, 128, 120, 60, 33, 4, 244, 3, 193, 192, 224,
    128, 56, 32, 15, 22, 131, 129, 225, 0, 112, 84, 86, 14, 8, 106, 193, 192,
    228, 160, 64, 32, 14, 213, 131, 193, 192, 240, 121, 124, 30, 18, 9, 132,
    67, 0, 224, 120, 60, 28, 14, 32, 132, 65, 192, 240, 160, 56, 61, 91, 7,
    3, 193, 192, 240, 120, 76, 29, 23, 7, 3, 220, 192, 240, 152, 60, 52, 15,
    7, 131, 129, 225, 0, 144, 56, 30, 14, 44, 140, 129, 194, 224, 120, 0, 28,
    15, 8, 6, 129, 198, 144, 128, 104, 36, 27, 11, 38, 131, 33, 48, 224, 152,
    60, 111, 6, 183, 3, 112, 0, 1, 78, 5, 46, 2, 1, 1, 141, 3, 1, 1, 138, 22,
    0, 65, 1, 4, 0, 225, 16, 209, 192, 4, 16, 8, 36, 16, 3, 48, 1, 3, 13, 33,
    0, 176, 0, 1, 94, 18, 0, 68, 0, 33, 1, 143, 0, 1, 7, 93, 0, 25, 0, 5, 0,
    2, 0, 4, 0, 1, 0, 1, 0, 2, 0, 16, 0, 1, 11, 150, 0, 3, 0, 1, 0, 1, 99,
    157, 0, 1, 140, 54, 0, 162, 1, 130, 0, 16, 112, 67, 66, 0, 2, 4, 0, 0,
    224, 0, 1, 0, 16, 64, 16, 91, 198, 1, 2, 0, 32, 144, 64, 0, 12, 2, 8, 24,
    0, 64, 0, 1, 0, 0, 8, 48, 51, 128, 0, 2, 12, 16, 32, 32, 71, 128, 19, 76])


VECTORS = [
    # (signed, input, expected bytes)
    (False, PATCHED_INPUT, PATCHED_EXPECTED),
    (False, [23713, 43806, 57005, 48879],
     bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF])),
    (False, [2, 3, 5, 7, 11, 13, 17, 19, 23, 29],
     bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])),
    (False, [10000] * 5, bytes([0x0A, 0x27, 0x10])),
    (False, [1, 1, 1, 1, 1, 0, 1, 0, 1, 0, 0, 1, 1, 1, 1],
     bytes([2, 1, 64, 5, 80, 1, 1])),
]


@pytest.mark.parametrize("signed,data,expected", VECTORS)
def test_reference_byte_vectors(signed, data, expected):
    arr = np.array(data, dtype=np.int64)
    got = rle2.encode(arr, signed)
    assert got == expected
    back = rle2.decode(got, signed)
    np.testing.assert_array_equal(back, arr)


def test_patched_base_decode_vector():
    # decoder-only vector: runlengthintegerreaderv2_test.go:26-36
    buf = bytes([0x8E, 0x09, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14, 0x70,
                 0x28, 0x32, 0x3C, 0x46, 0x50, 0x5A, 0xFC, 0xE8])
    expected = [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090]
    got = rle2.decode(buf, False)
    np.testing.assert_array_equal(got, expected)


def test_zigzag_vectors():
    # utils_test.go:45-61
    vals = np.array([0, -1, 1, -2, 2, -3, 3, -4, 4], dtype=np.int64)
    enc = zigzag_encode(vals)
    np.testing.assert_array_equal(enc, np.arange(9, dtype=np.uint64))
    np.testing.assert_array_equal(zigzag_decode(enc), vals)
    for v in [0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63)]:
        assert zigzag_decode_scalar(zigzag_encode_scalar(v)) == v


# --- randomized / adversarial round-trips (FIXTURES.md F3) ----------------

def _roundtrip(arr, signed):
    buf = rle2.encode(arr, signed)
    back = rle2.decode(buf, signed)
    np.testing.assert_array_equal(back, arr)
    return buf


def test_random_int63_signed_unsigned():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
    _roundtrip(arr, True)
    _roundtrip(arr, False)


def test_random_full_range_signed():
    rng = np.random.default_rng(7)
    arr = rng.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    _roundtrip(arr, True)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 10, 11, 511, 512, 513, 514, 1024, 1030])
@pytest.mark.parametrize("c", [0, 1, -1, 7, 123456789, -(2**62)])
def test_all_equal(n, c):
    arr = np.full(n, c, dtype=np.int64)
    _roundtrip(arr, True)
    if c >= 0:
        buf = _roundtrip(arr, False)
        if 3 <= n <= 10:
            assert buf[0] >> 6 == rle2.SHORT_REPEAT


@pytest.mark.parametrize("step", [1, 3, -2, 100, -1])
def test_monotone_ramps(step):
    arr = np.arange(2000, dtype=np.int64) * step + 5000
    buf = _roundtrip(arr, True)
    # fixed delta collapses whole scopes: 2000 values in 4 chunks, tiny output
    assert len(buf) < 50


def test_mixed_step_monotone():
    rng = np.random.default_rng(3)
    arr = np.cumsum(rng.integers(0, 9, size=5000)).astype(np.int64)
    _roundtrip(arr, True)
    _roundtrip(arr, False)


def test_outliers_force_patched_base():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 100, size=512, dtype=np.int64)
    arr[::57] = 1_000_000  # ~2% outliers
    buf = _roundtrip(arr, False)
    assert buf[0] >> 6 == rle2.PATCHED_BASE


def test_patched_base_gap_gt_255():
    # single outlier at the end of the scope -> gap 511 escape entries
    arr = np.ones(512, dtype=np.int64)
    arr[0] = 2
    arr[511] = 1_000_000
    # break up runs so it stays a variable run
    arr[1::2] = 3
    _roundtrip(arr, False)


def test_patched_base_single_outlier_first():
    arr = np.ones(512, dtype=np.int64)
    arr[1::2] = 2
    arr[0] = 1 << 40
    _roundtrip(arr, False)


def test_width_edges():
    vals = []
    for w in list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 63]:
        vals.extend([(1 << w) - 1, 1 << (w - 1), 3])
    arr = np.array(vals, dtype=np.int64)
    _roundtrip(arr, False)
    _roundtrip(arr, True)
    _roundtrip(-arr, True)


def test_int64_extremes():
    arr = np.array([2**63 - 1, -(2**63), 0, -1, 1, 2**63 - 1, -(2**63), 5, 6, 7],
                   dtype=np.int64)
    _roundtrip(arr, True)


def test_runs_embedded_in_noise():
    rng = np.random.default_rng(5)
    parts = []
    for i in range(50):
        parts.append(rng.integers(0, 1000, size=rng.integers(1, 40)))
        parts.append(np.full(rng.integers(3, 600), int(rng.integers(0, 100))))
    arr = np.concatenate(parts).astype(np.int64)
    _roundtrip(arr, False)
    _roundtrip(arr, True)


def test_short_runs_of_two():
    # pairs must NOT become fixed runs (min repeat is 3)
    arr = np.array([5, 5, 9, 9, 2, 2, 7, 7, 1, 1], dtype=np.int64)
    _roundtrip(arr, False)


def test_empty_and_single():
    assert rle2.encode(np.empty(0, dtype=np.int64), True) == b""
    _roundtrip(np.array([42], dtype=np.int64), False)
    _roundtrip(np.array([-42], dtype=np.int64), True)
