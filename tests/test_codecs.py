"""Unit tests for the non-RLEv2 codec kernels: byte RLE, boolean bitstream,
frame-of-reference, chunked zlib, dictionary, FSST.

Byte vectors ported from the reference tests:
booleanwriter_test.go:10-42, compressioncodec_test.go:21-46."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.codecs import byterle, dictionary, forpack, fsst, zlibchunk


# --- byte RLE / boolean ----------------------------------------------------

def test_boolean_vector():
    # {T,F,F,F,F,F,F,F} -> 0xff 0x80 (booleanwriter_test.go:15-23)
    bits = np.array([True] + [False] * 7)
    assert byterle.encode_bools(bits) == bytes([0xFF, 0x80])
    np.testing.assert_array_equal(byterle.decode_bools(bytes([0xFF, 0x80]), 8), bits)


def test_byte_rle_runs():
    arr = np.array([7] * 100, dtype=np.uint8)
    buf = byterle.encode_bytes(arr)
    assert buf == bytes([100 - 3, 7])
    np.testing.assert_array_equal(byterle.decode_bytes(buf), arr)


def test_byte_rle_literals():
    arr = np.arange(200, dtype=np.uint8)
    buf = byterle.encode_bytes(arr)
    # two literal groups: 128 + 72
    assert buf[0] == 256 - 128 and buf[129] == 256 - 72
    np.testing.assert_array_equal(byterle.decode_bytes(buf), arr)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_byte_rle_random_roundtrip(seed):
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(100):
        parts.append(rng.integers(0, 256, size=rng.integers(1, 50), dtype=np.uint8))
        parts.append(np.full(rng.integers(1, 300), rng.integers(0, 256), dtype=np.uint8))
    arr = np.concatenate(parts)
    np.testing.assert_array_equal(byterle.decode_bytes(byterle.encode_bytes(arr)), arr)


def test_bool_random_roundtrip():
    rng = np.random.default_rng(42)
    bits = rng.random(100_000) < 0.9
    buf = byterle.encode_bools(bits)
    np.testing.assert_array_equal(byterle.decode_bools(buf, len(bits)), bits)


# --- frame of reference ----------------------------------------------------

@pytest.mark.parametrize("lo,hi", [(0, 50257), (-1000, 1000), (10**12, 10**12 + 5),
                                   (-(2**62), 2**62)])
def test_forpack_roundtrip(lo, hi):
    rng = np.random.default_rng(1)
    arr = rng.integers(lo, hi + 1, size=10_000, dtype=np.int64)
    np.testing.assert_array_equal(forpack.decode(forpack.encode(arr)), arr)


def test_forpack_constant_and_empty():
    arr = np.full(100, 42, dtype=np.int64)
    buf = forpack.encode(arr)
    assert len(buf) < 20
    np.testing.assert_array_equal(forpack.decode(buf), arr)
    assert len(forpack.decode(forpack.encode(np.empty(0, np.int64)))) == 0


def test_forpack_int64_extremes():
    arr = np.array([2**63 - 1, -(2**63), 0], dtype=np.int64)
    np.testing.assert_array_equal(forpack.decode(forpack.encode(arr)), arr)


# --- chunked zlib ----------------------------------------------------------

def test_zlib_chunk_headers():
    # compressioncodec_test.go:21-46: len 100000 compressed -> 40 0d 03;
    # len 5 original -> 0b 00 00
    assert zlibchunk._header(100_000, False) == bytes([0x40, 0x0D, 0x03])
    assert zlibchunk._header(5, True) == bytes([0x0B, 0x00, 0x00])


def test_zlib_roundtrip_compressible():
    data = b"hello world " * 50_000
    comp = zlibchunk.compress(data)
    assert len(comp) < len(data) // 10
    assert zlibchunk.decompress(comp) == data


def test_zlib_roundtrip_incompressible():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
    comp = zlibchunk.compress(data)
    # stored chunks: 3-byte header per 256 KiB chunk only
    assert len(comp) <= len(data) + 3 * 3
    assert zlibchunk.decompress(comp) == data


# --- dictionary ------------------------------------------------------------

def test_dictionary_sorted_roundtrip():
    arr = pa.array(["web", "books", "code", "web", "web", "books", "", "zzz"])
    idx, blob, lengths = dictionary.dictionary_encode(arr)
    # dictionary sorted lexicographically: "", books, code, web, zzz
    dict_arr = dictionary.strings_from_blob(blob, lengths)
    assert dict_arr.to_pylist() == ["", "books", "code", "web", "zzz"]
    out = dictionary.dictionary_decode(idx, blob, lengths)
    assert out.to_pylist() == arr.to_pylist()


def test_string_blob_sliced_array():
    arr = pa.array(["aa", "bbb", "c", "dddd"]).slice(1, 2)
    blob, lengths = dictionary.string_blob(arr)
    assert blob == b"bbbc"
    np.testing.assert_array_equal(lengths, [3, 1])


# --- FSST ------------------------------------------------------------------

def _strs_to_blob(strs):
    data = [s.encode() for s in strs]
    blob = np.frombuffer(b"".join(data), dtype=np.uint8)
    offsets = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in data], out=offsets[1:])
    return blob, offsets


def test_fsst_roundtrip_docids():
    strs = [f"src{i % 20}-{i:012d}" for i in range(5000)]
    blob, offsets = _strs_to_blob(strs)
    comp, comp_lens = fsst.compress_auto(blob, offsets)
    assert len(comp) < len(blob) * 0.7  # must actually compress
    out_blob, out_lens = fsst.decompress(comp, comp_lens)
    assert out_blob == blob.tobytes()
    np.testing.assert_array_equal(out_lens, np.diff(offsets))


def test_fsst_roundtrip_empty_and_binary():
    data = [b"", b"\xff\xff\x00", b"abc", b"", b"\xff" * 20]
    blob = np.frombuffer(b"".join(data), dtype=np.uint8)
    offsets = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in data], out=offsets[1:])
    comp, comp_lens = fsst.compress_auto(blob, offsets)
    out_blob, out_lens = fsst.decompress(comp, comp_lens)
    assert out_blob == blob.tobytes()
    np.testing.assert_array_equal(out_lens, [len(d) for d in data])


def test_fsst_random_ascii_roundtrip():
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "tok", "en", "stream"]
    strs = [" ".join(rng.choice(words, size=rng.integers(0, 12))) for _ in range(2000)]
    blob, offsets = _strs_to_blob(strs)
    comp, comp_lens = fsst.compress_auto(blob, offsets)
    out_blob, out_lens = fsst.decompress(comp, comp_lens)
    assert out_blob == blob.tobytes()
    np.testing.assert_array_equal(out_lens, np.diff(offsets))


def test_fsst_empty_table_passthrough():
    # empty symbol table -> everything escaped, still round-trips
    table = fsst.SymbolTable([])
    blob, offsets = _strs_to_blob(["ab", "c"])
    comp, comp_lens = fsst.compress(table, blob, offsets)
    out_blob, out_lens = fsst.decompress(comp, comp_lens)
    assert out_blob == b"abc"
    np.testing.assert_array_equal(out_lens, [2, 1])


# --- cardinality sketch ----------------------------------------------------

def test_cardinality_sketch_accuracy():
    import pyarrow as pa

    from orc_ray.codecs.dictionary import string_hashes64
    from orc_ray.selector import CardinalitySketch

    for true_n in (5, 100, 3000, 40000):
        sk = CardinalitySketch()
        vals = [f"value-{i % true_n:08d}" for i in range(true_n * 2)]
        # feed in two batches (cross-batch merge is the point)
        for half in (vals[: true_n], vals[true_n:]):
            sk.add_hashes(string_hashes64(pa.array(half)))
        est = sk.estimate()
        assert abs(est - true_n) / true_n < 0.15, (true_n, est)


def test_sketch_in_selector_state():
    import pyarrow as pa

    from orc_ray.config import EncoderConfig
    from orc_ray.selector import SelectorState
    from orc_ray.stripe import encode_table

    sel = SelectorState(EncoderConfig())
    t = pa.table({"s": pa.array([f"v{i % 50}" for i in range(2000)])})
    for _ in range(3):
        encode_table(t, EncoderConfig(), selector=sel, group="web")
    summary = sel.sketch_summary()
    assert "web/s" in summary
    assert abs(summary["web/s"]["distinct_est"] - 50) < 10
    assert summary["web/s"]["values_seen"] == 6000


# --- snappy block decoder (decode-only, compressioncodec.go:222-284) -------

def test_snappy_literal_only():
    from orc_ray.codecs import snappyblock

    payload = b"hello world"
    # varint len + literal tag ((len-1)<<2) + bytes
    raw = bytes([len(payload)]) + bytes([(len(payload) - 1) << 2]) + payload
    assert snappyblock.decompress_raw(raw) == payload


def test_snappy_copy_with_overlap():
    from orc_ray.codecs import snappyblock

    # "abcabcabcabc": literal "abc" then overlapping copy len=9 offset=3
    # copy-1-byte-offset tag: kind 01, len 4..11 -> (len-4)<<2 | 1,
    # offset high 3 bits in tag<<5, low byte follows
    out = b"abc" + b"abcabcabc"
    raw = bytes([len(out)])
    raw += bytes([(3 - 1) << 2]) + b"abc"
    raw += bytes([((9 - 4) << 2) | 1 | ((3 >> 8) << 5), 3 & 0xFF])
    assert snappyblock.decompress_raw(raw) == out


def test_snappy_two_byte_offset_and_long_literal():
    from orc_ray.codecs import snappyblock

    lit = bytes(range(256)) * 2  # 512-byte literal needs the 60+ length form
    out = lit + lit[:64]
    raw = bytearray()
    n = len(out)
    while True:  # varint
        b = n & 0x7F
        n >>= 7
        raw.append(b | (0x80 if n else 0))
        if not n:
            break
    raw.append((61 << 2))  # literal, 2 extra length bytes
    raw += (len(lit) - 1).to_bytes(2, "little")
    raw += lit
    raw.append(((64 - 1) << 2) | 2)  # copy, 2-byte offset (max len 64)
    raw += (512).to_bytes(2, "little")
    assert snappyblock.decompress_raw(bytes(raw)) == out


def test_snappy_orc_framing():
    from orc_ray.codecs import snappyblock

    payload = b"framed bytes"
    # original (uncompressed) chunk: header (len<<1)|1
    h = (len(payload) << 1) | 1
    framed = bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) + payload
    assert snappyblock.decompress(framed) == payload


def test_snappy_encoder_roundtrips():
    import numpy as np

    from orc_ray.codecs import snappyblock as sb

    rng = np.random.default_rng(5)
    cases = [
        b"",
        b"abc",
        b"aaaa",
        b"abcd" * 1000,                      # long match chains, 64+ splits
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),   # incompressible
        b"x" * 67,                           # the 65..67 copy-split edge
        b"The quick brown fox " * 37,
        # far-back match (> 64 KiB offset => 4-byte-offset copies)
        b"PATTERN-0123456789" * 4
        + bytes(rng.integers(0, 256, 70000, dtype=np.uint8))
        + b"PATTERN-0123456789" * 4,
    ]
    for data in cases:
        assert sb.decompress_raw(sb.compress_raw(data)) == data
        assert sb.decompress(sb.compress(data)) == data
    rep = b"hello world, hello world, hello world! " * 500
    assert len(sb.compress_raw(rep)) < len(rep) // 2
    # multi-chunk framing
    big = (b"seed" + bytes(rng.integers(0, 256, 300_000, dtype=np.uint8))) * 2
    assert sb.decompress(sb.compress(big)) == big


def test_snappy_outer_stripe_roundtrip():
    from orc_ray.config import EncoderConfig
    from orc_ray.sources.tokens import synthesize_tokens
    from orc_ray.stripe import decode_blob, encode_table

    t = synthesize_tokens(400, seed=31)
    blob, meta = encode_table(t, EncoderConfig(outer_compression="snappy"))
    assert any(s["outer"] == "snappy" for s in meta["streams"])
    got = decode_blob(blob, meta)
    assert got.equals(t) or got.cast(t.schema).equals(t)
