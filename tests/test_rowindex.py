"""Seek-point (ROW_INDEX analogue) tests: partial-stripe row-range decode
must be byte-sparse — a 10k-row read from a 1M-row stripe touches <5% of
the blob (reference positionrecorder.go:1-12, writer.go:337-384,
cursor.go:179-198)."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.config import EncoderConfig
from orc_ray.stripe import decode_blob, decode_blob_rows, encode_table


@pytest.fixture(scope="module")
def big_stripe():
    rng = np.random.default_rng(7)
    n = 1_000_000
    lens = rng.integers(1, 40, n)
    total = int(lens.sum())
    vals = rng.integers(0, 50257, total).astype(np.int32)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(off.astype(np.int32), type=pa.int32()),
        pa.array(vals, type=pa.int32()))
    t = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "tokens": tokens,
        "n_tok": pa.array(lens.astype(np.int32), type=pa.int32()),
        "source": pa.array(
            np.array(["web", "book", "code", "wiki"])[rng.integers(0, 4, n)]),
        "title": pa.array([f"doc-{i:07d}" for i in range(n)]),
    })
    cfg = EncoderConfig(stripe_target_tokens=10**9)
    blob, meta = encode_table(t, cfg)
    return t, bytes(blob), meta


def test_range_decode_correct_at_boundaries(big_stripe):
    t, blob, meta = big_stripe
    for (r0, cnt) in [(612345, 10000), (0, 10000), (995000, 5000), (7, 3),
                      (999999, 1)]:
        sub, _ = decode_blob_rows(blob, meta, r0, cnt)
        exp = t.slice(r0, cnt)
        assert sub.num_rows == cnt
        for c in t.column_names:
            assert exp.column(c).combine_chunks().to_pylist() == \
                sub.column(c).combine_chunks().to_pylist(), (c, r0)


def test_range_decode_is_byte_sparse(big_stripe):
    t, blob, meta = big_stripe
    sub, touched = decode_blob_rows(blob, meta, 612345, 10000)
    assert sub.num_rows == 10000
    frac = touched / len(blob)
    assert frac < 0.05, f"10k of 1M rows touched {frac:.1%} of the blob"


def test_range_decode_column_projection(big_stripe):
    t, blob, meta = big_stripe
    sub, touched = decode_blob_rows(blob, meta, 500000, 1000,
                                    columns=["n_tok"])
    assert sub.column_names == ["n_tok"]
    assert sub.column("n_tok").to_pylist() == \
        t.slice(500000, 1000).column("n_tok").to_pylist()
    assert touched / len(blob) < 0.01  # single small column: ~one chunk


def test_full_decode_unaffected_by_indexes(big_stripe):
    t, blob, meta = big_stripe
    assert decode_blob(blob, meta).equals(t)


def test_pipeline_read_rows(ray_session, tmp_path):
    import ray.data

    from orc_ray.pipelines.decode import read_rows
    from orc_ray.pipelines.encode import encode_dataset_streaming

    rng = np.random.default_rng(3)
    n = 30_000
    lens = rng.integers(1, 30, n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    vals = rng.integers(0, 50257, int(off[-1])).astype(np.int32)
    t = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "tokens": pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), type=pa.int32()),
            pa.array(vals, type=pa.int32())),
        "n_tok": pa.array(lens.astype(np.int32), type=pa.int32()),
        "source": pa.array(["s"] * n),
    })
    out = str(tmp_path / "enc")
    cfg = EncoderConfig(stripe_target_tokens=100_000, row_index_stride=1000)
    encode_dataset_streaming(ray.data.from_arrow(t), out, cfg,
                             batch_rows=10_000, concurrency=2).materialize()
    ds = read_rows(out, 12_345, 4_321, concurrency=2)
    got = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert got.num_rows == 4_321
    # rows come back in manifest order; compare as a doc_id-keyed set
    got_ids = sorted(got.column("doc_id").to_pylist())
    # streaming path preserves input order per batch; global ids are unique
    assert len(set(got_ids)) == 4_321
    by_id = {r["doc_id"]: r for r in got.to_pylist()}
    exp = t.slice(12_345, 4_321).to_pylist() if got_ids == list(
        range(12_345, 12_345 + 4_321)) else None
    if exp is not None:
        for r in exp:
            assert by_id[r["doc_id"]]["tokens"] == r["tokens"]
            assert by_id[r["doc_id"]]["n_tok"] == r["n_tok"]


@pytest.fixture(scope="module")
def nullable_stripe():
    rng = np.random.default_rng(21)
    n = 1_000_000
    null_mask = rng.random(n) < 0.1
    ints = rng.integers(0, 1 << 30, n)
    floats = rng.random(n)
    srcs = np.array(["web", "book", "code", "wiki"])[rng.integers(0, 4, n)]
    ts = (1735689600_000_000 + rng.integers(0, 10**9, n)).astype("datetime64[us]")
    t = pa.table({
        "i": pa.array(ints, type=pa.int64(), mask=null_mask),
        "f": pa.array(floats, type=pa.float64(), mask=null_mask),
        "s": pa.array([f"value-{v:09d}" for v in ints], type=pa.string(),
                      mask=null_mask),
        "dct": pa.array(srcs.tolist(), type=pa.string(), mask=null_mask),
        "ts": pa.array(ts, type=pa.timestamp("us"), mask=null_mask),
    })
    cfg = EncoderConfig(stripe_target_tokens=10**9)
    blob, meta = encode_table(t, cfg)
    return t, bytes(blob), meta


def test_nullable_range_decode_correct(nullable_stripe):
    t, blob, meta = nullable_stripe
    for (r0, cnt) in [(612345, 10000), (0, 1000), (999000, 1000), (7, 3)]:
        sub, _ = decode_blob_rows(blob, meta, r0, cnt)
        exp = t.slice(r0, cnt)
        assert sub.num_rows == cnt
        for c in t.column_names:
            assert exp.column(c).combine_chunks().to_pylist() == \
                sub.column(c).combine_chunks().to_pylist(), (c, r0)


def test_nullable_range_decode_is_byte_sparse(nullable_stripe):
    """PRESENT-aware range decode: a nullable column must keep the
    byte-sparse property (the present stream is scanned whole but it is
    bits-per-row tiny; the data streams range-read)."""
    t, blob, meta = nullable_stripe
    sub, touched = decode_blob_rows(blob, meta, 612345, 10000)
    assert sub.num_rows == 10000
    frac = touched / len(blob)
    assert frac < 0.10, f"10k of 1M nullable rows touched {frac:.1%}"


def test_fsst_string_range_decode_byte_sparse():
    """An FSST-coded direct string stream must range-read through its
    byte_index (symbol-table header + covering token-byte slice), not
    whole-read the blob."""
    n = 400_000
    vals = np.arange(n) * 7919 % (1 << 30)
    t = pa.table({"doc_id": pa.array(
        [f"doc/shard-{v:09d}/part" for v in vals], type=pa.string())})
    cfg = EncoderConfig(stripe_target_tokens=10**9,
                        string_blob_candidates=("fsst",))
    blob, meta = encode_table(t, cfg)
    codecs = {s["column"]: s["codec"] for s in meta["streams"]
              if s["kind"] == "DATA"}
    assert codecs["doc_id"] == "fsst"
    sub, touched = decode_blob_rows(bytes(blob), meta, 250_000, 5000)
    assert sub.column("doc_id").to_pylist() == \
        t.slice(250_000, 5000).column("doc_id").to_pylist()
    assert touched / len(blob) < 0.05, f"touched {touched/len(blob):.1%}"


def test_range_decode_fallback_types():
    """Columns without fast range paths (nulls, structs, decimals, bools)
    still range-decode correctly via the full-stream fallback."""
    import decimal as D

    n = 5000
    rng = np.random.default_rng(11)
    t = pa.table({
        "i": pa.array([None if k % 7 == 0 else k for k in range(n)],
                      type=pa.int64()),
        "st": pa.array([{"a": k, "b": f"s{k % 5}"} for k in range(n)],
                       type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "d": pa.array([D.Decimal(k) / 100 for k in range(n)],
                      type=pa.decimal128(20, 2)),
        "bl": pa.array((rng.integers(0, 2, n) == 1).tolist(), type=pa.bool_()),
        "f": pa.array(rng.random(n), type=pa.float64()),
    })
    cfg = EncoderConfig(stripe_target_tokens=10**9, row_index_stride=500)
    blob, meta = encode_table(t, cfg)
    for (r0, cnt) in [(1234, 700), (0, 10), (4990, 10)]:
        sub, _ = decode_blob_rows(bytes(blob), meta, r0, cnt)
        exp = t.slice(r0, cnt)
        for c in t.column_names:
            assert exp.column(c).combine_chunks().to_pylist() == \
                sub.column(c).combine_chunks().to_pylist(), (c, r0)


@pytest.fixture(scope="module")
def exotic_stripe():
    """binary / decimal / struct columns at 1M rows: the encodings that
    gained range paths after round 3 (binary rides the direct string
    path, decimal range-reads its lo/hi int64 streams, struct recurses
    into per-child range decodes)."""
    rng = np.random.default_rng(33)
    n = 1_000_000
    ints = rng.integers(0, 1 << 30, n)
    null_mask = rng.random(n) < 0.1
    payload = pa.array(
        [f"blob-{v:012d}".encode() for v in ints], type=pa.binary())
    dec = pa.Array.from_buffers(
        pa.decimal128(20, 2), n,
        [None, pa.py_buffer(np.column_stack(
            [ints.astype(np.int64),
             np.zeros(n, dtype=np.int64)]).tobytes())])
    t = pa.table({
        "bin": payload,
        "bin_null": pa.array(
            [f"b{v:08d}".encode() for v in ints], type=pa.binary(),
            mask=null_mask),
        "dec": dec,
        "st": pa.StructArray.from_arrays(
            [pa.array(ints, type=pa.int64()),
             pa.array([f"s-{v:09d}" for v in ints], type=pa.string())],
            names=["a", "b"]),
    })
    cfg = EncoderConfig(stripe_target_tokens=10**9)
    blob, meta = encode_table(t, cfg)
    return t, bytes(blob), meta


def test_exotic_range_decode_correct(exotic_stripe):
    t, blob, meta = exotic_stripe
    for (r0, cnt) in [(612345, 10000), (0, 1000), (999000, 1000), (7, 3)]:
        sub, _ = decode_blob_rows(blob, meta, r0, cnt)
        exp = t.slice(r0, cnt)
        assert sub.num_rows == cnt
        for c in t.column_names:
            assert exp.column(c).combine_chunks().to_pylist() == \
                sub.column(c).combine_chunks().to_pylist(), (c, r0)


def test_exotic_range_decode_is_byte_sparse(exotic_stripe):
    t, blob, meta = exotic_stripe
    for col, cap in [("bin", 0.05), ("bin_null", 0.10), ("dec", 0.05),
                     ("st", 0.05)]:
        sub, touched = decode_blob_rows(blob, meta, 612345, 10000,
                                        columns=[col])
        assert sub.num_rows == 10000
        frac = touched / len(blob)
        assert frac < cap, f"{col}: 10k of 1M rows touched {frac:.1%}"


@pytest.fixture(scope="module")
def nested_stripe():
    """map and recursive-child list columns at 400k rows: the generic
    LENGTH-anchored range path (elem_offsets -> child value range ->
    per-child recursion)."""
    rng = np.random.default_rng(44)
    n = 400_000
    lens = rng.integers(1, 5, n)
    total = int(lens.sum())
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    words = pa.array([f"w{v:06d}" for v in rng.integers(0, 99_991, total)])
    lst = pa.ListArray.from_arrays(
        pa.array(off.astype(np.int32), type=pa.int32()), words)
    null_mask = rng.random(n) < 0.1
    ints = rng.integers(0, 1 << 20, n)
    lst_null = pa.ListArray.from_arrays(
        pa.array(off.astype(np.int32), type=pa.int32()),
        pa.array(rng.integers(0, 1 << 20, total), type=pa.int64()))
    lst_null = lst_null.filter(pa.array(~null_mask)).take(
        pa.array(np.clip(np.cumsum(~null_mask) - 1, 0, None), type=pa.int64()))
    lst_null = pa.ListArray.from_arrays(
        pa.array(lst_null.offsets), lst_null.values, mask=pa.array(null_mask))
    mp = pa.MapArray.from_arrays(
        pa.array(np.arange(0, 2 * n + 1, 2, dtype=np.int32), type=pa.int32()),
        pa.array([f"k{v % 7}" for v in range(2 * n)]),
        pa.array(np.arange(2 * n), type=pa.int64()))
    t = pa.table({"words": lst, "ln": lst_null, "kv": mp,
                  "i": pa.array(ints, type=pa.int64())})
    cfg = EncoderConfig(stripe_target_tokens=10**9)
    blob, meta = encode_table(t, cfg)
    return t, bytes(blob), meta


def test_nested_range_decode_correct(nested_stripe):
    t, blob, meta = nested_stripe
    for (r0, cnt) in [(212345, 5000), (0, 1000), (399000, 1000), (7, 3)]:
        sub, _ = decode_blob_rows(blob, meta, r0, cnt)
        exp = t.slice(r0, cnt)
        assert sub.num_rows == cnt
        for c in t.column_names:
            assert exp.column(c).combine_chunks().to_pylist() == \
                sub.column(c).combine_chunks().to_pylist(), (c, r0)


def test_nested_range_decode_is_byte_sparse(nested_stripe):
    t, blob, meta = nested_stripe
    for col, cap in [("words", 0.08), ("ln", 0.12), ("kv", 0.08)]:
        sub, touched = decode_blob_rows(blob, meta, 212345, 5000,
                                        columns=[col])
        assert sub.num_rows == 5000
        frac = touched / len(blob)
        assert frac < cap, f"{col}: 5k of 400k rows touched {frac:.1%}"
