"""Tests for RLEv1, the timestamp split codec (formatNanos) and the DDL
schema parser."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.codecs import rle1
from orc_ray.codecs.timestamp import (
    BASE_SECONDS,
    format_nanos,
    join_ns,
    parse_nanos,
    split_ns,
)
from orc_ray.schema import parse_schema, schema_ddl


# --- RLEv1 -----------------------------------------------------------------

def _rt(arr, signed):
    buf = rle1.encode(np.asarray(arr, dtype=np.int64), signed)
    back = rle1.decode(buf, signed)
    np.testing.assert_array_equal(back, arr)
    return buf


def test_rle1_repeat_run():
    buf = _rt([7] * 100, False)
    assert buf == bytes([100 - 3, 0, 7])  # [count-3, delta=0, base varint]


def test_rle1_arithmetic_run():
    buf = _rt([2, 3, 4], False)
    assert buf == bytes([0, 1, 2])  # run of 3, delta 1, base 2


def test_rle1_literal_then_run():
    buf = _rt([9, 100, 2, 3, 4], False)
    # literal [9,100] then run (2,+1,3)
    assert buf[0] == 256 - 2


def test_rle1_negative_delta_signed():
    _rt([50, 40, 30, 20, 10], True)
    _rt([-5, -6, -7, -8], True)


def test_rle1_long_runs_and_caps():
    _rt([1] * 500, False)        # 130-run chunking
    _rt(list(range(300)), False)  # delta-1 run chunks
    rng = np.random.default_rng(0)
    _rt(rng.integers(0, 10**9, 400).tolist(), False)  # all literals, 128-cap


def test_rle1_random_mixed():
    rng = np.random.default_rng(1)
    parts = []
    for _ in range(40):
        kind = rng.integers(0, 3)
        if kind == 0:
            parts.append(rng.integers(0, 1000, rng.integers(1, 50)))
        elif kind == 1:
            parts.append(np.full(rng.integers(3, 200), int(rng.integers(0, 100))))
        else:
            start = int(rng.integers(0, 1000))
            step = int(rng.integers(-100, 100))
            parts.append(start + step * np.arange(rng.integers(3, 150)))
    arr = np.concatenate(parts).astype(np.int64)
    _rt(arr, True)
    _rt(np.abs(arr), False)


# --- timestamp / formatNanos ----------------------------------------------

def test_format_nanos_reference_vectors():
    # utils_test.go:75-91: 99 -> 0x318, 100 -> 0x9, 1000 -> 0xa, 100000 -> 0xc
    vals = np.array([0, 99, 100, 1000, 100000], dtype=np.int64)
    out = format_nanos(vals)
    np.testing.assert_array_equal(out, [0, 0x318, 0x9, 0xA, 0xC])
    np.testing.assert_array_equal(parse_nanos(out), vals)


def test_timestamp_roundtrip():
    rng = np.random.default_rng(2)
    ts = rng.integers(-(2**52), 2**52, 10000).astype(np.int64)
    # mix in exact-second and trailing-zero-nano values
    ts[::7] = (ts[::7] // 1_000_000_000) * 1_000_000_000
    ts[::11] = (ts[::11] // 100000) * 100000
    secs, nanos = split_ns(ts)
    back = join_ns(secs, nanos)
    np.testing.assert_array_equal(back, ts)


def test_timestamp_base():
    # 2015-01-01T00:00:00Z maps to (0, 0)
    ts = np.array([BASE_SECONDS * 1_000_000_000], dtype=np.int64)
    secs, nanos = split_ns(ts)
    assert secs[0] == 0 and nanos[0] == 0


# --- schema DDL ------------------------------------------------------------

def test_parse_token_schema():
    s = parse_schema("struct<doc_id:string,tokens:array<int>,n_tok:int,source:string>")
    assert s.field("tokens").type == pa.list_(pa.int32())
    assert s.field("doc_id").type == pa.string()


def test_parse_nested_reference_schema():
    # writer_test.go:39 schema
    ddl = ("struct<string1:string,timestamp1:timestamp,int1:int,boolean1:boolean,"
           "double1:double,nested:struct<double2:double,nested:struct<int2:int>>>")
    s = parse_schema(ddl)
    nested = s.field("nested").type
    assert pa.types.is_struct(nested)
    assert nested.field("nested").type.field("int2").type == pa.int32()


def test_parse_map_decimal_union():
    s = parse_schema("struct<m:map<string,bigint>,d:decimal(38,10),"
                     "u:uniontype<int,string>>")
    assert pa.types.is_map(s.field("m").type)
    assert s.field("d").type == pa.decimal128(38, 10)
    assert pa.types.is_union(s.field("u").type)


def test_ddl_roundtrip():
    ddl = "struct<a:int,b:array<bigint>,c:struct<x:string,y:double>,d:date>"
    s = parse_schema(ddl)
    assert schema_ddl(s) == ddl


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_schema("int")  # root must be struct
    with pytest.raises(ValueError):
        parse_schema("struct<a:wibble>")


# --- char/varchar length semantics (treewriter.go:543) ----------------------

def test_char_varchar_ddl_roundtrip():
    ddl = "struct<a:char(5),b:varchar(3),c:string,n:struct<x:char(2)>>"
    s = parse_schema(ddl)
    assert s.field("a").type == pa.string()
    assert s.field("a").metadata[b"orc:type"] == b"char(5)"
    assert s.field("n").type.field("x").metadata[b"orc:type"] == b"char(2)"
    assert schema_ddl(s) == ddl


def test_char_varchar_write_enforcement():
    """varchar(n) truncates, char(n) truncates+space-pads, both by
    codepoint (Hive semantics); the annotation survives the round trip."""
    from orc_ray.stripe import encode_table, decode_blob

    s = parse_schema("struct<a:char(5),b:varchar(3)>")
    t = pa.table({"a": pa.array(["hi", "héllo world", None, ""]),
                  "b": pa.array(["abcdef", "x", None, "ábcd"])}, schema=s)
    blob, meta = encode_table(t)
    out = decode_blob(blob, meta)
    assert out.column("a").to_pylist() == ["hi   ", "héllo", None, "     "]
    assert out.column("b").to_pylist() == ["abc", "x", None, "ábc"]
    assert out.schema.field("a").metadata[b"orc:type"] == b"char(5)"
    assert meta["columns"][0]["orc_type"] == "char(5)"
    assert meta["columns"][1]["orc_type"] == "varchar(3)"


def test_enforce_bounded_kernels():
    from orc_ray.schema import bounded_string_spec, enforce_bounded

    f = pa.field("x", pa.string(), metadata={b"orc:type": b"varchar(4)"})
    assert bounded_string_spec(f) == ("varchar", 4)
    assert bounded_string_spec(pa.field("y", pa.string())) is None
    arr = pa.array(["abcdefg", "ab", None])
    assert enforce_bounded(arr, "varchar", 4).to_pylist() == ["abcd", "ab", None]
    assert enforce_bounded(arr, "char", 4).to_pylist() == ["abcd", "ab  ", None]
