"""Hypothesis property tests for the codec kernels (FIXTURES.md F3's
randomized strategy, strengthened with shrinking)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from orc_ray.codecs import byterle, forpack, planar, rle1, rle2
from orc_ray.codecs.timestamp import join_ns, split_ns

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)
small_ints = st.integers(min_value=-1000, max_value=1000)


def _mixed_arrays(draw, elements):
    parts = draw(st.lists(
        st.tuples(
            st.sampled_from(["lit", "run", "ramp"]),
            st.integers(min_value=1, max_value=60),
        ),
        min_size=1, max_size=8,
    ))
    rng_seed = draw(st.integers(min_value=0, max_value=2**16))
    rng = np.random.default_rng(rng_seed)
    out = []
    for kind, n in parts:
        if kind == "lit":
            out.append(rng.integers(-(2**40), 2**40, n))
        elif kind == "run":
            out.append(np.full(n, int(rng.integers(-(2**30), 2**30))))
        else:
            out.append(int(rng.integers(-1000, 1000))
                       + int(rng.integers(-50, 50)) * np.arange(n))
    return np.concatenate(out).astype(np.int64)


mixed = st.builds(lambda d: d, st.composite(_mixed_arrays)(elements=None))


@settings(max_examples=60, deadline=None)
@given(arr=mixed, signed=st.booleans())
def test_rle2_roundtrip_property(arr, signed):
    if not signed and (arr < 0).any():
        arr = np.abs(arr)
    buf = rle2.encode(arr, signed)
    np.testing.assert_array_equal(rle2.decode(buf, signed), arr)


@settings(max_examples=40, deadline=None)
@given(arr=mixed, signed=st.booleans())
def test_rle1_roundtrip_property(arr, signed):
    buf = rle1.encode(arr, signed)
    np.testing.assert_array_equal(rle1.decode(buf, signed), arr)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(int64s, min_size=0, max_size=300))
def test_forpack_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    np.testing.assert_array_equal(forpack.decode(forpack.encode(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(int64s, min_size=0, max_size=300))
def test_planar_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    np.testing.assert_array_equal(planar.decode(planar.encode(arr)), arr)


int32s = st.integers(min_value=-(2**31), max_value=2**31 - 1)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(int32s, min_size=0, max_size=300))
def test_planar_int32_out_dtype_property(vals):
    arr = np.array(vals, dtype=np.int32)
    got = planar.decode(planar.encode(arr), out_dtype=np.int32)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, arr)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=2000))
def test_byterle_roundtrip_property(data):
    arr = np.frombuffer(data, dtype=np.uint8)
    np.testing.assert_array_equal(byterle.decode_bytes(byterle.encode_bytes(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(bits=st.lists(st.booleans(), min_size=0, max_size=1000))
def test_boolrle_roundtrip_property(bits):
    arr = np.array(bits, dtype=bool)
    buf = byterle.encode_bools(arr)
    np.testing.assert_array_equal(byterle.decode_bools(buf, len(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.integers(min_value=-(2**52), max_value=2**52),
                     min_size=1, max_size=200))
def test_timestamp_roundtrip_property(vals):
    ts = np.array(vals, dtype=np.int64)
    secs, nanos = split_ns(ts)
    np.testing.assert_array_equal(join_ns(secs, nanos), ts)
