"""Foreign-ORC row-group seek (ORC ROW_INDEX positions).

read_rows() must equal a full-stripe decode + slice for every supported
type, with and without nulls, across compression kinds, at row-group
boundaries and mid-group offsets — and fall back transparently for
nested types and index-less files (golden corpus anchors)."""

import decimal

import numpy as np
import pyarrow as pa
import pyarrow.orc as paorc
import pytest

from orc_ray.sources.orcfile import ORCFile

N = 25000


def _base():
    rng = np.random.default_rng(3)
    n = N
    return {
        "i8": pa.array((np.arange(n) % 120 - 60).astype(np.int8)),
        "i16": pa.array((rng.integers(-3000, 3000, n)).astype(np.int16)),
        "i32": pa.array(rng.integers(-2**30, 2**30, n).astype(np.int32)),
        "i64": pa.array(np.arange(n) * 37, pa.int64()),
        "f32": pa.array(rng.random(n).astype(np.float32)),
        "f64": pa.array(rng.random(n)),
        "b": pa.array((np.arange(n) % 7 < 3)),
        "sdict": pa.array([f"v{j%53}" for j in range(n)]),
        "sdirect": pa.array([f"unique-{j}-{j*j%997}" for j in range(n)]),
        "bin": pa.array([f"B{j%211}".encode() for j in range(n)], pa.binary()),
        "ts": pa.array((1_500_000_000_000_000
                        + np.arange(n) * 1_000_003).astype("datetime64[us]")),
        "date": pa.array((np.arange(n) % 20000).astype("datetime64[D]")),
        "dec": pa.array([decimal.Decimal(int(x)) / 100
                         for x in rng.integers(-10**6, 10**6, n)],
                        pa.decimal128(12, 2)),
    }


def _with_nulls(t):
    cols = {}
    for nm in t.column_names:
        col = t.column(nm)
        mask = (np.arange(N) * 7919 + hash(nm)) % 5 == 0
        cols[nm] = pa.array(
            [None if m else v for v, m in zip(col.to_pylist(), mask)],
            col.type)
    return pa.table(cols)


WINDOWS = [(10000, 20000), (20000, 25000), (10007, 19993), (24990, 25000),
           (0, 5), (9999, 10001), (20000, 20001)]


@pytest.mark.parametrize("nulls,comp", [
    (False, "zlib"), (True, "zlib"),
    (False, "uncompressed"), (True, "snappy"),
])
def test_read_rows_matches_slice(tmp_path, nulls, comp):
    tbl = pa.table(_base())
    if nulls:
        tbl = _with_nulls(tbl)
    dst = str(tmp_path / f"seek_{nulls}_{comp}.orc")
    paorc.write_table(tbl, dst, compression=comp, stripe_size=50_000_000)
    f = ORCFile(dst)
    assert f.row_index_stride == 10000 and len(f.stripes) == 1
    full = f.read_stripe(0)
    for lo, hi in WINDOWS:
        assert f.read_rows(0, lo, hi).equals(full.slice(lo, hi - lo)), \
            (nulls, comp, lo, hi)
    got = f.read_rows(0, 20000, 20010, columns=["i64", "sdirect", "b"])
    cols = sorted(got.column_names)
    assert got.select(cols).equals(full.select(cols).slice(20000, 10))


def test_read_rows_seek_plan_used(tmp_path):
    """Mid-stripe reads must actually take the seek path (positions with
    nonzero skips), not the fallback."""
    tbl = pa.table(_base())
    dst = str(tmp_path / "plan.orc")
    paorc.write_table(tbl, dst, compression="zlib", stripe_size=50_000_000)
    f = ORCFile(dst)
    seek, skips = f._seek_plan(0, None, 2)
    assert seek and any(v for v in skips.values())
    # every positioned stream starts past byte 0 or carries a skip
    assert any(c or d for (c, d) in seek.values())


def test_read_rows_fallback_nested_and_golden():
    """Nested golden file: read_rows falls back to full decode + slice and
    stays row-identical; flat golden split-elim file seeks stripes with a
    single row group."""
    src = "/root/reference/examples/TestOrcFile.testSeek.orc"
    f = ORCFile(src)
    full = f.read_stripe(0)
    got = f.read_rows(0, 11000, 11020)
    assert got.equals(full.slice(11000, 20))

    f2 = ORCFile("/root/reference/examples/orc_split_elim.orc")
    full2 = f2.read_stripe(1)
    assert f2.read_rows(1, 2, 5).equals(full2.slice(2, 3))


def test_read_orc_rowgroup_pushdown(ray_session, tmp_path):
    """Predicate reads through read_orc prune row groups inside surviving
    stripes: a sorted key means a narrow range decodes one group span,
    and results stay exactly equal to the full-scan filter."""
    import pyarrow.compute as pc

    from orc_ray.sources.orcfile import read_orc

    n = 60000
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "v": pa.array([j % 1009 for j in range(n)], pa.int64()),
        "s": pa.array([f"row{j}" for j in range(n)]),
    })
    dst = str(tmp_path / "big.orc")
    paorc.write_table(t, dst, compression="zlib", stripe_size=500_000_000)
    f = ORCFile(dst)
    assert len(f.stripes) == 1 and f.row_index_stride == 10000

    for lo, hi in [(25000, 26000), (0, 3), (59990, 59999), (10000, 39999)]:
        ds = read_orc(dst, columns=["v", "s"], predicate=("k", lo, hi))
        got = pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow", batch_size=None))
        want = t.filter(pc.and_(pc.greater_equal(t.column("k"), lo),
                                pc.less_equal(t.column("k"), hi)))
        assert got.num_rows == want.num_rows
        assert sorted(got.column("s").to_pylist()) == \
            sorted(want.column("s").to_pylist())

    # all groups pruned inside the surviving stripe -> typed empty
    ds0 = read_orc(dst, columns=["v"], predicate=("k", 10**9, 10**9))
    assert ds0.count() == 0


def test_timestamp_predicate_never_pruned_wrong(ray_session, tmp_path):
    """Timestamp stats/blooms are epoch-ms while predicates arrive in the
    column's own unit; pruning must be disabled for kind 9 so the exact
    filter (which handles the unit correctly) is authoritative."""
    import pyarrow.compute as pc

    from orc_ray.sources.orcfile import read_orc

    n = 30000
    ts = (1_600_000_000_000_000 + np.arange(n) * 1_000_000)  # us
    t = pa.table({"ts": pa.array(ts.astype("datetime64[us]")),
                  "v": pa.array(range(n), pa.int64())})
    dst = str(tmp_path / "ts.orc")
    paorc.write_table(t, dst, compression="zlib", stripe_size=64 * 1024)
    f = ORCFile(dst)
    assert sum(st.number_of_rows for st in f.stripes) == n  # 3 row groups
    lo = pa.scalar(int(ts[15000]) * 1000, pa.timestamp("ns"))
    hi = pa.scalar(int(ts[15099]) * 1000, pa.timestamp("ns"))
    ds = read_orc(dst, columns=["v"], predicate=("ts", lo, hi))
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
    assert sorted(got.column("v").to_pylist()) == list(range(15000, 15100))
