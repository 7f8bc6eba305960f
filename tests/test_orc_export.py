"""Apache-ORC export surface (orcwriter.py + pipelines/export_orc.py).

Cross-validation strategy mirrors the import path's: every exported file
must read back row-identical through BOTH pyarrow.orc (the ecosystem
reader — real-ORC proof) and this repo's own ORCFile reader, across all
CompressionKinds we write, every scalar + nested type, null densities,
and multi-stripe files.  Reference parity target: writer.go:107-497,
treewriter.go:15-1219 (the reference's whole write path)."""

import decimal

import numpy as np
import pyarrow as pa
import pyarrow.orc as paorc
import pyarrow.parquet as pq
import pytest

from orc_ray.pipelines.export_orc import export_orc_dataset
from orc_ray.sources.orcfile import ORCFile
from orc_ray.sources.orcwriter import write_orc_file

SF = "/root/testdata/sf0.001"


def _roundtrip_both(t: pa.Table, path: str, **kw):
    write_orc_file(t, path, **kw)
    for reader in ("pyarrow", "own"):
        got = (paorc.ORCFile(path).read() if reader == "pyarrow"
               else ORCFile(path).read())
        assert got.num_rows == t.num_rows, reader
        for c in t.column_names:
            a = t.column(c).combine_chunks()
            b = got.column(c).combine_chunks()
            if a.type != b.type:
                b = b.cast(a.type)
            assert a.to_pylist() == b.to_pylist(), (reader, c)


def test_export_driver_tables(tmp_path):
    """Every driver-shaped table (ints, strings, doubles, us-timestamps,
    maps, list<int>) exports to ORC that pyarrow and our reader agree on."""
    for name in ("supplier", "events", "lineitem", "documents"):
        t = pq.read_table(f"{SF}/{name}.parquet")
        _roundtrip_both(t, str(tmp_path / f"{name}.orc"))


@pytest.mark.parametrize("comp", ["zlib", "none", "snappy", "zstd"])
def test_export_all_types_all_codecs(tmp_path, comp):
    """Torture table: every writable kind, 20% nulls at every level,
    multi-stripe, under each CompressionKind we emit."""
    rng = np.random.default_rng(7)
    n = 3000

    def nulls(vals, p=0.2):
        return [None if rng.random() < p else v for v in vals]

    t = pa.table({
        "b": pa.array(nulls([bool(x % 2) for x in range(n)]), pa.bool_()),
        "i8": pa.array(nulls(rng.integers(-128, 128, n).tolist()), pa.int8()),
        "i16": pa.array(nulls(rng.integers(-2**15, 2**15, n).tolist()),
                        pa.int16()),
        "i32": pa.array(nulls(rng.integers(-2**31, 2**31, n).tolist()),
                        pa.int32()),
        "i64": pa.array(nulls(rng.integers(-2**60, 2**60, n).tolist()),
                        pa.int64()),
        "f32": pa.array(nulls(rng.normal(size=n).tolist()), pa.float32()),
        "f64": pa.array(nulls(rng.normal(size=n).tolist()), pa.float64()),
        "s_dict": pa.array(nulls([f"cat{int(v)}"
                                  for v in rng.integers(0, 20, n)])),
        "s_direct": pa.array(nulls([f"u-{i}-{rng.integers(0, 9)}"
                                    for i in range(n)])),
        "bin": pa.array(nulls([bytes(rng.integers(0, 256, int(
            rng.integers(0, 12))).tolist()) for _ in range(n)]), pa.binary()),
        "d": pa.array(nulls(rng.integers(-20000, 20000, n).tolist()),
                      pa.date32()),
        "ts": pa.array(nulls((rng.integers(1_300_000_000, 1_700_000_000, n)
                              * 1_000_000
                              + rng.integers(0, 1_000_000, n)).tolist()),
                       pa.timestamp("us")),
        "dec": pa.array(nulls([decimal.Decimal(int(v)).scaleb(-2)
                               for v in rng.integers(-10**10, 10**10, n)]),
                        pa.decimal128(18, 2)),
        "li": pa.array(nulls([rng.integers(0, 100, int(
            rng.integers(0, 5))).tolist() for _ in range(n)]),
            pa.list_(pa.int64())),
        "st": pa.array(nulls([{"a": int(v),
                               "b": nulls([f"s{int(v) % 7}"], 0.3)[0]}
                              for v in rng.integers(0, 99, n)]),
                       pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "m": pa.array(nulls([[(f"k{j}", j * 2) for j in range(int(
            rng.integers(0, 4)))] for _ in range(n)]),
            pa.map_(pa.string(), pa.int64())),
    })
    path = str(tmp_path / f"all_{comp}.orc")
    write_orc_file(t, path, compression=comp, stripe_rows=800)
    f = ORCFile(path)
    assert len(f.stripes) == 4  # stripe_rows honored
    _roundtrip_both(t, path, compression=comp, stripe_rows=800)


def test_export_timestamp_edges(tmp_path):
    """Pre-2015, pre-1970, fractional, whole-second, and epoch-adjacent
    instants all round-trip through pyarrow; the unrepresentable boundary
    second (1969-12-31T23:59:59.xxx) is rejected, never silently shifted."""
    vals = [1_500_000_000_000_000, 1_500_000_000_123_456,
            1_000_000_000_000_000, 1_000_000_000_654_321,
            -5_000_000_000_000, -5_000_000_123_456,
            0, -1_000_000, -2_000_001, None]
    t = pa.table({"ts": pa.array(vals, pa.timestamp("us"))})
    _roundtrip_both(t, str(tmp_path / "ts.orc"))
    with pytest.raises(ValueError, match="cannot represent"):
        write_orc_file(pa.table({
            "ts": pa.array([-500_000], pa.timestamp("us"))}),
            str(tmp_path / "bad.orc"))


def test_export_dense_union_own_reader(tmp_path):
    """Dense unions export (the reference writes them, treewriter.go:1033;
    pyarrow's ORC writer cannot) and read back through our own reader."""
    types = pa.array([0, 1, 0, 1, 0], pa.int8())
    offsets = pa.array([0, 0, 1, 1, 2], pa.int32())
    u = pa.UnionArray.from_dense(
        types, offsets,
        [pa.array([1, 2, 3], pa.int64()), pa.array(["a", "b"], pa.string())])
    path = str(tmp_path / "union.orc")
    write_orc_file(pa.table({"u": u}), path)
    got = ORCFile(path).read().column("u").to_pylist()
    assert got == [1, "a", 2, "b", 3]


def test_export_stats_enable_own_pushdown(tmp_path):
    """Exported files carry real per-stripe statistics: our
    stripe_statistics() sees disjoint ranges and read_orc predicate
    pushdown prunes on them."""
    n = 50_000
    t = pa.table({"k": pa.array(range(n), pa.int64()),
                  "v": pa.array([f"s{i % 11}" for i in range(n)])})
    path = str(tmp_path / "sorted.orc")
    write_orc_file(t, path, stripe_rows=10_000)
    f = ORCFile(path)
    ss = f.stripe_statistics()
    assert len(ss) == 5
    assert [s["k"][0] for s in ss] == [0, 10_000, 20_000, 30_000, 40_000]
    assert ss[0]["k"][1] == 9_999 and not ss[0]["k"][3]


def test_export_file_stats_visible_to_pyarrow(tmp_path):
    """pyarrow parses our footer metadata: row counts, stripe layout, and
    user metadata all intact."""
    t = pq.read_table(f"{SF}/supplier.parquet")
    path = str(tmp_path / "s.orc")
    write_orc_file(t, path, user_metadata={"engine": b"orc_ray"})
    pf = paorc.ORCFile(path)
    assert pf.nrows == t.num_rows and pf.nstripes == 1
    f = ORCFile(path)
    assert f.user_metadata["engine"] == b"orc_ray"


def test_export_orc_dataset_distributed(ray_session, tmp_path):
    """The distributed export pipeline: parquet -> Dataset -> ORC lake in
    content-addressed parts; pyarrow reads the union of parts identical to
    the source, and a re-run rewrites zero new files (idempotence)."""
    import ray.data

    src = pq.read_table(f"{SF}/events.parquet")
    out = str(tmp_path / "lake")
    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    man = export_orc_dataset(ds, out, batch_rows=300)
    paths = []
    for b in man.iter_batches(batch_format="pyarrow", batch_size=None):
        paths.extend(b.column("path").to_pylist())
    assert len(paths) >= 3
    got = pa.concat_tables([paorc.ORCFile(p).read() for p in paths])
    got = got.cast(src.schema).sort_by("event_id")
    assert got.equals(src.sort_by("event_id"))

    import os
    before = sorted(os.listdir(out))
    man2 = export_orc_dataset(ray.data.read_parquet(
        f"{SF}/events.parquet"), out, batch_rows=300)
    man2.materialize()
    assert sorted(os.listdir(out)) == before  # content-addressed no-op


def test_export_cli(tmp_path, capsys):
    import json

    from orc_ray.__main__ import main

    out = str(tmp_path / "lake")
    rc = main(["export-orc", "--input", f"{SF}/supplier.parquet",
               "--out", out])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["rows"] == 10 and info["files"] == 1
    import glob

    parts = glob.glob(out + "/*.orc")
    assert parts and paorc.ORCFile(parts[0]).read().num_rows == 10


def test_export_empty_and_single_row(tmp_path):
    t = pq.read_table(f"{SF}/supplier.parquet")
    _roundtrip_both(t.slice(0, 0), str(tmp_path / "empty.orc"))
    _roundtrip_both(t.slice(0, 1), str(tmp_path / "one.orc"))


def test_export_decimal_wide_mantissa_exact(tmp_path):
    """Mantissas beyond the default decimal context's 28 significant
    digits must round-trip exactly (decimal128 carries up to 38)."""
    vals = [decimal.Decimal("123456789012345678901234567890.12345678"),
            decimal.Decimal("-99999999999999999999999999999.99999999"),
            decimal.Decimal("0.00000001")]
    t = pa.table({"d": pa.array(vals, pa.decimal128(38, 8))})
    path = str(tmp_path / "wide_dec.orc")
    write_orc_file(t, path)
    for got in (paorc.ORCFile(path).read(), ORCFile(path).read()):
        col = got.column("d").combine_chunks()
        if col.type != t.column("d").type:
            col = col.cast(t.column("d").type)
        assert col.to_pylist() == vals


def test_export_union_null_variant_entries(tmp_path):
    """Entries tagged with a null-type variant (our reader's import
    convention for ORC union nulls) export as PRESENT=0 nulls — never as
    uninitialized tag bytes — and round-trip through our reader."""
    types = pa.array([0, 2, 1, 2, 0], pa.int8())
    offsets = pa.array([0, 0, 0, 1, 1], pa.int32())
    u = pa.UnionArray.from_dense(
        types, offsets,
        [pa.array([1, 2], pa.int64()), pa.array(["a"], pa.string()),
         pa.nulls(2)])
    path = str(tmp_path / "union_nulls.orc")
    write_orc_file(pa.table({"u": u}), path)
    got = ORCFile(path).read().column("u").to_pylist()
    assert got == [1, None, "a", None, 2]
    ss = ORCFile(path).stripe_statistics()
    assert ss  # file parses; stats present


def test_export_uint64_above_int63_raises(tmp_path):
    """ORC long is signed: uint64 values above 2**63-1 must raise a clear
    error instead of silently wrapping negative (data + stats corruption);
    in-range uint64 exports fine."""
    big = pa.table({"u": pa.array([2**64 - 1, 1], pa.uint64())})
    with pytest.raises(ValueError, match="uint64"):
        write_orc_file(big, str(tmp_path / "bad.orc"))
    ok = pa.table({"u": pa.array([2**63 - 1, 0, 42], pa.uint64())})
    path = str(tmp_path / "ok.orc")
    write_orc_file(ok, path)
    assert ORCFile(path).read().column("u").to_pylist() == [2**63 - 1, 0, 42]


def test_export_int_sum_overflow_omitted(tmp_path):
    """Java omits the int sum stat on overflow; so do we (sum absent, not
    wrapped)."""
    t = pa.table({"x": pa.array([2**62, 2**62, 2**62], pa.int64())})
    path = str(tmp_path / "ovf.orc")
    write_orc_file(t, path)
    got = ORCFile(path).read()
    assert got.column("x").to_pylist() == [2**62] * 3
    ss = ORCFile(path).stripe_statistics()
    assert ss[0]["x"][0] == 2**62 and ss[0]["x"][1] == 2**62


def test_full_migration_cycle(ray_session, tmp_path, capsys):
    """The complete migration story round-trips: a foreign Apache-ORC
    lake -> ingest-orc (native blobs + manifests) -> export-orc (a new
    ORC lake) -> re-read by BOTH pyarrow.orc and our reader, row-identical
    to the original data."""
    import pyarrow.compute as pc

    from orc_ray.__main__ import main
    from orc_ray.sources.orcfile import read_orc

    base = pq.read_table("/root/testdata/sf0.001/events.parquet")
    lake_in = tmp_path / "lake_in"
    lake_in.mkdir()
    for i in range(3):
        part = base.slice(i * len(base) // 3,
                          (i + 1) * len(base) // 3 - i * len(base) // 3)
        paorc.write_table(part, str(lake_in / f"p{i}.orc"),
                          compression="zlib")

    enc = str(tmp_path / "native")
    assert main(["ingest-orc", str(lake_in / "*.orc"), "--out", enc]) == 0
    capsys.readouterr()
    lake_out = str(tmp_path / "lake_out")
    assert main(["export-orc", "--dir", enc, "--out", lake_out,
                 "--rows-per-file", "400"]) == 0
    capsys.readouterr()

    import glob as _glob
    parts = sorted(_glob.glob(f"{lake_out}/*.orc"))
    assert len(parts) >= 2
    key = base.column_names[0]
    want = base.sort_by([(c, "ascending") for c in base.column_names])
    # pyarrow re-reads the exported lake
    via_pa = pa.concat_tables([paorc.read_table(p) for p in parts])
    got_pa = via_pa.cast(base.schema).sort_by(
        [(c, "ascending") for c in base.column_names])
    assert got_pa.equals(want)
    # our own distributed reader re-reads it too
    ds = read_orc(parts)
    got_own = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ).cast(base.schema).sort_by(
        [(c, "ascending") for c in base.column_names])
    assert got_own.equals(want)


def test_export_timestamp_stats_enable_pushdown(ray_session, tmp_path):
    """Our writer emits UTC-frame TimestampStatistics (fields 3/4) and a
    UTC writerTimezone, so exported files prune timestamp predicates
    through read_orc's converter — and never lose rows."""
    import pyarrow.compute as pc

    from orc_ray.sources.orcfile import _TsMs, read_orc

    n = 30000
    ts = (1_600_000_000_000_000 + np.arange(n, dtype=np.int64) * 1_000_000)
    t = pa.table({"ts": pa.array(ts.astype("datetime64[us]")),
                  "v": pa.array(np.arange(n), pa.int64())})
    dst = str(tmp_path / "own_ts.orc")
    with open(dst, "wb") as fh:
        write_orc_file(t, fh, compression="zlib", stripe_rows=10000)
    f = ORCFile(dst)
    assert len(f.stripes) == 3 and f.writer_timezone(0) == "UTC"
    s = f.stripe_statistics()[0]["ts"]
    assert isinstance(s[0], _TsMs) and s[0].utc

    # predicate inside stripe 1 only; zero row loss, exact rows
    lo = pa.scalar(int(ts[12000]) * 1000, pa.timestamp("ns"))
    hi = pa.scalar(int(ts[12999]) * 1000, pa.timestamp("ns"))
    ds = read_orc(dst, columns=["v"], predicate=("ts", lo, hi))
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
    assert sorted(got.column("v").to_pylist()) == list(range(12000, 13000))

    # disjoint predicate: all three stripes provably empty
    far = pa.scalar(10**18, pa.timestamp("ns"))
    assert read_orc(dst, columns=["v"],
                    predicate=("ts", far, far)).count() == 0


def test_export_randomized_deep_nested(tmp_path):
    """Randomized DEEPLY-nested schemas through OUR writer -> pyarrow's
    reader and our own: list<struct<.., list<int>>>, map<string, struct>,
    struct<struct>, at every null density — the write-direction mirror of
    the reader's randomized cross-check."""
    rng = np.random.default_rng(20260819)
    for seed in range(4):
        n = int(rng.integers(1, 2000))
        null_p = float(rng.choice([0.0, 0.15, 0.9]))

        def nulls(vals):
            return [None if rng.random() < null_p else v for v in vals]

        def rand_li():
            return rng.integers(0, 100, int(rng.integers(0, 4))).tolist()

        t = pa.table({
            "lst": pa.array(
                nulls([[{"a": int(j), "xs": rand_li()}
                        for j in range(int(rng.integers(0, 3)))]
                       for _ in range(n)]),
                pa.list_(pa.struct([("a", pa.int64()),
                                    ("xs", pa.list_(pa.int64()))]))),
            "mst": pa.array(
                nulls([[(f"k{j}", {"v": int(rng.integers(0, 99)),
                                   "w": f"s{j}"})
                        for j in range(int(rng.integers(0, 3)))]
                       for _ in range(n)]),
                pa.map_(pa.string(),
                        pa.struct([("v", pa.int64()), ("w", pa.string())]))),
            "sst": pa.array(
                nulls([{"in": {"x": int(v), "y": float(v) / 3.0},
                        "tag": f"t{int(v) % 5}"}
                       for v in rng.integers(0, 999, n)]),
                pa.struct([("in", pa.struct([("x", pa.int64()),
                                             ("y", pa.float64())])),
                           ("tag", pa.string())])),
            "plain": pa.array(nulls(rng.integers(-2**40, 2**40, n).tolist()),
                              pa.int64()),
        })
        comp = ["zlib", "snappy", "none", "zstd"][seed % 4]
        path = str(tmp_path / f"deep{seed}.orc")
        write_orc_file(t, path, compression=comp, stripe_rows=700)
        via_pa = paorc.read_table(path)
        mine = ORCFile(path).read()
        assert via_pa.num_rows == mine.num_rows == n, (seed, comp)
        for c in t.column_names:
            want = t.column(c).to_pylist()
            assert via_pa.column(c).to_pylist() == want, \
                ("pyarrow", seed, comp, c, null_p)
            assert mine.column(c).to_pylist() == want, \
                ("own", seed, comp, c, null_p)
