"""Round-trip verification: per-row token-array equality at scale.

The per-row invariant (BASELINE.json input_hint) is token-array equality
between input and decoded output. Rows may be re-ordered across partitions,
so verification is order-insensitive: every row gets a 64-bit content hash
(position-sensitive polynomial over its tokens, mixed with doc_id bytes,
n_tok and source), and the multiset of row hashes is compared through
commutative reductions (count / sum mod 2^64 / xor). Both sides stream
through ``map_batches``; only (count, sum, xor) triples reach the driver —
no materialization, no shuffle (cf. SURVEY.md §2.7: verification keyed on
content, not a distributed join).

Small-scale tests additionally do exact row-by-row comparison after a sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_P = _U64(0x100000001B3)  # FNV-ish odd multiplier
_K = _U64(0x9E3779B97F4A7C15)
_PINV = _U64(pow(int(_P), -1, 1 << 64))  # P is odd => invertible mod 2^64

# blocked power table: P^i = SMALL[i % B] * (P^B)^(i // B). Building it is
# one parallelizable multiply pass instead of a serial length-m cumprod —
# the checksum was the dominant cost of the fused decode+verify task.
_B = 4096


def _pow_mod64(base: np.uint64, exp: np.ndarray) -> np.ndarray:
    """base**exp mod 2^64, vectorized binary exponentiation."""
    result = np.ones(len(exp), dtype=_U64)
    b = int(base)
    e = exp.astype(_U64)
    maxe = int(e.max()) if len(e) else 0
    bit = 0
    while (1 << bit) <= maxe:
        mask = (e >> _U64(bit)) & _U64(1) == 1
        result[mask] *= _U64(b)
        b = (b * b) & 0xFFFFFFFFFFFFFFFF
        bit += 1
    return result


def _make_pow_cache(base: int):
    small = np.empty(_B, dtype=_U64)
    small[0] = 1
    np.cumprod(np.full(_B - 1, base, dtype=_U64), out=small[1:])
    pb = (int(small[-1]) * base) & 0xFFFFFFFFFFFFFFFF
    cache = np.empty(0, dtype=_U64)

    def table(m: int) -> np.ndarray:
        """[base^0 .. base^(m-1)] mod 2^64, blocked construction, cached
        per process (read-only view of the largest table built so far):
        rebuilding it per stripe was ~25% of fused decode+verify. Built
        with 2x headroom — stripe value counts vary a few percent around
        the token budget, and growing by max-so-far would rebuild ~half
        the time early on."""
        nonlocal cache
        if len(cache) < m:
            nb = (2 * m + _B - 1) // _B
            blockpows = np.empty(nb, dtype=_U64)
            blockpows[0] = 1
            if nb > 1:
                np.cumprod(np.full(nb - 1, pb, dtype=_U64),
                           out=blockpows[1:])
            cache = np.multiply(blockpows[:, None],
                                small[None, :]).reshape(-1)
        return cache[:m]

    return table


def _make_powsum_cache():
    """T[j] = K * sum_{i<j} P^i mod 2^64 (one extra slot past the pow
    table) — lets the per-value ``terms += K`` pass collapse to a
    per-SEGMENT ``K*(T[end]-T[start])`` gather, since
    sum_seg((v+K)*P^i) = sum_seg(v*P^i) + K*sum_seg(P^i)."""
    cache = np.empty(0, dtype=_U64)

    def table(m: int) -> np.ndarray:
        nonlocal cache
        if len(cache) < m + 1:
            pows = _pow_table(2 * m + 1)
            cache = np.zeros(len(pows) + 1, dtype=_U64)
            np.cumsum(pows * _K, out=cache[1:])
        return cache

    return table


_pow_table = _make_pow_cache(int(_P))
_pow_table_inv = _make_pow_cache(int(_PINV))
_powsum_table = _make_powsum_cache()


def _poly_hash_segments(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment hash sum((v+K) * P^pos_in_segment) mod 2^64.

    Computed as P^(-start) * sum((v_i+K) * P^i) over GLOBAL positions i —
    bit-identical to the per-segment formulation (P odd => P^-1 exists mod
    2^64) but needs no per-value position gather / np.repeat: one global
    power table, one reduceat, one row-count-sized inverse-power pass."""
    n = len(offsets) - 1
    if len(values) == 0:
        return np.zeros(n, dtype=_U64)
    m = len(values)
    # widen+multiply in one pass (ufunc dtype=uint64 sign-extends int32
    # exactly like the old .astype chain); the +K per-value pass is folded
    # into a per-segment gather from the K-scaled power prefix sums —
    # together they drop two full passes over the hottest stream
    terms = np.multiply(values, _pow_table(m), dtype=_U64, casting="unsafe")
    lengths = np.diff(offsets)
    out = np.zeros(n, dtype=_U64)
    nz = lengths > 0
    starts = offsets[:-1][nz]
    ends = offsets[1:][nz]
    seg_sums = np.add.reduceat(terms, starts)
    psum = _powsum_table(m)
    seg_sums += psum[ends]
    seg_sums -= psum[starts]
    # P^(-start) via a gather from the cached inverse-power table (a
    # vectorized binpow per call was ~14% of fused decode+verify)
    out[nz] = seg_sums * _pow_table_inv(m)[starts]
    return out


def _string_hashes(arr: pa.Array) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(pa.string())
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    blob = data[offsets[0]: offsets[-1]]
    return _poly_hash_segments(blob, offsets - offsets[0])


def row_hashes(batch: pa.Table) -> np.ndarray:
    """64-bit per-row content hash over the token-table columns present."""
    n = batch.num_rows
    h = np.full(n, _K, dtype=_U64)
    if "tokens" in batch.column_names:
        col = batch.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off_dtype = np.int64 if pa.types.is_large_list(col.type) else np.int32
        offsets = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
            col.offset: col.offset + n + 1
        ].astype(np.int64)
        vals_arr = col.values.slice(int(offsets[0]), int(offsets[-1] - offsets[0]))
        # native dtype flows straight into the hash: int32 sign-extends to
        # the same uint64 terms as the old int64 widening, at half the
        # memory traffic on the hottest stream
        vals = vals_arr.to_numpy(zero_copy_only=False)
        h = h * _P + _poly_hash_segments(vals, offsets - offsets[0])
    for name in ("doc_id", "source"):
        if name in batch.column_names:
            h = h * _P + _string_hashes(batch.column(name))
    if "n_tok" in batch.column_names:
        v = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        h = h * _P + v.view(_U64)
    return h


def _partial(batch: pa.Table) -> pa.Table:
    h = row_hashes(batch)
    return pa.table({
        "count": pa.array([len(h)], type=pa.int64()),
        "hsum": pa.array([int(h.sum(dtype=_U64))], type=pa.uint64()),
        "hxor": pa.array([int(np.bitwise_xor.reduce(h)) if len(h) else 0], type=pa.uint64()),
    })


def checksum_dataset(ds) -> dict:
    """Streaming multiset checksum of a token Dataset."""
    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    count = sum(p["count"] for p in parts)
    hsum = 0
    hxor = 0
    for p in parts:
        hsum = (hsum + int(p["hsum"])) & 0xFFFFFFFFFFFFFFFF
        hxor ^= int(p["hxor"])
    return {"count": count, "hsum": hsum, "hxor": hxor}


def checksum_table(t: pa.Table) -> dict:
    h = row_hashes(t)
    return {
        "count": len(h),
        "hsum": int(h.sum(dtype=_U64)),
        "hxor": int(np.bitwise_xor.reduce(h)) if len(h) else 0,
    }


def verify_roundtrip(original_ds, decoded_ds) -> dict:
    a = checksum_dataset(original_ds)
    b = checksum_dataset(decoded_ds)
    return {"match": a == b, "original": a, "decoded": b}


class _DecodeChecksum:
    """Fused decode+checksum stage: decoded stripes are hashed inside the
    same actor, so the full decoded data never crosses the object store
    (only (count, sum, xor) triples do). Fed manifest-file paths — each
    call reads its own tiny manifest parquet, then its stripes."""

    def __init__(self, out_dir: str, use_paths: bool = True):
        from .decode import ManifestShardDecoder, StripeDecoder

        cls = ManifestShardDecoder if use_paths else StripeDecoder
        self.dec = cls(out_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [_partial(t) for t in self.dec(batch)]
        if not outs:
            return _partial(pa.table({"count": pa.array([], type=pa.int64())})).slice(0, 0)
        return pa.concat_tables(outs)


def checksum_encoded(out_dir: str, concurrency=None) -> dict:
    """Streaming checksum of an encoded directory (decode fused in).

    The work units are per-partition manifest FILES packed ~8 blocks per
    actor: reading thousands of sub-megabyte manifests through
    ``ray.data.read_parquet`` cost seconds of fan-out AND fixed the task
    granularity at one coarse block per read task (ragged multi-round
    tail); path items make both the fan-out and the tail quantum cheap."""
    from .._tuning import remote_args
    from .decode import ManifestShardDecoder, clamp_concurrency, manifest_feed
    from .encode import _default_concurrency

    if concurrency is None:
        concurrency = _default_concurrency()
    ds, cls, n_units = manifest_feed(out_dir, concurrency)
    parts = ds.map_batches(
        _DecodeChecksum,
        fn_constructor_kwargs={"out_dir": out_dir,
                               "use_paths": cls is ManifestShardDecoder},
        batch_size=None,
        batch_format="pyarrow",
        concurrency=clamp_concurrency(concurrency, n_units),
        num_cpus=1,
        **remote_args(),
    ).take_all()
    count = sum(p["count"] for p in parts)
    hsum = 0
    hxor = 0
    for p in parts:
        hsum = (hsum + int(p["hsum"])) & 0xFFFFFFFFFFFFFFFF
        hxor ^= int(p["hxor"])
    return {"count": count, "hsum": hsum, "hxor": hxor}


def verify_encoded(original_ds, out_dir: str) -> dict:
    """Round-trip check of an encoded dir against its source Dataset."""
    a = checksum_dataset(original_ds)
    b = checksum_encoded(out_dir)
    return {"match": a == b, "original": a, "decoded": b}


_FSCK_SCHEMA = pa.schema([
    ("partition_id", pa.int64()),
    ("stripe_id", pa.int64()),
    ("blob_path", pa.string()),
    ("status", pa.string()),   # ok | no_crc | missing | size_mismatch | crc_mismatch
    ("detail", pa.string()),
])


class _FsckShard:
    """fsck work unit: crc-scan the blobs listed by one manifest shard.
    Reads blob BYTES only (no decode) — the lake health check is pure
    sequential I/O + crc32 (~2 GB/s/core), an order of magnitude cheaper
    than a decode pass."""

    def __init__(self, out_dir: str):
        import json as _json

        from ..state import manifest as mf
        from ..state import storage

        self._json = _json
        self._mf = mf
        self._storage = storage
        self.out_dir = out_dir
        self.blobs_dir = mf.blobs_dir(out_dir)

    def _check_rows(self, man: pa.Table):
        import zlib as _z

        cols = ["partition_id", "stripe_id", "blob_path", "encoded_bytes",
                "meta_json"]
        for row in man.select(cols).to_pylist():
            path = self._storage.join(self.blobs_dir, row["blob_path"])
            base = {"partition_id": row["partition_id"],
                    "stripe_id": row["stripe_id"],
                    "blob_path": row["blob_path"]}
            try:
                blob = self._storage.read_file(path)
            except (FileNotFoundError, OSError) as e:
                yield {**base, "status": "missing", "detail": str(e)}
                continue
            if len(blob) != row["encoded_bytes"]:
                yield {**base, "status": "size_mismatch",
                       "detail": f"manifest says {row['encoded_bytes']} "
                                 f"bytes, file has {len(blob)}"}
                continue
            expect = self._json.loads(row["meta_json"]).get("crc32")
            if expect is None:
                yield {**base, "status": "no_crc",
                       "detail": "legacy manifest predates blob checksums"}
                continue
            got = _z.crc32(blob)
            if got != expect:
                yield {**base, "status": "crc_mismatch",
                       "detail": f"expected {expect:#010x}, got {got:#010x}"}
            else:
                yield {**base, "status": "ok", "detail": ""}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for path in batch.column("path").to_pylist():
            man = self._mf.read_manifest_file(path)
            rows.extend(self._check_rows(man))
        if not rows:
            return _FSCK_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_FSCK_SCHEMA)


def fsck_encoded(out_dir: str, concurrency=None, max_bad: int = 100) -> dict:
    """Streaming integrity scan of an encoded directory: every blob is
    checked for existence, manifest-recorded size, and crc32 (when the
    manifest carries one). Returns ``{"blobs", "ok", "no_crc", "bad",
    "bad_rows"}`` where ``bad_rows`` holds up to ``max_bad`` offending
    (partition, stripe, path, status, detail) rows — metadata-sized, so a
    100k-stripe lake returns a summary, not a blob list."""
    import ray.data

    from .._tuning import remote_args
    from .decode import _pool_blocks, clamp_concurrency, manifest_file_items
    from .encode import _default_concurrency

    if concurrency is None:
        concurrency = _default_concurrency()
    items = manifest_file_items(out_dir)
    n_units = len(items)
    if not items:
        return {"blobs": 0, "ok": 0, "no_crc": 0, "bad": 0, "bad_rows": []}
    ds = ray.data.from_items(
        items, override_num_blocks=_pool_blocks(n_units, concurrency))
    checked = ds.map_batches(
        _FsckShard,
        fn_constructor_kwargs={"out_dir": out_dir},
        batch_size=None,
        batch_format="pyarrow",
        concurrency=clamp_concurrency(concurrency, n_units),
        num_cpus=1,
        **remote_args(),
    )

    def _summarize(batch: pa.Table) -> pa.Table:
        import json as _json

        status = batch.column("status").to_pylist()
        bad = [i for i, s in enumerate(status)
               if s not in ("ok", "no_crc")]
        return pa.table({
            "blobs": pa.array([batch.num_rows], type=pa.int64()),
            "ok": pa.array([status.count("ok")], type=pa.int64()),
            "no_crc": pa.array([status.count("no_crc")], type=pa.int64()),
            "bad": pa.array([len(bad)], type=pa.int64()),
            "bad_rows_json": pa.array([_json.dumps(
                [batch.slice(i, 1).to_pylist()[0] for i in bad[:max_bad]]
            )], type=pa.string()),
        })

    import json as _json

    parts = checked.map_batches(_summarize, batch_format="pyarrow").take_all()
    out = {"blobs": 0, "ok": 0, "no_crc": 0, "bad": 0, "bad_rows": []}
    for p in parts:
        out["blobs"] += int(p["blobs"])
        out["ok"] += int(p["ok"])
        out["no_crc"] += int(p["no_crc"])
        out["bad"] += int(p["bad"])
        if len(out["bad_rows"]) < max_bad:
            out["bad_rows"].extend(
                _json.loads(p["bad_rows_json"])[: max_bad - len(out["bad_rows"])])
    return out
