"""Stripe encode/decode: one Arrow table chunk -> encoded blob + manifest row.

Re-creates the reference's stripe write/read paths
(writeStripe /root/reference/writer.go:320-481; getStripe + TreeReaders
/root/reference/reader.go:369-456, /root/reference/treereader.go) on Arrow:
every column becomes a set of named byte streams (PRESENT/DATA/LENGTH/
DICT_DATA — streamname.go:29-36), streams are concatenated into one blob,
and a JSON-able ``meta`` dict plays the role of the stripe footer (stream
directory, per-column encoding + statistics).

Column mappings (SURVEY.md §2.2):
- int / date / timestamp -> DATA int stream, codec auto-selected
  (rle2 | rle2_delta | for)                                (C17/C18/C19)
- bool -> boolean bitstream over byte RLE                  (C10/C11)
- float32/64 -> raw IEEE-754 little-endian                 (C16)
- string/binary -> dictionary (sorted, distinct/total <= 0.49) or direct;
  blob optionally FSST or chunked zlib                     (C12-C15, C21)
- list<int> -> LENGTH stream (diff of offsets) + child DATA (C23)
- nulls -> PRESENT boolean stream, suppressed when the chunk has no nulls
  (C26; only non-null values enter DATA, like BaseTreeWriter)
- optional outer chunked zlib per stream                   (C27)

No Ray imports here: pure (pyarrow, numpy) so it unit-tests standalone and
runs unchanged inside ``map_batches`` tasks.
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import byterle, fsst, rle2, zlibchunk
from .codecs.dictionary import dictionary_encode, string_blob, strings_from_blob
from .config import EncoderConfig
from .selector import (
    SelectorState,
    choose_int_codec,
    decode_int_stream,
    encode_int_stream,
)

FORMAT_VERSION = 1

_INT_TYPES = {
    pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64,
    pa.uint8(): 8, pa.uint16(): 16, pa.uint32(): 32, pa.uint64(): 64,
}


def _is_int_like(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_date(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_time(t)
    )


def _int_view(arr: pa.Array) -> np.ndarray:
    """Zero-copy int64 view of an int-like array's values buffer (null slots
    contain garbage; callers mask them)."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date64(t) or pa.types.is_time64(t):
        storage = np.int64
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        storage = np.int32
    else:
        storage = np.dtype(t.to_pandas_dtype())
    buf = arr.buffers()[1]
    vals = np.frombuffer(buf, dtype=storage, count=arr.offset + len(arr))[arr.offset:]
    if vals.dtype == np.int32:
        return vals  # rle2 has a native 32-bit path; others upcast lazily
    return vals.astype(np.int64, copy=False)


def _validity(arr: pa.Array) -> np.ndarray | None:
    if arr.null_count == 0:
        return None
    vb = arr.buffers()[0]
    bits = np.unpackbits(np.frombuffer(vb, dtype=np.uint8), bitorder="little")
    return bits[arr.offset: arr.offset + len(arr)].astype(bool)


class _BlobWriter:
    def __init__(self, outer: str, zlib_level: int):
        self.buf = bytearray()
        self.streams: list[dict] = []
        self.outer = outer
        self.zlib_level = zlib_level

    def add(self, column: str, kind: str, codec: str, data: bytes, **extra) -> None:
        raw_len = len(data)
        outer = "none"
        # fsst/zlib payloads are already entropy-coded AND were already
        # measured against plain zlib in _encode_blob — recompressing only
        # burns CPU without improving the <=-reference guarantee
        attempt = codec not in ("fsst", "zlib")
        if raw_len > 0 and attempt and self.outer in ("zlib", "auto"):
            z = zlibchunk.compress(data, level=self.zlib_level)
            if self.outer == "zlib" or len(z) < raw_len:
                data, outer = z, "zlib"
        rec = {
            "column": column, "kind": kind, "codec": codec,
            "offset": len(self.buf), "length": len(data), "raw_length": raw_len,
            "outer": outer,
        }
        rec.update(extra)
        self.streams.append(rec)
        self.buf += data


def _stream_bytes(blob: bytes, rec: dict, outer: str) -> bytes:
    data = blob[rec["offset"]: rec["offset"] + rec["length"]]
    stream_outer = rec.get("outer", outer)
    if stream_outer == "zlib" and rec["raw_length"] > 0:
        data = zlibchunk.decompress(data)
    return data


# ---------------------------------------------------------------------------
# blob codecs for byte payloads (string data / dictionary data)
# ---------------------------------------------------------------------------

def _encode_blob(
    blob: bytes, lengths: np.ndarray, config: EncoderConfig,
    selector: SelectorState | None = None, group: str = "", column: str = "",
) -> tuple[str, bytes, np.ndarray]:
    """Choose fsst/zlib/none for a string byte payload by measured size.
    Returns (codec, payload, lengths_for_stream) — with FSST the LENGTH
    stream carries compressed lengths. When a selector actor is present the
    trained FSST symbol table is reused across chunks of the same
    (source, column) and retrained every Nth chunk (tables are serialized
    into each stream, so blobs stay self-contained)."""
    candidates = config.string_blob_candidates
    if len(blob) == 0:
        return "none", blob, lengths
    arr = np.frombuffer(blob, dtype=np.uint8)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    best = ("none", blob, lengths, len(blob))
    for cand in candidates:
        if cand == "none":
            continue
        if cand == "zlib":
            z = zlibchunk.compress(blob, level=config.zlib_level)
            if len(z) < best[3]:
                best = ("zlib", z, lengths, len(z))
        elif cand == "fsst":
            if selector is not None:
                table = selector.fsst_table(
                    group, column,
                    lambda: fsst.train(arr, offsets, config.fsst_iterations),
                )
                comp, comp_lens = fsst.compress(table, arr, offsets)
            else:
                comp, comp_lens = fsst.compress_auto(arr, offsets,
                                                     config.fsst_iterations)
            if len(comp) < best[3]:
                best = ("fsst", comp, comp_lens, len(comp))
    return best[0], best[1], best[2]


def _decode_blob(codec: str, payload: bytes, lengths: np.ndarray) -> tuple[bytes, np.ndarray]:
    if codec == "none":
        return payload, lengths
    if codec == "zlib":
        return zlibchunk.decompress(payload), lengths
    if codec == "fsst":
        return fsst.decompress(payload, lengths)
    raise ValueError(f"unknown blob codec {codec!r}")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_table(
    table: pa.Table,
    config: EncoderConfig | None = None,
    selector: SelectorState | None = None,
    group: str = "",
) -> tuple[bytes, dict]:
    """Encode a table chunk into (blob bytes, meta dict). ``group`` keys the
    stateful selector cache (e.g. the partition's dominant source)."""
    config = config or EncoderConfig()
    table = table.combine_chunks()
    w = _BlobWriter(config.outer_compression, config.zlib_level)
    columns_meta = []
    for name in table.column_names:
        arr = table.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
        col_meta = _encode_column(name, arr, w, config, selector, group)
        columns_meta.append(col_meta)
    meta = {
        "format": FORMAT_VERSION,
        "num_rows": table.num_rows,
        "outer": config.outer_compression,
        "schema_b64": base64.b64encode(table.schema.serialize().to_pybytes()).decode(),
        "columns": columns_meta,
        "streams": w.streams,
    }
    return bytes(w.buf), meta


def _select_int(
    selector: SelectorState | None,
    group: str,
    stream_key: str,
    values: np.ndarray,
    signed: bool,
    config: EncoderConfig,
    candidates: tuple[str, ...] | None = None,
) -> str:
    if selector is not None:
        return selector.choose_int(group, stream_key, values, signed, candidates)
    return choose_int_codec(values, signed, config, candidates)


def _int_stats(vals: np.ndarray) -> dict:
    if len(vals) == 0:
        return {"num_values": 0}
    return {
        "num_values": int(len(vals)),
        "min": int(vals.min()),
        "max": int(vals.max()),
        "sum": int(vals.sum(dtype=np.int64)),  # wraps like the reference's int64 sum
    }


def _encode_column(
    name: str,
    arr: pa.Array,
    w: _BlobWriter,
    config: EncoderConfig,
    selector: SelectorState | None,
    group: str,
) -> dict:
    t = arr.type
    meta: dict = {"name": name, "type": str(t), "null_count": int(arr.null_count)}
    valid = _validity(arr)
    if valid is not None:
        w.add(name, "PRESENT", "boolrle", byterle.encode_bools(valid))

    if pa.types.is_timestamp(t):
        # ORC split codec (C18): DATA = seconds since 2015-01-01 (signed),
        # SECONDARY = nanos with packed trailing-zero count (formatNanos)
        from .codecs.timestamp import split_unit

        vals = _int_view(arr)
        if valid is not None:
            vals = vals[valid]
        secs_rel, fmt_nanos = split_unit(vals, t.unit)
        codec = _select_int(selector, group, f"{name}:DATA", secs_rel, True, config)
        w.add(name, "DATA", codec, encode_int_stream(secs_rel, codec, True),
              signed=True)
        n_codec = _select_int(selector, group, f"{name}:SECONDARY", fmt_nanos,
                              False, config, ("rle2", "for"))
        w.add(name, "SECONDARY", n_codec,
              encode_int_stream(fmt_nanos, n_codec, False), signed=False)
        meta["encoding"] = "timestamp"
        meta["unit"] = t.unit
        meta["stats"] = _int_stats(np.asarray(vals, dtype=np.int64))
        return meta

    if _is_int_like(t):
        vals = _int_view(arr)
        if valid is not None:
            vals = vals[valid]
        signed = not pa.types.is_unsigned_integer(t)
        codec = _select_int(selector, group, f"{name}:DATA", vals, signed, config)
        w.add(name, "DATA", codec, encode_int_stream(vals, codec, signed),
              signed=signed)
        meta["encoding"] = "int"
        meta["stats"] = _int_stats(vals)
        return meta

    if pa.types.is_boolean(t):
        bits = arr.to_numpy(zero_copy_only=False)
        if valid is not None:
            bits = bits[valid]
        bits = bits.astype(bool)
        w.add(name, "DATA", "boolrle", byterle.encode_bools(bits))
        meta["encoding"] = "bool"
        meta["stats"] = {"num_values": int(len(bits)), "true_count": int(bits.sum())}
        return meta

    if pa.types.is_floating(t):
        vals = arr.to_numpy(zero_copy_only=False)
        if valid is not None:
            vals = vals[valid]
        w.add(name, "DATA", "bytes", np.ascontiguousarray(vals).tobytes())
        meta["encoding"] = "float"
        meta["stats"] = {"num_values": int(len(vals))}
        if len(vals):
            meta["stats"].update(min=float(np.min(vals)), max=float(np.max(vals)),
                                 sum=float(np.sum(vals)))
        return meta

    if pa.types.is_string(t) or pa.types.is_large_string(t) or \
            pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _encode_string_column(name, arr, valid, w, config, selector, group, meta)

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _encode_list_column(name, arr, valid, w, config, selector, group, meta)

    if pa.types.is_struct(t):
        # C22: struct = PRESENT + children (treewriter.go:304-384). Children
        # are encoded full-length (Arrow keeps child slots under null
        # structs), so reassembly is exact.
        children_meta = []
        for i, field in enumerate(t):
            child = arr.field(i)
            children_meta.append(
                _encode_column(f"{name}.{field.name}", child, w, config,
                               selector, group)
            )
        meta["encoding"] = "struct"
        meta["children"] = children_meta
        meta["stats"] = {"num_values": len(arr) - arr.null_count}
        return meta

    raise NotImplementedError(f"column type not supported yet: {t}")


def _encode_string_column(name, arr, valid, w, config, selector, group, meta) -> dict:
    is_binary = pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)
    if valid is not None:
        arr = arr.drop_null()
    n = len(arr)
    distinct = int(pc.count_distinct(arr).as_py()) if n else 0
    if selector is not None and n and not is_binary:
        # feed the actor's per-(source, column) cardinality sketch (T4)
        from .codecs.dictionary import string_hashes64

        selector.observe_strings(group, name, string_hashes64(arr))
    use_dict = (not is_binary) and n > 0 and distinct / n <= config.dict_threshold
    if use_dict:
        indexes, dict_blob, dict_lengths = dictionary_encode(arr)
        idx_codec = _select_int(selector, group, f"{name}:DICTIDX", indexes, False,
                                config, ("rle2", "for"))
        w.add(name, "DATA", idx_codec, encode_int_stream(indexes, idx_codec, False),
              signed=False)
        blob_codec, payload, lens = _encode_blob(dict_blob, dict_lengths, config,
                                                 selector, group, f"{name}:DICT")
        w.add(name, "DICT_DATA", blob_codec, payload, dict_size=len(dict_lengths))
        w.add(name, "LENGTH", "rle2", encode_int_stream(lens, "rle2", False),
              signed=False)
        meta["encoding"] = "dict"
    else:
        blob, lengths = string_blob(arr)
        blob_codec, payload, lens = _encode_blob(blob, lengths, config,
                                                 selector, group, name)
        w.add(name, "DATA", blob_codec, payload)
        len_codec = _select_int(selector, group, f"{name}:LENGTH", lens, False,
                                config, ("rle2", "for"))
        w.add(name, "LENGTH", len_codec, encode_int_stream(lens, len_codec, False),
              signed=False)
        meta["encoding"] = "binary" if is_binary else "direct"
    stats = {"num_values": n, "distinct": distinct}
    if n and not is_binary:
        mm = pc.min_max(arr)
        stats["min"] = mm["min"].as_py()
        stats["max"] = mm["max"].as_py()
        stats["sum_lengths"] = int(pc.sum(pc.binary_length(arr)).as_py() or 0)
    meta["stats"] = stats
    return meta


def _encode_list_column(name, arr, valid, w, config, selector, group, meta) -> dict:
    t = arr.type
    if valid is not None:
        arr = arr.drop_null()
    off_dtype = np.int64 if pa.types.is_large_list(t) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1
    ].astype(np.int64)
    child = arr.values  # already restricted to this array's range? slice below
    child = child.slice(int(offsets[0]), int(offsets[-1] - offsets[0]))
    lengths = np.diff(offsets)
    if not _is_int_like(child.type):
        raise NotImplementedError(f"list child type not supported: {child.type}")
    if child.null_count:
        raise NotImplementedError("list children with nulls not supported")
    len_codec = _select_int(selector, group, f"{name}:LENGTH", lengths, False,
                            config, ("rle2", "for"))
    w.add(name, "LENGTH", len_codec, encode_int_stream(lengths, len_codec, False),
          signed=False)
    vals = _int_view(child)
    signed = not pa.types.is_unsigned_integer(child.type)
    codec = _select_int(selector, group, f"{name}:DATA", vals, signed, config)
    w.add(name, "DATA", codec, encode_int_stream(vals, codec, signed), signed=signed)
    meta["encoding"] = "list"
    meta["stats"] = {
        "num_values": int(len(lengths)),
        "total_elements": int(lengths.sum()),
        **({f"elem_{k}": v for k, v in _int_stats(vals).items() if k != "num_values"}),
    }
    return meta


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_blob(blob: bytes, meta: dict, columns: list[str] | None = None) -> pa.Table:
    """Rebuild the Arrow table from a blob + meta (column projection reads
    only the projected columns' streams, like Reader.Select, cursor.go:29-45)."""
    schema = pa.ipc.read_schema(pa.py_buffer(base64.b64decode(meta["schema_b64"])))
    outer = meta.get("outer", "none")
    n_rows = meta["num_rows"]
    streams = {}
    for rec in meta["streams"]:
        streams[(rec["column"], rec["kind"])] = rec

    names = columns if columns is not None else [c["name"] for c in meta["columns"]]
    cols_meta = {c["name"]: c for c in meta["columns"]}
    out_arrays = []
    out_fields = []
    for name in names:
        cm = cols_meta[name]
        field = schema.field(name)
        arr = _decode_column(blob, cm, field.type, streams, outer, n_rows)
        out_arrays.append(arr)
        out_fields.append(field)
    return pa.Table.from_arrays(out_arrays, schema=pa.schema(out_fields))


def _get(blob, streams, outer, column, kind) -> bytes | None:
    rec = streams.get((column, kind))
    if rec is None:
        return None
    return _stream_bytes(blob, rec, outer)


def _rec(streams, column, kind) -> dict | None:
    return streams.get((column, kind))


def _decode_column(blob, cm, t, streams, outer, n_rows) -> pa.Array:
    name = cm["name"]
    null_count = cm.get("null_count", 0)
    valid = None
    if null_count:
        pbuf = _get(blob, streams, outer, name, "PRESENT")
        valid = byterle.decode_bools(pbuf, n_rows)
    n_vals = n_rows - null_count

    enc = cm["encoding"]
    if enc == "struct":
        children = []
        for i, field in enumerate(t):
            child_n = n_rows  # children are full-length
            children.append(
                _decode_column(blob, cm["children"][i], field.type, streams,
                               outer, child_n)
            )
        mask = None if valid is None else ~valid
        return pa.StructArray.from_arrays(
            children, fields=list(t),
            mask=pa.array(mask) if mask is not None else None,
        )
    if enc == "timestamp":
        from .codecs.timestamp import join_unit

        rec = _rec(streams, name, "DATA")
        secs_rel = decode_int_stream(_stream_bytes(blob, rec, outer),
                                     rec["codec"], True, n_vals)
        srec = _rec(streams, name, "SECONDARY")
        fmt_nanos = decode_int_stream(_stream_bytes(blob, srec, outer),
                                      srec["codec"], False, n_vals)
        vals = join_unit(secs_rel, fmt_nanos, cm["unit"])
        return _int_array(vals, t, valid, n_rows)
    if enc == "int":
        rec = _rec(streams, name, "DATA")
        vals = decode_int_stream(
            _stream_bytes(blob, rec, outer), rec["codec"], rec.get("signed", True), n_vals
        )
        return _int_array(vals, t, valid, n_rows)
    if enc == "bool":
        rec = _rec(streams, name, "DATA")
        bits = byterle.decode_bools(_stream_bytes(blob, rec, outer), n_vals)
        if valid is None:
            return pa.array(bits, type=pa.bool_())
        return _scatter_array(bits, valid, pa.bool_())
    if enc == "float":
        rec = _rec(streams, name, "DATA")
        dtype = np.float32 if t == pa.float32() else np.float64
        vals = np.frombuffer(_stream_bytes(blob, rec, outer), dtype=dtype)
        if valid is None:
            return pa.array(vals, type=t)
        return _scatter_array(vals, valid, t)
    if enc == "dict":
        rec = _rec(streams, name, "DATA")
        indexes = decode_int_stream(_stream_bytes(blob, rec, outer), rec["codec"], False, n_vals)
        dict_rec = _rec(streams, name, "DICT_DATA")
        dict_size = dict_rec["dict_size"]
        len_rec = _rec(streams, name, "LENGTH")
        lens = decode_int_stream(_stream_bytes(blob, len_rec, outer), len_rec["codec"], False, dict_size)
        dblob, dlens = _decode_blob(dict_rec["codec"], _stream_bytes(blob, dict_rec, outer), lens)
        dict_arr = strings_from_blob(dblob, dlens)
        vals_arr = dict_arr.take(pa.array(indexes, type=pa.int64()))
        if valid is None:
            return vals_arr.cast(t) if vals_arr.type != t else vals_arr
        return _scatter_strings(vals_arr, valid, t)
    if enc in ("direct", "binary"):
        len_rec = _rec(streams, name, "LENGTH")
        lens = decode_int_stream(_stream_bytes(blob, len_rec, outer), len_rec["codec"], False, n_vals)
        data_rec = _rec(streams, name, "DATA")
        dblob, dlens = _decode_blob(data_rec["codec"], _stream_bytes(blob, data_rec, outer), lens)
        vals_arr = strings_from_blob(dblob, dlens)
        if enc == "binary":
            vals_arr = vals_arr.cast(pa.binary())
        if valid is None:
            return vals_arr.cast(t) if vals_arr.type != t else vals_arr
        return _scatter_strings(vals_arr, valid, t)
    if enc == "list":
        len_rec = _rec(streams, name, "LENGTH")
        lens = decode_int_stream(_stream_bytes(blob, len_rec, outer), len_rec["codec"], False, n_vals)
        data_rec = _rec(streams, name, "DATA")
        total = int(lens.sum())
        child_np = np.dtype(t.value_type.to_pandas_dtype()) \
            if pa.types.is_integer(t.value_type) else np.int64
        out_dtype = np.int32 if (child_np == np.int32 and data_rec["codec"] == "rle2") else np.int64
        vals = decode_int_stream(_stream_bytes(blob, data_rec, outer), data_rec["codec"],
                                 data_rec.get("signed", True), total,
                                 out_dtype=out_dtype)
        child_type = t.value_type
        child = _int_array(vals, child_type, None, total)
        if pa.types.is_large_list(t):
            offsets = np.zeros(n_vals + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            out = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), child)
        else:
            offsets = np.zeros(n_vals + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            out = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), child)
        if valid is None:
            return out
        raise NotImplementedError("nullable list decode not supported yet")
    raise ValueError(f"unknown encoding {enc!r}")


def _int_array(vals: np.ndarray, t: pa.DataType, valid, n_rows) -> pa.Array:
    """int64 values -> Arrow array of the original int-like type."""
    if pa.types.is_timestamp(t) or pa.types.is_date64(t) or pa.types.is_time64(t):
        base = pa.array(vals, type=pa.int64())
        out = base.view(t)
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        out = pa.array(vals.astype(np.int32), type=pa.int32()).view(t)
    else:
        out = pa.array(vals.astype(np.dtype(t.to_pandas_dtype()), copy=False), type=t)
    if valid is None:
        return out
    return _scatter_typed(out, valid, t, vals)


def _scatter_array(vals: np.ndarray, valid: np.ndarray, t: pa.DataType) -> pa.Array:
    full = np.zeros(len(valid), dtype=vals.dtype)
    full[valid] = vals
    return pa.array(full, type=t, mask=~valid)


def _scatter_typed(dense: pa.Array, valid: np.ndarray, t, vals: np.ndarray) -> pa.Array:
    if pa.types.is_timestamp(t) or pa.types.is_date64(t) or pa.types.is_time64(t):
        full = np.zeros(len(valid), dtype=np.int64)
        full[valid] = vals
        return pa.array(full, type=pa.int64(), mask=~valid).view(t)
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        full = np.zeros(len(valid), dtype=np.int32)
        full[valid] = vals.astype(np.int32)
        return pa.array(full, type=pa.int32(), mask=~valid).view(t)
    full = np.zeros(len(valid), dtype=np.dtype(t.to_pandas_dtype()))
    full[valid] = vals.astype(full.dtype)
    return pa.array(full, type=t, mask=~valid)


def _scatter_strings(dense: pa.Array, valid: np.ndarray, t) -> pa.Array:
    """Re-insert nulls into a dense string/binary array."""
    n = len(valid)
    idx = np.full(n, -1, dtype=np.int64)
    idx[valid] = np.arange(len(dense), dtype=np.int64)
    taken = dense.take(pa.array(idx, type=pa.int64(), mask=~valid))
    return taken.cast(t) if taken.type != t else taken
