"""Hive-style DDL schema strings <-> pyarrow schemas.

Re-creation of the reference's TypeDescription DDL parser/printer
(/root/reference/typedescription.go:64-335 parse, 518-621 print):
``struct<doc_id:string,tokens:array<int>,n_tok:int,source:string>`` parses
to a ``pa.schema``; nested struct/array/map/uniontype/decimal/char/varchar
are understood with the reference's type-category names
(typedescription.go:24-62).
"""

from __future__ import annotations

import re

import pyarrow as pa

_PRIMITIVES = {
    "boolean": pa.bool_(),
    "tinyint": pa.int8(),
    "smallint": pa.int16(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("ns"),
}

_NAME_RE = re.compile(r"[a-zA-Z0-9_]+")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def error(self, msg: str):
        raise ValueError(f"schema parse error at {self.pos}: {msg} in {self.text!r}")

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def expect(self, ch: str):
        if self.peek() != ch:
            self.error(f"expected {ch!r}")
        self.pos += 1

    def name(self) -> str:
        m = _NAME_RE.match(self.text, self.pos)
        if not m:
            self.error("expected identifier")
        self.pos = m.end()
        return m.group()

    def parse_type(self) -> pa.DataType:
        t, _ = self.parse_type_meta()
        return t

    def parse_type_meta(self) -> tuple[pa.DataType, dict | None]:
        """(type, field-metadata): char(n)/varchar(n) map to arrow string
        plus an ``orc:type`` field annotation that the writer enforces
        (treewriter.go:543 keeps them as distinct categories; arrow has no
        bounded-string type, so the bound lives in metadata and the
        truncate/pad happens at encode)."""
        word = self.name()
        if word in _PRIMITIVES:
            return _PRIMITIVES[word], None
        if word in ("char", "varchar"):
            self.expect("(")
            n = int(self.name())
            self.expect(")")
            return pa.string(), {b"orc:type": f"{word}({n})".encode()}
        if word == "decimal":
            self.expect("(")
            p = int(self.name())
            self.expect(",")
            s = int(self.name())
            self.expect(")")
            return pa.decimal128(p, s), None
        if word == "array":
            self.expect("<")
            child = self.parse_type()
            self.expect(">")
            return pa.list_(child), None
        if word == "map":
            self.expect("<")
            key = self.parse_type()
            self.expect(",")
            val = self.parse_type()
            self.expect(">")
            return pa.map_(key, val), None
        if word == "struct":
            self.expect("<")
            fields = []
            while True:
                fname = self.name()
                self.expect(":")
                ft, fmeta = self.parse_type_meta()
                fields.append(pa.field(fname, ft, metadata=fmeta))
                if self.peek() == ",":
                    self.pos += 1
                    continue
                break
            self.expect(">")
            return pa.struct(fields), None
        if word == "uniontype":
            self.expect("<")
            children = []
            i = 0
            while True:
                children.append(pa.field(str(i), self.parse_type()))
                i += 1
                if self.peek() == ",":
                    self.pos += 1
                    continue
                break
            self.expect(">")
            return pa.dense_union(children), None
        self.error(f"unknown type {word!r}")


def parse_schema(ddl: str) -> pa.Schema:
    """Parse a DDL string; the root must be a struct (column 0 semantics,
    typedescription.go:709-711)."""
    p = _Parser(ddl.replace(" ", ""))
    t = p.parse_type()
    if p.pos != len(p.text):
        p.error("trailing characters")
    if not pa.types.is_struct(t):
        raise ValueError("root type must be struct<...>")
    return pa.schema(list(t))


def _type_ddl(t: pa.DataType) -> str:
    for name, prim in _PRIMITIVES.items():
        if t == prim:
            return name
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_type_ddl(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_type_ddl(t.key_type)},{_type_ddl(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_field_ddl(f)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_union(t):
        inner = ",".join(_type_ddl(f.type) for f in t)
        return f"uniontype<{inner}>"
    raise ValueError(f"no DDL mapping for {t}")


def _field_ddl(f: pa.Field) -> str:
    spec = bounded_string_spec(f)
    if spec is not None:
        return f"{spec[0]}({spec[1]})"
    return _type_ddl(f.type)


def schema_ddl(schema: pa.Schema) -> str:
    inner = ",".join(f"{f.name}:{_field_ddl(f)}" for f in schema)
    return f"struct<{inner}>"


_BOUNDED_RE = re.compile(r"^(char|varchar)\((\d+)\)$")


def bounded_string_spec(f: pa.Field) -> tuple[str, int] | None:
    """(kind, n) if the field carries a char(n)/varchar(n) annotation."""
    meta = f.metadata
    if not meta or b"orc:type" not in meta:
        return None
    m = _BOUNDED_RE.match(meta[b"orc:type"].decode())
    if not m:
        return None
    return m.group(1), int(m.group(2))


def enforce_bounded(arr: pa.Array, kind: str, n: int) -> pa.Array:
    """Apply the reference writer's char/varchar length semantics to a
    string array (treewriter.go:543 routes char/varchar to the string
    writer after Hive-style length enforcement): varchar(n) truncates to n
    codepoints; char(n) truncates then right-pads with spaces to exactly n
    codepoints. Vectorized pyarrow.compute kernels, codepoint semantics."""
    import pyarrow.compute as pc

    out = pc.utf8_slice_codeunits(arr, 0, n)
    if kind == "char":
        out = pc.utf8_rpad(out, n, " ")
    return out
