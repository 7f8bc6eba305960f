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
        word = self.name()
        if word in _PRIMITIVES:
            return _PRIMITIVES[word]
        if word in ("char", "varchar"):
            self.expect("(")
            self.name()  # length is advisory; arrow strings are unbounded
            self.expect(")")
            return pa.string()
        if word == "decimal":
            self.expect("(")
            p = int(self.name())
            self.expect(",")
            s = int(self.name())
            self.expect(")")
            return pa.decimal128(p, s)
        if word == "array":
            self.expect("<")
            child = self.parse_type()
            self.expect(">")
            return pa.list_(child)
        if word == "map":
            self.expect("<")
            key = self.parse_type()
            self.expect(",")
            val = self.parse_type()
            self.expect(">")
            return pa.map_(key, val)
        if word == "struct":
            self.expect("<")
            fields = []
            while True:
                fname = self.name()
                self.expect(":")
                fields.append(pa.field(fname, self.parse_type()))
                if self.peek() == ",":
                    self.pos += 1
                    continue
                break
            self.expect(">")
            return pa.struct(fields)
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
            return pa.dense_union(children)
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
        inner = ",".join(f"{f.name}:{_type_ddl(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_union(t):
        inner = ",".join(_type_ddl(f.type) for f in t)
        return f"uniontype<{inner}>"
    raise ValueError(f"no DDL mapping for {t}")


def schema_ddl(schema: pa.Schema) -> str:
    inner = ",".join(f"{f.name}:{_type_ddl(f.type)}" for f in schema)
    return f"struct<{inner}>"
