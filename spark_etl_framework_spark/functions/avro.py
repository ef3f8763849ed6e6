"""Pure-Python Avro binary codec for flat records — un-gates Kafka Avro.

The reference's Kafka reader decodes Avro payloads via spark-avro
(KafkaReadActor.scala:45,53); that jar is absent here, so the Avro
branch of ``decode_kafka`` was gated. This module implements the Avro
BINARY encoding itself (per the public Apache Avro specification) for
the schema subset Kafka keys/values overwhelmingly use — a flat record
of primitives, each optionally nullable via a ``["null", T]`` union:

- ``int``/``long``: zigzag-encoded variable-length integers
- ``float``/``double``: little-endian IEEE 754
- ``boolean``: one byte; ``null``: zero bytes
- ``string``/``bytes``: long length prefix + payload
- record: field values concatenated in schema order
- union ``["null", T]``: long branch index then the datum

Exposed as Arrow-batched pandas UDFs (``py_from_avro`` returning the
record struct, ``py_to_avro`` returning bytes), so ``decode_kafka``
falls back to them when the spark-avro jar is missing — same column
shape as ``from_avro``, flattened to ``key.*``/``value.*`` downstream.
Nested records/arrays/maps/enums/fixed/logical types raise a clear
``NotImplementedError`` pointing at spark-avro for full coverage.
"""

from __future__ import annotations

import json
import struct as _struct

import pandas as pd

_PRIMITIVES = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _field_type(t) -> tuple[str, bool]:
    """(avro primitive name, nullable) for a field's type declaration."""
    if isinstance(t, list):
        if len(t) == 2 and "null" in t:
            other = t[0] if t[1] == "null" else t[1]
            name, _ = _field_type(other)
            return name, True
        raise NotImplementedError(
            f"only [null, T] unions are supported, got {t!r} (use spark-avro)"
        )
    if isinstance(t, str) and t in _PRIMITIVES:
        return t, False
    raise NotImplementedError(
        f"unsupported Avro type {t!r}: flat records of primitives only "
        "(nested/array/map/enum/fixed/logical types need spark-avro)"
    )


def parse_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """Validate and flatten a record schema to [(name, primitive, nullable)]."""
    s = json.loads(schema_json)
    if not isinstance(s, dict) or s.get("type") != "record":
        raise ValueError(f"top-level Avro schema must be a record, got {s!r}")
    out = []
    for f in s["fields"]:
        name, nullable = _field_type(f["type"])
        out.append((f["name"], name, nullable))
    return out


def spark_ddl(schema_json: str) -> str:
    """The record's Spark struct DDL (for pandas_udf return types)."""
    return ", ".join(
        f"{n} {_PRIMITIVES[t]}" for n, t, _ in parse_schema(schema_json)
    )


# -- binary primitives (Avro spec: zigzag varints, LE IEEE floats) ---------


def _write_long(n: int, out: bytearray) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # un-zigzag


def encode_record(values: dict, fields) -> bytes:
    out = bytearray()
    for name, t, nullable in fields:
        v = values.get(name)
        # pandas represents a null int/double cell as NaN, which is not
        # None — without this check a nullable numeric null crashed in
        # int(v)/struct.pack instead of taking the null union branch
        # (v != v is the NaN test). Only for NULLABLE fields: a NaN in a
        # non-nullable double is a legitimate IEEE value and encodes as-is.
        if nullable and isinstance(v, float) and v != v:
            v = None
        if nullable:
            if v is None:
                _write_long(0, out)  # union branch 0 = null
                continue
            _write_long(1, out)
        elif v is None:
            raise ValueError(f"field {name!r} is not nullable but got None")
        if t in ("int", "long"):
            _write_long(int(v), out)
        elif t == "boolean":
            out.append(1 if v else 0)
        elif t == "float":
            out += _struct.pack("<f", float(v))
        elif t == "double":
            out += _struct.pack("<d", float(v))
        elif t in ("string", "bytes"):
            raw = v.encode("utf-8") if t == "string" else bytes(v)
            _write_long(len(raw), out)
            out += raw
    return bytes(out)


def decode_record(buf: bytes, fields) -> dict:
    pos, values = 0, {}
    for name, t, nullable in fields:
        if nullable:
            branch, pos = _read_long(buf, pos)
            if branch == 0:
                values[name] = None
                continue
        if t in ("int", "long"):
            values[name], pos = _read_long(buf, pos)
        elif t == "boolean":
            values[name] = buf[pos] == 1
            pos += 1
        elif t == "float":
            values[name] = _struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif t == "double":
            values[name] = _struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif t in ("string", "bytes"):
            n, pos = _read_long(buf, pos)
            raw = buf[pos : pos + n]
            if len(raw) != n:
                raise ValueError(f"truncated Avro {t} for field {name!r}")
            values[name] = raw.decode("utf-8") if t == "string" else bytes(raw)
            pos += n
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after Avro record: consumed {pos} of {len(buf)}"
        )
    return values


# -- Spark column functions -------------------------------------------------


def py_from_avro(col, schema_json: str):
    """Jar-free ``from_avro``: decode an Avro-binary column into the record
    struct (Arrow-batched pandas UDF)."""
    from pyspark.sql.functions import pandas_udf

    fields = parse_schema(schema_json)
    names = [n for n, _, _ in fields]
    ddl = spark_ddl(schema_json)

    @pandas_udf(ddl)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = [decode_record(bytes(b), fields) for b in s]
        return pd.DataFrame(rows, columns=names)

    return dec(col)


def py_to_avro(col, schema_json: str):
    """Jar-free ``to_avro``: encode a struct column to Avro binary."""
    from pyspark.sql.functions import pandas_udf

    fields = parse_schema(schema_json)

    # a struct input column arrives as a pandas DataFrame; pyspark's
    # type-hint inference only accepts Series annotations, so the hint
    # says Series and the body handles the DataFrame it actually gets
    @pandas_udf("binary")
    def enc(s: pd.Series) -> pd.Series:
        frame = s if isinstance(s, pd.DataFrame) else pd.DataFrame({"_v": s})
        return pd.Series(
            [encode_record(dict(row), fields) for row in frame.to_dict("records")]
        )

    return enc(col)
