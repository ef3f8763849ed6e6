"""Pure-Python Avro binary codec — nested records, arrays, maps, enums,
fixed — un-gates the Kafka Avro path for arbitrary record schemas.

The reference's Kafka reader decodes Avro payloads via spark-avro
(KafkaReadActor.scala:45,53); that jar is absent here, so ``decode_kafka``
falls back to this module. Rounds 1–7 covered only flat records of
primitives; real Kafka payloads are overwhelmingly NESTED (a record with
an array-of-records field is the canonical event envelope), so this now
implements the full Avro BINARY encoding (per the public Apache Avro
specification, avro.apache.org/docs/current/specification) recursively:

- ``int``/``long``: zigzag-encoded variable-length integers
- ``float``/``double``: little-endian IEEE 754
- ``boolean``: one byte; ``null``: zero bytes
- ``string``/``bytes``: long length prefix + payload
- record: field values concatenated in schema order (any nesting depth)
- array/map: block runs — count (negative count ⇒ a byte-size long
  follows, which readers must honour), items, 0-terminator
- enum: zigzag varint of the symbol index (decodes to the symbol string)
- fixed: exactly ``size`` raw bytes
- union ``["null", T]`` / ``[T, "null"]``: branch index then the datum
- named-type references: a record/enum/fixed name used later in the
  schema resolves to its definition (including recursive references,
  which are rejected with a clear error — Spark has no recursive types)

``logicalType`` annotations (round 8) decode to the same Spark types
spark-avro produces: ``decimal`` on bytes/fixed → DecimalType(p, s)
(big-endian two's-complement unscaled int, per the spec), ``date`` on
int → DateType (epoch days), ``timestamp-millis``/``timestamp-micros``
on long → TimestampType (UTC instants), ``local-timestamp-*`` →
TimestampNTZType. Every other logical type (uuid, time-*, duration)
falls back to its base type — the spec's required fallback, and the
same shape spark-avro yields for uuid/time anyway.

Remaining gates (clear ``NotImplementedError`` pointing at spark-avro):
multi-branch unions of non-null types (no Spark struct shape exists for
them short of spark-avro's member-struct encoding).

Spark mapping: record→struct, array→array, map→map<string,·>,
enum→string, fixed→binary. Exposed as Arrow-batched pandas UDFs
(``py_from_avro`` returning the struct, ``py_to_avro`` returning bytes).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import struct as _struct

import pandas as pd

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_EPOCH_NAIVE = _dt.datetime(1970, 1, 1)

_PRIMITIVES = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}

#: type-tree nodes (plain tuples so they pickle cheaply into UDFs):
#:   ("prim", name) | ("record", [(field, node), ...])
#:   ("array", item) | ("map", value) | ("enum", [symbols])
#:   ("fixed", size) | ("nullable", node)


def _logical_node(lt: str, kind, t: dict):
    """Map a logicalType annotation to a typed node, or None to fall back
    to the base type (the spec's rule for unrecognized/invalid ones)."""
    if lt == "decimal" and kind in ("bytes", "fixed"):
        prec, scale = int(t.get("precision", 0)), int(t.get("scale", 0))
        if not (1 <= prec <= 38 and 0 <= scale <= prec):
            return None  # invalid annotation: spec says use the base type
        size = int(t["size"]) if kind == "fixed" else None
        return ("decimal", prec, scale, size)
    if lt == "date" and kind == "int":
        return ("date",)
    if lt in ("timestamp-millis", "timestamp-micros") and kind == "long":
        return ("ts", lt.rsplit("-", 1)[1], True)
    if lt in ("local-timestamp-millis", "local-timestamp-micros") and kind == "long":
        return ("ts", lt.rsplit("-", 1)[1], False)
    return None


def _parse_type(t, names: dict, stack: set):
    """Recursively parse one Avro type declaration into a node."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return ("prim", t)
        if t == "null":
            raise NotImplementedError(
                "bare 'null' type outside a union is not a column shape "
                "(use spark-avro)"
            )
        if t in names:
            if t in stack:
                raise NotImplementedError(
                    f"recursive named type {t!r}: Spark has no recursive "
                    "struct type (use spark-avro)"
                )
            return names[t]
        raise NotImplementedError(
            f"unsupported/unknown Avro type {t!r} (use spark-avro)"
        )
    if isinstance(t, list):
        if len(t) == 2 and "null" in t:
            other = t[0] if t[1] == "null" else t[1]
            return ("nullable", _parse_type(other, names, stack))
        raise NotImplementedError(
            f"only [null, T] unions are supported, got {t!r} (use spark-avro)"
        )
    if isinstance(t, dict):
        kind = t.get("type")
        lt = t.get("logicalType")
        if lt:
            node = _logical_node(lt, kind, t)
            if node is not None:
                # a named fixed-decimal is referenceable like any fixed
                if kind == "fixed" and t.get("name"):
                    names[t["name"]] = node
                return node
            # unhandled logical types fall THROUGH to the base type —
            # the spec's mandated fallback (uuid→string, time-*→int/long)
        if kind == "record":
            fields: list = []
            node = ("record", fields)
            nm = t.get("name")
            if nm:
                names[nm] = node
                stack = stack | {nm}
            for f in t["fields"]:
                fields.append((f["name"], _parse_type(f["type"], names, stack)))
            return node
        if kind == "array":
            return ("array", _parse_type(t["items"], names, stack))
        if kind == "map":
            return ("map", _parse_type(t["values"], names, stack))
        if kind == "enum":
            node = ("enum", list(t["symbols"]))
            if t.get("name"):
                names[t["name"]] = node
            return node
        if kind == "fixed":
            node = ("fixed", int(t["size"]))
            if t.get("name"):
                names[t["name"]] = node
            return node
        if isinstance(kind, (str, list, dict)):
            return _parse_type(kind, names, stack)  # {"type": "long"} wrapper
    raise NotImplementedError(
        f"unsupported Avro type {t!r} (use spark-avro)"
    )


def parse_schema(schema_json: str):
    """Parse a top-level record schema to its field list
    ``[(name, node), ...]`` — the form encode/decode_record consume."""
    s = json.loads(schema_json)
    if not isinstance(s, dict) or s.get("type") != "record":
        raise ValueError(f"top-level Avro schema must be a record, got {s!r}")
    node = _parse_type(s, {}, set())
    return node[1]


def _spark_type(node) -> str:
    kind = node[0]
    if kind == "prim":
        return _PRIMITIVES[node[1]]
    if kind == "nullable":
        return _spark_type(node[1])
    if kind == "record":
        inner = ",".join(f"`{n}`:{_spark_type(t)}" for n, t in node[1])
        return f"struct<{inner}>"
    if kind == "array":
        return f"array<{_spark_type(node[1])}>"
    if kind == "map":
        return f"map<string,{_spark_type(node[1])}>"
    if kind == "enum":
        return "string"
    if kind == "fixed":
        return "binary"
    if kind == "decimal":
        return f"decimal({node[1]},{node[2]})"
    if kind == "date":
        return "date"
    if kind == "ts":
        return "timestamp" if node[2] else "timestamp_ntz"
    raise AssertionError(node)


def spark_ddl(schema_json: str) -> str:
    """The record's Spark struct DDL (for pandas_udf return types)."""
    return ", ".join(
        f"`{n}` {_spark_type(t)}" for n, t in parse_schema(schema_json)
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


def _is_nan(v) -> bool:
    return (isinstance(v, float) and v != v) or v is pd.NaT


def _as_pairs(v):
    """A map cell arrives as a dict (python path) or a list of (k, v)
    tuples (Arrow's map→pandas representation) — normalize to pairs."""
    if isinstance(v, dict):
        return list(v.items())
    return [(k, w) for k, w in v]


def _encode_value(v, node, out: bytearray, path: str, tz: str = "UTC") -> None:
    kind = node[0]
    if kind == "nullable":
        # pandas represents a null cell as NaN/NaT/None depending on
        # dtype — all of them take the null union branch (round-6 ADVICE)
        if v is None or _is_nan(v):
            _write_long(0, out)  # union branch 0 = null
            return
        _write_long(1, out)
        _encode_value(v, node[1], out, path, tz)
        return
    if v is None:
        raise ValueError(f"field {path!r} is not nullable but got None")
    if kind == "prim":
        t = node[1]
        if t in ("int", "long"):
            _write_long(int(v), out)
        elif t == "boolean":
            out.append(1 if v else 0)
        elif t == "float":
            out += _struct.pack("<f", float(v))
        elif t == "double":
            out += _struct.pack("<d", float(v))
        else:  # string | bytes
            raw = v.encode("utf-8") if t == "string" else bytes(v)
            _write_long(len(raw), out)
            out += raw
        return
    if kind == "record":
        get = v.get if isinstance(v, dict) else lambda n, _v=v: getattr(_v, n)
        for fname, ftype in node[1]:
            _encode_value(get(fname), ftype, out, f"{path}.{fname}", tz)
        return
    if kind == "array":
        items = list(v)  # ndarray from Arrow, list from python
        if items:
            _write_long(len(items), out)
            for i, item in enumerate(items):
                _encode_value(item, node[1], out, f"{path}[{i}]", tz)
        _write_long(0, out)  # block terminator
        return
    if kind == "map":
        pairs = _as_pairs(v)
        if pairs:
            _write_long(len(pairs), out)
            for k, w in pairs:
                raw = str(k).encode("utf-8")
                _write_long(len(raw), out)
                out += raw
                _encode_value(w, node[1], out, f"{path}[{k!r}]", tz)
        _write_long(0, out)
        return
    if kind == "enum":
        try:
            idx = node[1].index(v)
        except ValueError:
            raise ValueError(
                f"field {path!r}: {v!r} is not one of the enum symbols "
                f"{node[1]}"
            ) from None
        _write_long(idx, out)
        return
    if kind == "fixed":
        raw = bytes(v)
        if len(raw) != node[1]:
            raise ValueError(
                f"field {path!r}: fixed({node[1]}) got {len(raw)} bytes"
            )
        out += raw
        return
    if kind == "decimal":
        _, prec, scale, size = node
        d = v if isinstance(v, _decimal.Decimal) else _decimal.Decimal(str(v))
        unscaled = int(d.scaleb(scale))
        if _decimal.Decimal(unscaled).scaleb(-scale) != d:
            raise ValueError(
                f"field {path!r}: {v!r} does not fit decimal scale {scale}"
            )
        if size is not None:  # fixed-backed: exactly `size` bytes
            raw = unscaled.to_bytes(size, "big", signed=True)
        else:  # bytes-backed: minimal two's-complement length
            raw = unscaled.to_bytes(unscaled.bit_length() // 8 + 1, "big",
                                    signed=True)
            _write_long(len(raw), out)
        out += raw
        return
    if kind == "date":
        if isinstance(v, (pd.Timestamp, _dt.datetime)):
            v = v.date()
        _write_long((v - _EPOCH_DATE).days, out)
        return
    if kind == "ts":
        _, unit, ltz = node
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        elif ltz and tz != "UTC":
            # Spark hands pandas UDFs session-tz-NAIVE timestamps; a
            # timestamp-{millis,micros} field is a UTC instant, so
            # localize in the session zone first (py_to_avro passes it)
            ts = ts.tz_localize(tz).tz_convert("UTC").tz_localize(None)
        micros = ts.value // 1_000  # pandas stores ns
        _write_long(micros if unit == "micros" else micros // 1_000, out)
        return
    raise AssertionError(node)


def _decode_value(buf: bytes, pos: int, node, path: str):
    kind = node[0]
    if kind == "nullable":
        branch, pos = _read_long(buf, pos)
        if branch == 0:
            return None, pos
        return _decode_value(buf, pos, node[1], path)
    if kind == "prim":
        t = node[1]
        if t in ("int", "long"):
            return _read_long(buf, pos)
        if t == "boolean":
            return buf[pos] == 1, pos + 1
        if t == "float":
            return _struct.unpack_from("<f", buf, pos)[0], pos + 4
        if t == "double":
            return _struct.unpack_from("<d", buf, pos)[0], pos + 8
        n, pos = _read_long(buf, pos)
        raw = buf[pos : pos + n]
        if len(raw) != n:
            raise ValueError(f"truncated Avro {t} for field {path!r}")
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    if kind == "record":
        values = {}
        for fname, ftype in node[1]:
            values[fname], pos = _decode_value(buf, pos, ftype, f"{path}.{fname}")
        return values, pos
    if kind in ("array", "map"):
        out_list: list = []
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                break
            if count < 0:
                # negative count: a block byte-size follows (writers may
                # emit it to let readers skip blocks) — read and ignore
                _, pos = _read_long(buf, pos)
                count = -count
            for i in range(count):
                if kind == "map":
                    klen, pos = _read_long(buf, pos)
                    k = buf[pos : pos + klen].decode("utf-8")
                    pos += klen
                    w, pos = _decode_value(buf, pos, node[1], f"{path}[{k!r}]")
                    out_list.append((k, w))
                else:
                    w, pos = _decode_value(buf, pos, node[1], f"{path}[{i}]")
                    out_list.append(w)
        return (dict(out_list) if kind == "map" else out_list), pos
    if kind == "enum":
        idx, pos = _read_long(buf, pos)
        try:
            return node[1][idx], pos
        except IndexError:
            raise ValueError(
                f"field {path!r}: enum index {idx} out of range"
            ) from None
    if kind == "fixed":
        raw = buf[pos : pos + node[1]]
        if len(raw) != node[1]:
            raise ValueError(f"truncated Avro fixed for field {path!r}")
        return bytes(raw), pos + node[1]
    if kind == "decimal":
        _, prec, scale, size = node
        if size is None:
            n, pos = _read_long(buf, pos)
        else:
            n = size
        raw = buf[pos : pos + n]
        if len(raw) != n:
            raise ValueError(f"truncated Avro decimal for field {path!r}")
        unscaled = int.from_bytes(raw, "big", signed=True)
        return _decimal.Decimal(unscaled).scaleb(-scale), pos + n
    if kind == "date":
        days, pos = _read_long(buf, pos)
        return _EPOCH_DATE + _dt.timedelta(days=days), pos
    if kind == "ts":
        _, unit, ltz = node
        n, pos = _read_long(buf, pos)
        micros = n if unit == "micros" else n * 1_000
        epoch = _EPOCH_UTC if ltz else _EPOCH_NAIVE
        return epoch + _dt.timedelta(microseconds=micros), pos
    raise AssertionError(node)


def encode_record(values: dict, fields, tz: str = "UTC") -> bytes:
    out = bytearray()
    _encode_value(values, ("record", fields), out, "$", tz)
    return bytes(out)


def decode_record(buf: bytes, fields) -> dict:
    values, pos = _decode_value(buf, 0, ("record", fields), "$")
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after Avro record: consumed {pos} of {len(buf)}"
        )
    return values


# -- Spark column functions -------------------------------------------------


def py_from_avro(col, schema_json: str):
    """Jar-free ``from_avro``: decode an Avro-binary column into the record
    struct — nested records/arrays/maps/enums/fixed included (Arrow-batched
    pandas UDF)."""
    from pyspark.sql.functions import pandas_udf

    fields = parse_schema(schema_json)
    names = [n for n, _ in fields]
    ddl = spark_ddl(schema_json)

    @pandas_udf(ddl)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = [decode_record(bytes(b), fields) for b in s]
        return pd.DataFrame(rows, columns=names)

    return dec(col)


def py_to_avro(col, schema_json: str):
    """Jar-free ``to_avro``: encode a struct column to Avro binary."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    fields = parse_schema(schema_json)
    # Arrow hands the UDF session-tz-NAIVE timestamps; capture the tz at
    # definition time so timestamp-ltz fields encode the right instant
    # even when the session is not UTC (the pickled closure carries it)
    active = SparkSession.getActiveSession()
    tz = active.conf.get("spark.sql.session.timeZone", "UTC") if active else "UTC"

    # a struct input column arrives as a pandas DataFrame; pyspark's
    # type-hint inference only accepts Series annotations, so the hint
    # says Series and the body handles the DataFrame it actually gets
    @pandas_udf("binary")
    def enc(s: pd.Series) -> pd.Series:
        frame = s if isinstance(s, pd.DataFrame) else pd.DataFrame({"_v": s})
        return pd.Series(
            [encode_record(dict(row), fields, tz)
             for row in frame.to_dict("records")]
        )

    return enc(col)
