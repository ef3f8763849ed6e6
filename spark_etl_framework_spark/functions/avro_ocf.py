"""Full Avro codec + Object Container File (OCF) reader/writer.

The sibling functions/avro.py handles the Kafka payload case (flat
records of primitives, no container). Iceberg's manifests and manifest
lists are FULL Avro: OCF containers (magic ``Obj\\x01``, a metadata map
carrying the writer schema, 16-byte sync markers between blocks) whose
records nest structs, arrays, maps, and ``[null, T]`` unions. The Avro
1.11 specification is public; this module implements the binary encoding
schema-driven and the container framing directly — no avro package in
the sandbox (README.md), none needed.

Supported types: null, boolean, int, long (zigzag varints), float,
double (LE IEEE754), bytes, string, fixed, enum, array, map, union,
record. Codecs: ``null`` and ``deflate`` (zlib raw).
"""

from __future__ import annotations

import io
import json
import struct
import uuid
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# varints (same zigzag encoding as the flat codec, kept local for reuse
# against arbitrary streams)
# ---------------------------------------------------------------------------


def _write_long(n: int, out: bytearray) -> None:
    u = (n << 1) ^ (n >> 63)
    u &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: io.BytesIO) -> int:
    u = shift = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated avro varint")
        u |= (raw[0] & 0x7F) << shift
        if not raw[0] & 0x80:
            return (u >> 1) ^ -(u & 1)
        shift += 7


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------


def _resolve(schema, names: dict):
    """Inline named-type references ("TypeName" strings)."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _register(schema, names: dict) -> None:
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed") and "name" in schema:
            names[schema["name"]] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _register(f["type"], names)
        elif t == "array":
            _register(schema["items"], names)
        elif t == "map":
            _register(schema["values"], names)
    elif isinstance(schema, list):
        for s in schema:
            _register(s, names)


def encode_value(value, schema, names: dict, out: bytearray) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: index + value
        idx = _union_branch(value, schema, names)
        _write_long(idx, out)
        encode_value(value, schema[idx], names, out)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(int(value), out)
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        _write_long(len(value), out)
        out += bytes(value)
    elif t == "string":
        raw = value.encode("utf-8")
        _write_long(len(raw), out)
        out += raw
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(value)}")
        out += bytes(value)
    elif t == "enum":
        out += b""
        _write_long(schema["symbols"].index(value), out)
    elif t == "array":
        if value:
            _write_long(len(value), out)
            for item in value:
                encode_value(item, schema["items"], names, out)
        _write_long(0, out)
    elif t == "map":
        if value:
            _write_long(len(value), out)
            for k, v in value.items():
                raw = k.encode("utf-8")
                _write_long(len(raw), out)
                out += raw
                encode_value(v, schema["values"], names, out)
        _write_long(0, out)
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                encode_value(value[f["name"]], f["type"], names, out)
            elif "default" in f or _nullable(f["type"], names):
                encode_value(f.get("default"), f["type"], names, out)
            else:
                raise ValueError(f"missing required record field {f['name']!r}")
    else:
        raise ValueError(f"avro: unsupported type {t!r}")


def _nullable(schema, names) -> bool:
    schema = _resolve(schema, names)
    return isinstance(schema, list) and any(
        s == "null" or (isinstance(s, dict) and s.get("type") == "null")
        for s in schema
    )


def _union_branch(value, union: list, names: dict) -> int:
    for i, s in enumerate(union):
        s = _resolve(s, names)
        t = s["type"] if isinstance(s, dict) else s
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {union}")


def decode_value(buf: io.BytesIO, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        idx = _read_long(buf)
        return decode_value(buf, schema[idx], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(decode_value(buf, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = buf.read(_read_long(buf)).decode("utf-8")
                out[k] = decode_value(buf, schema["values"], names)
    if t == "record":
        return {
            f["name"]: decode_value(buf, f["type"], names)
            for f in schema["fields"]
        }
    raise ValueError(f"avro: unsupported type {t!r}")


# ---------------------------------------------------------------------------
# Object Container Files
# ---------------------------------------------------------------------------


def write_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
    codec: str = "null",
) -> None:
    names: dict = {}
    _register(schema, names)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    meta.update(metadata or {})
    sync = uuid.uuid4().bytes

    out = bytearray()
    out += _MAGIC
    _write_long(len(meta), out)
    for k, v in meta.items():
        kb = k.encode("utf-8")
        _write_long(len(kb), out)
        out += kb
        vb = v.encode("utf-8")
        _write_long(len(vb), out)
        out += vb
    _write_long(0, out)
    out += sync

    if records:
        block = bytearray()
        for rec in records:
            encode_value(rec, schema, names, block)
        payload = bytes(block)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        _write_long(len(records), out)
        _write_long(len(payload), out)
        out += payload
        out += sync
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def read_ocf(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """Returns (writer schema, file metadata, records)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != _MAGIC:
        raise ValueError(f"not an avro object container file: {path}")
    meta: dict[str, str] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = buf.read(_read_long(buf)).decode("utf-8")
            v = buf.read(_read_long(buf))
            meta[k] = v.decode("utf-8", errors="replace")
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", "null")
    names: dict = {}
    _register(schema, names)

    records: list[dict] = []
    while True:
        try:
            count = _read_long(buf)
        except EOFError:
            break
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(decode_value(block, schema, names))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"avro sync marker mismatch in {path}")
    return schema, meta, records
