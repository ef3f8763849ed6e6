"""Property-based tests (hypothesis) for the pure-Python kernels."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_etl_framework_spark.functions.binary import (
    _binary_split,
    _com3_to_int,
)
from spark_etl_framework_spark.plans import sqlutil as S
from spark_etl_framework_spark.sinks.jdbc import rewrite_param_sql


@given(st.lists(st.binary(min_size=0, max_size=8), max_size=6), st.binary(min_size=1, max_size=3))
def test_binary_split_roundtrip(parts, delim):
    # joining the split of any join is identity when parts contain no delim
    parts = [p for p in parts if delim not in p]
    data = delim.join(parts)
    got = _binary_split(data, delim)
    assert got == (parts if parts else [b""])


@given(st.integers(min_value=-(10**14), max_value=10**14))
def test_com3_roundtrip(n):
    # encode an int as packed decimal, decode it back
    digits = str(abs(n))
    if len(digits) % 2 == 0:
        digits = "0" + digits
    nibbles = [int(d) for d in digits] + [0x0D if n < 0 else 0x0C]
    data = bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
    )
    assert _com3_to_int(data) == n


@given(st.text(alphabet="abc';\n- /*", max_size=120))
@settings(max_examples=200)
def test_split_statements_never_loses_nonquoted_content(sql):
    # splitting never throws, and rejoining with ';' preserves all non-empty,
    # non-whitespace characters outside comments
    stmts = S.split_statements(sql)
    for s in stmts:
        assert s.strip() == s and s != ""


@given(
    st.dictionaries(
        st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        st.from_regex(r"[A-Za-z0-9_]{0,8}", fullmatch=True),
        max_size=4,
    ),
    st.lists(st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True), max_size=4),
)
def test_substitute_resolves_known_keeps_unknown(vars_, extra):
    text = " ".join(f"${{{k}}}" for k in list(vars_) + extra)
    out = S.substitute(text, vars_)
    for k, v in vars_.items():
        assert v in out or k in vars_  # resolved values present
    for k in extra:
        if k not in vars_:
            assert f"${{{k}}}" in out  # unknown placeholders preserved


@given(st.lists(st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True), min_size=1, max_size=5))
def test_rewrite_param_sql_counts(fields):
    sql = "insert values(" + ", ".join(f"@{f}" for f in fields) + ")"
    rewritten, got = rewrite_param_sql(sql)
    assert rewritten.count("?") == len(fields)
    assert got == fields


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.sampled_from([1, 3]),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_netpbm_encode_decode_roundtrip(w, h, c, with_comment, rng):
    """Any (w, h, channels, raster) encodes to a netpbm header + raster that
    _decode_netpbm parses back verbatim — comments and arbitrary token
    whitespace included."""
    from spark_etl_framework_spark.operators.multimodal import _decode_netpbm

    px = bytes(rng.randrange(256) for _ in range(w * h * c))
    magic = b"P6" if c == 3 else b"P5"
    hdr = magic + (b"\n# comment line\n" if with_comment else b"\n")
    raw = hdr + f"{w} {h}\n255\n".encode() + px
    fmt, gw, gh, gc, gpx = _decode_netpbm(raw)
    assert (gw, gh, gc, gpx) == (w, h, c, px)
    assert fmt == ("ppm/rgb8" if c == 3 else "pgm/gray8")


@given(st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=12))
@settings(max_examples=30, deadline=None)
def test_resize_nearest_identity_and_dims(w, h):
    """Nearest-neighbor resize to the same dims is the identity; to any dims
    it produces exactly out_w*out_h*c bytes drawn from the source pixels."""
    from spark_etl_framework_spark.operators.multimodal import _resize_nearest

    px = bytes((i * 37) % 256 for i in range(w * h * 3))
    assert _resize_nearest(px, w, h, 3, w, h) == px
    out = _resize_nearest(px, w, h, 3, 5, 7)
    assert len(out) == 5 * 7 * 3


def test_mulaw_expand_is_codec_exact_all_256_codes():
    """Value-level G.711 identity over the full code space: re-encoding
    any expanded sample with the standard compressor reproduces a code
    that expands to the SAME value (0x7F and 0xFF both mean zero, so
    byte-level roundtrip is checked for all codes except that alias)."""
    from spark_etl_framework_spark.operators.multimodal import _expand_mulaw

    def expand(bts):  # the PRODUCTION expander, not a local re-derivation
        return _expand_mulaw(bytes(bts))

    def compress(pcm):  # standard CCITT linear -> mu-law encoder
        sign = 0x80 if pcm < 0 else 0
        if pcm < 0:
            pcm = -pcm
        pcm = min(pcm, 32635) + 0x84
        exp, mask = 7, 0x4000
        while exp > 0 and not (pcm & mask):
            exp -= 1
            mask >>= 1
        mant = (pcm >> (exp + 3)) & 0x0F
        return ~(sign | (exp << 4) | mant) & 0xFF

    codes = bytes(range(256))
    vals = expand(codes)
    for b, v in zip(codes, vals):
        rb = compress(int(v))
        assert expand(bytes([rb]))[0] == v, (b, v, rb)
        if b != 0x7F:  # 0x7F is the negative-zero alias of 0xFF
            assert rb == b, (b, v, rb)


@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[A-Za-z0-9_.][A-Za-z0-9_./-]{0,60}", fullmatch=True),
            st.binary(min_size=0, max_size=1200),
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda m: m[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_tar_header_walk_roundtrip_random_members(members):
    """Property: archives assembled from our header writer parse back
    with our walker AND with stdlib tarfile, byte-for-byte, for random
    member names/sizes (including zero-length and multi-block data)."""
    import io
    import tarfile

    from spark_etl_framework_spark.operators.multimodal import (
        _tar_header,
        _walk_tar,
    )

    out = bytearray()
    for name, data in members:
        out += _tar_header(name, len(data))
        out += data
        out += b"\0" * ((-len(data)) % 512)
    out += b"\0" * 1024
    raw = bytes(out)

    got = {n: bytes(c) for n, _o, _s, c in _walk_tar(raw)}
    assert got == dict(members)

    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        std = {m.name: tf.extractfile(m).read() for m in tf.getmembers()}
    assert std == dict(members)


@given(
    st.lists(
        st.tuples(
            st.sampled_from([b"P5", b"P6"]),
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=1, max_value=4),
        ),
        min_size=1,
        max_size=6,
    ),
    st.randoms(use_true_random=False),
)
@settings(deadline=None)
def test_video_container_split_roundtrip(shapes, rng):
    """Concatenating arbitrary mixed-size netpbm frames and splitting the
    container recovers exactly the original frame byte-slices."""
    from spark_etl_framework_spark.operators.multimodal import _split_netpbm_frames

    frames = []
    for magic, w, h in shapes:
        c = 3 if magic == b"P6" else 1
        raster = bytes(rng.randrange(256) for _ in range(w * h * c))
        frames.append(magic + f"\n{w} {h}\n255\n".encode() + raster)
    got = _split_netpbm_frames(b"".join(frames))
    assert got == frames


@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=6),
                  st.integers(min_value=1, max_value=10_000)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5_000),
)
@settings(deadline=None, max_examples=15)
def test_compaction_plan_partitions_every_file_once(spark_files, target):
    """compaction_plan: every file appears exactly once, group ids are a
    dense 0..max range in NFD order, and a group's cumulative row total
    only crosses a target boundary at a group switch."""
    from spark_etl_framework_spark.operators.etl import compaction_plan
    from spark_etl_framework_spark.session import get_session

    spark = get_session("tests", master="local[4]")
    files = spark.createDataFrame(spark_files, "file_name string, n_rows long")
    plan = sorted(
        compaction_plan(files, target_rows=target).collect(),
        key=lambda r: (-r.n_rows, r.file_name),
    )
    assert {r.file_name for r in plan} == {f for f, _ in spark_files}
    cum = 0
    for r in plan:
        assert r.compact_group == cum // target
        cum += r.n_rows


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(max_size=20)),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.booleans(),
            st.binary(max_size=16),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(deadline=None)
def test_avro_codec_roundtrip(rows):
    """Pure-Python Avro binary codec: encode->decode identity over longs
    (zigzag incl. extreme negatives), nullable strings (union branches),
    doubles, booleans, and bytes."""
    import json

    from spark_etl_framework_spark.functions.avro import (
        decode_record,
        encode_record,
        parse_schema,
    )

    schema = parse_schema(
        json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "a", "type": "long"},
                    {"name": "b", "type": ["null", "string"]},
                    {"name": "c", "type": "double"},
                    {"name": "d", "type": "boolean"},
                    {"name": "e", "type": "bytes"},
                ],
            }
        )
    )
    for a, b, c, d, e in rows:
        vals = {"a": a, "b": b, "c": c, "d": d, "e": e}
        assert decode_record(encode_record(vals, schema), schema) == vals


def test_avro_schema_gates_and_wire_examples():
    """Unsupported Avro shapes raise with the spark-avro pointer; the
    zigzag wire bytes match the Avro spec's canonical examples."""
    import json

    import pytest as _pt

    from spark_etl_framework_spark.functions.avro import (
        decode_record,
        encode_record,
        parse_schema,
    )

    # multi-branch non-null unions stay gated (no Spark struct shape);
    # recursive named types stay gated (Spark has no recursive structs)
    with _pt.raises(NotImplementedError, match="spark-avro"):
        parse_schema(json.dumps({"type": "record", "name": "r", "fields": [
            {"name": "x", "type": ["int", "string"]}]}))
    with _pt.raises(NotImplementedError, match="spark-avro"):
        parse_schema(json.dumps({"type": "record", "name": "node", "fields": [
            {"name": "next", "type": ["null", "node"]}]}))
    with _pt.raises(ValueError, match="must be a record"):
        parse_schema(json.dumps("string"))

    f = parse_schema(json.dumps({"type": "record", "name": "r",
                                 "fields": [{"name": "a", "type": "long"}]}))
    # spec: 1 -> 0x02, -1 -> 0x01, 64 -> 0x80 0x01
    assert encode_record({"a": 1}, f).hex() == "02"
    assert encode_record({"a": -1}, f).hex() == "01"
    assert encode_record({"a": 64}, f).hex() == "8001"
    with _pt.raises(ValueError, match="trailing bytes"):
        decode_record(b"\x02\x02", f)


def test_avro_nan_is_null_for_nullable_fields_only():
    """The pandas path surfaces a null numeric cell as NaN, not None —
    a nullable field must take the null union branch (round-6 ADVICE);
    a NON-nullable double keeps NaN as a legitimate IEEE value."""
    import json
    import math

    from spark_etl_framework_spark.functions.avro import (
        decode_record,
        encode_record,
        parse_schema,
    )

    s = parse_schema(json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "long"]},
        {"name": "y", "type": ["null", "double"]},
        {"name": "z", "type": "double"},
    ]}))
    out = decode_record(encode_record({"x": float("nan"), "y": float("nan"),
                                       "z": float("nan")}, s), s)
    assert out["x"] is None and out["y"] is None
    assert math.isnan(out["z"])


def test_avro_nested_codec_roundtrip():
    """Round-8 extension: the codec handles arbitrary nesting — records
    within records, arrays of records, maps, enums, fixed, named-type
    references — per the Avro spec's recursive binary encoding. Includes
    the negative-block-count read path (a writer that emits block sizes)."""
    import json

    from spark_etl_framework_spark.functions.avro import (
        decode_record,
        encode_record,
        parse_schema,
        spark_ddl,
    )

    schema = {
        "type": "record", "name": "envelope", "fields": [
            {"name": "id", "type": "long"},
            {"name": "who", "type": {"type": "record", "name": "user",
             "fields": [{"name": "name", "type": "string"},
                        {"name": "score", "type": ["null", "double"]}]}},
            {"name": "events", "type": {"type": "array", "items": {
                "type": "record", "name": "ev", "fields": [
                    {"name": "kind", "type": {"type": "enum", "name": "k",
                     "symbols": ["view", "click", "buy"]}},
                    {"name": "n", "type": "int"}]}}},
            {"name": "tags", "type": {"type": "map", "values": "long"}},
            {"name": "mac", "type": {"type": "fixed", "name": "mac6",
                                     "size": 6}},
            # named-type reference: 'user' defined above, reused here
            {"name": "friend", "type": ["null", "user"]},
        ],
    }
    fields = parse_schema(json.dumps(schema))
    assert spark_ddl(json.dumps(schema)) == (
        "`id` bigint, `who` struct<`name`:string,`score`:double>, "
        "`events` array<struct<`kind`:string,`n`:int>>, "
        "`tags` map<string,bigint>, `mac` binary, "
        "`friend` struct<`name`:string,`score`:double>"
    )
    v = {
        "id": 7,
        "who": {"name": "ada", "score": None},
        "events": [{"kind": "view", "n": 1}, {"kind": "buy", "n": 2}],
        "tags": {"a": 1, "b": -2},
        "mac": b"\x01\x02\x03\x04\x05\x06",
        "friend": {"name": "bob", "score": 1.5},
    }
    assert decode_record(encode_record(v, fields), fields) == v
    empty = {"id": 0, "who": {"name": "", "score": 0.0}, "events": [],
             "tags": {}, "mac": b"\0" * 6, "friend": None}
    assert decode_record(encode_record(empty, fields), fields) == empty

    # negative block count per the spec: count=-2 then byte-size, items, 0
    arr_fields = parse_schema(json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "xs", "type": {"type": "array", "items": "int"}}],
    }))
    from spark_etl_framework_spark.functions.avro import _write_long

    buf = bytearray()
    _write_long(-2, buf)
    body = bytearray()
    _write_long(3, body)
    _write_long(4, body)
    _write_long(len(body), buf)
    buf += body
    _write_long(0, buf)
    assert decode_record(bytes(buf), arr_fields) == {"xs": [3, 4]}


@given(
    st.lists(
        st.tuples(
            st.decimals(min_value=-(10**10), max_value=10**10, places=2,
                        allow_nan=False, allow_infinity=False),
            st.dates(min_value=__import__("datetime").date(1900, 1, 1),
                     max_value=__import__("datetime").date(2200, 1, 1)),
            st.integers(min_value=-(2**52), max_value=2**52),  # epoch micros
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(deadline=None)
def test_avro_logical_types_roundtrip(rows):
    """Round-8 logical types: decimal (bytes- and fixed-backed, big-endian
    two's-complement unscaled int per the spec), date (epoch days),
    timestamp-micros/millis (UTC instants), local-timestamp (naive) —
    encode->decode identity, and the Spark DDL matches spark-avro's
    mapping."""
    import datetime
    import decimal
    import json

    from spark_etl_framework_spark.functions.avro import (
        decode_record,
        encode_record,
        parse_schema,
        spark_ddl,
    )

    schema = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "amount", "type": {"type": "bytes",
             "logicalType": "decimal", "precision": 14, "scale": 2}},
            {"name": "amount_f", "type": {"type": "fixed", "name": "d8",
             "size": 8, "logicalType": "decimal", "precision": 14,
             "scale": 2}},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {"name": "at_us", "type": {"type": "long",
             "logicalType": "timestamp-micros"}},
            {"name": "at_ms", "type": {"type": "long",
             "logicalType": "timestamp-millis"}},
            {"name": "local_us", "type": ["null", {"type": "long",
             "logicalType": "local-timestamp-micros"}]},
        ],
    })
    assert spark_ddl(schema) == (
        "`amount` decimal(14,2), `amount_f` decimal(14,2), `day` date, "
        "`at_us` timestamp, `at_ms` timestamp, `local_us` timestamp_ntz"
    )
    fields = parse_schema(schema)
    utc = datetime.timezone.utc
    for dec, day, micros in rows:
        ts = datetime.datetime(1970, 1, 1, tzinfo=utc) + datetime.timedelta(
            microseconds=micros
        )
        ms_ts = datetime.datetime(1970, 1, 1, tzinfo=utc) + datetime.timedelta(
            milliseconds=micros // 1000
        )
        vals = {
            "amount": dec, "amount_f": dec, "day": day,
            "at_us": ts, "at_ms": ms_ts,
            "local_us": ts.replace(tzinfo=None),
        }
        out = decode_record(encode_record(vals, fields), fields)
        assert out["amount"] == dec and out["amount_f"] == dec
        assert isinstance(out["amount"], decimal.Decimal)
        assert out["day"] == day
        assert out["at_us"] == ts and out["at_ms"] == ms_ts
        assert out["local_us"] == ts.replace(tzinfo=None)
        assert out["local_us"].tzinfo is None


def test_avro_logical_types_spec_bytes_and_fallback():
    """Canonical wire bytes for decimal per the spec (unscaled big-endian
    two's complement, minimal length for bytes-backed), scale-overflow
    rejection, and the mandated base-type fallback for unhandled/invalid
    logical annotations (uuid, time-micros, decimal on string)."""
    import decimal
    import json

    import pytest as _pt

    from spark_etl_framework_spark.functions.avro import (
        encode_record,
        parse_schema,
        spark_ddl,
    )

    s2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 10, "scale": 2}}]})
    f = parse_schema(s2)
    # 0.01 -> unscaled 1 -> length 1, byte 0x01 (length prefix 0x02)
    assert encode_record({"d": decimal.Decimal("0.01")}, f).hex() == "0201"
    # -0.01 -> unscaled -1 -> 0xff
    assert encode_record({"d": decimal.Decimal("-0.01")}, f).hex() == "02ff"
    # 1.28 -> unscaled 128 needs TWO bytes signed (0x0080)
    assert encode_record({"d": decimal.Decimal("1.28")}, f).hex() == "040080"
    with _pt.raises(ValueError, match="scale"):
        encode_record({"d": decimal.Decimal("0.001")}, f)

    # fallback: uuid -> string, time-micros -> bigint, invalid decimal
    # placement (on string) -> string
    fb = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "t", "type": {"type": "long",
                               "logicalType": "time-micros"}},
        {"name": "x", "type": {"type": "string",
                               "logicalType": "decimal", "precision": 4}},
    ]})
    assert spark_ddl(fb) == "`u` string, `t` bigint, `x` string"
