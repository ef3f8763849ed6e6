"""Kafka connector e2e over the engine's own wire protocol
(sources/kwire.py): RecordBatch v2 byte format validated against the
spec (CRC-32C published vectors, zigzag varints, 61-byte batch header),
then the four RPCs driven live against an in-process MiniKafkaBroker —
the client and broker share nothing but bytes. Un-gates the reference's
Kafka actors (etl/source/KafkaReader.scala:9-18,
etl/common/KafkaWriteActor.scala:33-70, etl/source/KafkaStreamReader.scala).
"""

from __future__ import annotations

import struct

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sources.kwire import (
    KafkaWireClient,
    MiniKafkaBroker,
    crc32c,
    decode_record_batches,
    encode_record_batch,
    read_topic,
    read_varint,
    write_varint,
)


@pytest.fixture()
def broker():
    srv = MiniKafkaBroker(num_partitions=2)
    yield srv
    srv.shutdown()


def _jctx(spark):
    return JobContext(PipelineContext(), spark)


# ---------------------------------------------------------------------------
# byte format vs the public spec
# ---------------------------------------------------------------------------


def test_crc32c_published_vectors():
    # RFC 3720 (iSCSI) appendix B.4 test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"") == 0


def test_varint_zigzag_spec_examples_and_roundtrip():
    import io

    # protobuf/kafka zigzag: 0→0, -1→1, 1→2, -2→3
    assert write_varint(0) == b"\x00"
    assert write_varint(-1) == b"\x01"
    assert write_varint(1) == b"\x02"
    assert write_varint(-2) == b"\x03"
    assert write_varint(300) == b"\xd8\x04"  # zigzag(300)=600=0b1001011000
    for n in (0, 1, -1, 127, -128, 300, -301, 2**31, -(2**31), 2**62):
        assert read_varint(io.BytesIO(write_varint(n))) == n


def test_record_batch_layout_and_crc_region():
    recs = [{"key": b"k", "value": b"v", "timestamp": 1_000}]
    raw = encode_record_batch(5, recs)
    # header: baseOffset(8) batchLength(4) leaderEpoch(4) magic(1) crc(4)...
    assert struct.unpack(">q", raw[0:8])[0] == 5
    batch_len = struct.unpack(">i", raw[8:12])[0]
    assert len(raw) == 12 + batch_len
    assert raw[16] == 2  # magic v2
    crc = struct.unpack(">I", raw[17:21])[0]
    assert crc == crc32c(raw[21:])  # crc covers attributes..end (spec)


def test_record_batch_roundtrip_headers_nulls_and_corruption():
    recs = [
        {"key": b"k1", "value": b"v1", "timestamp": 1000,
         "headers": [("h1", b"x"), ("h2", None)]},
        {"key": None, "value": None, "timestamp": 1500},
    ]
    raw = encode_record_batch(7, recs)
    back = decode_record_batches(raw + encode_record_batch(9, recs[:1]))
    assert [(r["offset"], r["key"], r["value"]) for r in back] == [
        (7, b"k1", b"v1"), (8, None, None), (9, b"k1", b"v1")]
    assert back[0]["headers"] == [("h1", b"x"), ("h2", None)]
    assert back[0]["timestamp"] == 1000 and back[1]["timestamp"] == 1500
    bad = bytearray(raw)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_record_batches(bytes(bad))


# ---------------------------------------------------------------------------
# live broker RPCs (no Spark)
# ---------------------------------------------------------------------------


def test_wire_rpcs_against_live_broker(broker):
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        assert c.metadata(["t"]) == {"t": [0, 1]}
        base = c.produce("t", 0, [
            {"key": b"a", "value": b"1", "timestamp": 100},
            {"key": b"b", "value": b"2", "timestamp": 200},
        ])
        assert base == 0
        assert c.produce("t", 0, [{"key": b"c", "value": b"3", "timestamp": 300}]) == 2
        assert c.list_offsets("t", 0, -2) == 0  # earliest
        assert c.list_offsets("t", 0, -1) == 3  # latest
        recs, hw = c.fetch("t", 0, 1)
        assert hw == 3
        assert [(r["offset"], r["value"]) for r in recs] == [(1, b"2"), (2, b"3")]
        empty, hw2 = c.fetch("t", 1, 0)
        assert empty == [] and hw2 == 0
    finally:
        c.close()


def test_fetch_respects_max_bytes_pagination(broker):
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        c.produce("big", 0, [
            {"key": None, "value": bytes(1000), "timestamp": i} for i in range(50)
        ])
        recs, _ = c.fetch("big", 0, 0, max_bytes=5_000)
        assert 0 < len(recs) < 50  # bounded page, not everything
        # the batch-read loop pages through the rest
        got, off = [], 0
        while off < 50:
            page, _ = c.fetch("big", 0, off, max_bytes=5_000)
            if not page:
                break
            got.extend(page)
            off = page[-1]["offset"] + 1
        assert [r["offset"] for r in got] == list(range(50))
    finally:
        c.close()


# ---------------------------------------------------------------------------
# Spark actors over the wire
# ---------------------------------------------------------------------------


def test_writer_then_reader_typed_roundtrip(spark, broker):
    from spark_etl_framework_spark.sinks.connectors import KafkaWriter
    from spark_etl_framework_spark.sources.connectors import KafkaReader

    bootstrap = f"127.0.0.1:{broker.port}"
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(40)],
        "id bigint, name string, score double",
    )
    df.createOrReplaceTempView("kr_in")
    KafkaWriter(
        bootstrapServers=bootstrap, topic="people", keyField="id", view="kr_in"
    ).run(_jctx(spark), spark)

    # rows really spread across BOTH broker partitions (scale unit)
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        n0 = c.list_offsets("people", 0, -1)
        n1 = c.list_offsets("people", 1, -1)
    finally:
        c.close()
    assert n0 + n1 == 40 and n0 > 0 and n1 > 0

    out = KafkaReader(
        bootstrapServers=bootstrap,
        topic="people",
        valueSchema="id bigint, name string, score double",
    ).run(_jctx(spark), spark)
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {i: (f"n{i}", i * 1.5) for i in range(40)}
    # kafka metadata columns survive with the jar's exact names
    meta_cols = {c for c in out.columns if c.startswith("__kafka_")}
    assert {"__kafka_topic", "__kafka_partition", "__kafka_offset"} <= meta_cols


def test_read_topic_one_task_per_partition(spark, broker):
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        for p in (0, 1):
            c.produce("par", p, [
                {"key": None, "value": str(i).encode(), "timestamp": i}
                for i in range(10)
            ])
    finally:
        c.close()
    df = read_topic(spark, f"127.0.0.1:{broker.port}", "par")
    assert df.rdd.getNumPartitions() == 2  # one task per Kafka partition
    assert df.count() == 20
    per = {r["partition"]: r["n"] for r in
           df.groupBy("partition").agg({"*": "count"})
           .withColumnRenamed("count(1)", "n").collect()}
    assert per == {0: 10, 1: 10}


def test_stream_reader_restart_no_duplicates(spark, broker, tmp_path):
    from spark_etl_framework_spark.streaming.readers import KafkaStreamReader

    bootstrap = f"127.0.0.1:{broker.port}"
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        c.produce("evts", 0, [
            {"key": str(i).encode(), "value": b"x", "timestamp": i} for i in range(8)
        ])
    finally:
        c.close()

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = KafkaStreamReader(bootstrapServers=bootstrap, topic="evts").run(
            _jctx(spark), spark
        )
        q = (
            sdf.selectExpr("cast(key as string) as k", "__kafka_offset")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert spark.read.parquet(out_dir).count() == 8
    # more records arrive; a RESTARTED query resumes from the checkpoint
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        c.produce("evts", 1, [
            {"key": str(i).encode(), "value": b"y", "timestamp": i}
            for i in range(8, 12)
        ])
    finally:
        c.close()
    run_once()
    got = spark.read.parquet(out_dir)
    assert got.count() == 12  # 8 + 4, no replays
    assert got.select("k").distinct().count() == 12


def test_stream_writer_relays_topic_to_topic(spark, broker):
    from spark_etl_framework_spark.streaming.readers import KafkaStreamReader
    from spark_etl_framework_spark.streaming.writers import KafkaStreamWriter

    bootstrap = f"127.0.0.1:{broker.port}"
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        c.produce("src", 0, [
            {"key": str(i).encode(), "value": str(i * i).encode(), "timestamp": i}
            for i in range(6)
        ])
    finally:
        c.close()
    sdf = KafkaStreamReader(bootstrapServers=bootstrap, topic="src").run(
        _jctx(spark), spark
    )
    sdf.selectExpr(
        "cast(key as string) as key", "cast(value as string) as value"
    ).createOrReplaceTempView("kafka_relay_in")
    KafkaStreamWriter(
        bootstrapServers=bootstrap,
        topic="dst",
        view="kafka_relay_in",
        trigger_mode="once",
        test_waittimeMS=30_000,
    ).run(_jctx(spark), spark)
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        total = sum(c.list_offsets("dst", p, -1) for p in (0, 1))
        vals = set()
        for p in (0, 1):
            recs, _ = c.fetch("dst", p, 0)
            vals |= {r["value"] for r in recs}
    finally:
        c.close()
    assert total == 6
    assert vals == {str(i * i).encode() for i in range(6)}


# ---------------------------------------------------------------------------
# compressed batches (round 8): gzip/snappy/lz4 decode, gzip produce
# ---------------------------------------------------------------------------


def _recs(n=5):
    return [
        {"key": f"k{i}".encode(), "value": f"v{i}".encode(),
         "timestamp": 1_700_000_000_000 + i}
        for i in range(n)
    ]


def test_gzip_batch_roundtrip_and_crc():
    """attributes codec bits = 1: the records section compresses, the
    header stays plain, the CRC covers the COMPRESSED bytes — flipping a
    compressed byte must fail loudly before any inflate."""
    from spark_etl_framework_spark.sources.kcodecs import GZIP

    batch = encode_record_batch(40, _recs(), compression=GZIP)
    # attributes (big-endian i16) start at offset 21 after
    # offset(8)+len(4)+epoch(4)+magic(1)+crc(4); codec bits in the low byte
    assert batch[22] & 0x07 == 1
    out = decode_record_batches(batch)
    assert [r["value"] for r in out] == [f"v{i}".encode() for i in range(5)]
    assert [r["offset"] for r in out] == list(range(40, 45))
    corrupted = bytearray(batch)
    corrupted[-3] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batches(bytes(corrupted))


def test_snappy_block_and_xerial_frame_decode():
    """Hand-built raw snappy block per format_description.txt: a literal
    then an OVERLAPPING copy (the RLE trick — byte-at-a-time), plus the
    xerial/snappy-java stream framing kafka's java producer emits."""
    from spark_etl_framework_spark.sources.kcodecs import (
        SNAPPY,
        decompress,
        snappy_decompress,
    )

    # "abcabcabcabc": varint(12), literal(3)="abc", copy len=9 offset=3
    block = bytes([12, (3 - 1) << 2]) + b"abc" + bytes([((9 - 4) << 2) | 1, 3])
    assert snappy_decompress(block) == b"abcabcabcabc"
    framed = (
        b"\x82SNAPPY\x00" + struct.pack(">ii", 1, 1)
        + struct.pack(">i", len(block)) + block
    )
    assert snappy_decompress(framed) == b"abcabcabcabc"

    # a compressed record batch built by hand around the snappy body:
    recs_plain = encode_record_batch(0, _recs(3))
    records_section = recs_plain[61:]  # after the 61-byte v2 header
    n_out = len(records_section)
    lit = bytearray()
    # emit as one big literal (length >= 60 uses the 1-byte extension)
    if n_out - 1 >= 60:
        lit += bytes([(60 << 2), n_out - 1])
    else:
        lit += bytes([(n_out - 1) << 2])
    snappy_body = bytes([n_out]) + bytes(lit) + records_section
    assert decompress(SNAPPY, snappy_body) == records_section


def test_compressed_batch_snappy_and_lz4_e2e():
    """Splice hand-compressed records sections into real v2 batches (CRC
    recomputed) and decode them through decode_record_batches — the path
    a foreign snappy/lz4 producer exercises."""
    from spark_etl_framework_spark.sources.kcodecs import LZ4, SNAPPY

    plain = encode_record_batch(7, _recs(4))
    header, records_section = plain[:61], plain[61:]

    def rebuild(codec: int, compressed: bytes) -> bytes:
        # header layout: offset(8) len(4) epoch(4) magic(1) crc(4) attrs(2)...
        crc_region = bytearray(header[21:]) + compressed
        struct.pack_into(">h", crc_region, 0, codec)  # attributes
        crc = crc32c(bytes(crc_region))
        out = bytearray()
        out += struct.pack(">q", 7)
        out += struct.pack(">i", 4 + 1 + 4 + len(crc_region))
        out += header[12:16]  # partitionLeaderEpoch
        out += b"\x02"  # magic
        out += struct.pack(">I", crc)
        out += crc_region
        return bytes(out)

    # snappy: single literal run (tag 60 ⇒ 1 extra length byte, 61 ⇒ 2)
    n = len(records_section)
    assert n < 2**16
    if n - 1 > 255:
        lit = bytes([61 << 2, (n - 1) & 0xFF, (n - 1) >> 8])
    else:
        lit = bytes([60 << 2, n - 1])
    varlen = bytearray()
    m = n
    while True:
        b = m & 0x7F
        m >>= 7
        if m:
            varlen.append(b | 0x80)
        else:
            varlen.append(b)
            break
    snappy_body = bytes(varlen) + lit + records_section
    out = decode_record_batches(rebuild(SNAPPY, snappy_body))
    assert [r["value"] for r in out] == [f"v{i}".encode() for i in range(4)]

    # lz4 frame: one stored (uncompressed-bit) block + EndMark
    frame = struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
    frame += struct.pack("<I", 0x80000000 | n) + records_section
    frame += struct.pack("<I", 0)
    out = decode_record_batches(rebuild(LZ4, frame))
    assert [r["key"] for r in out] == [f"k{i}".encode() for i in range(4)]


def test_lz4_block_match_copy_decode():
    """A real compressed LZ4 block (token nibbles, 2-byte LE offset,
    overlapping match) inside a frame."""
    from spark_etl_framework_spark.sources.kcodecs import lz4_decompress

    # literals "hello " + match(offset=6, len=12) + last-seq literals "!"
    block = bytes([0x68]) + b"hello " + struct.pack("<H", 6) + bytes([0x10]) + b"!"
    frame = (
        struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
        + struct.pack("<I", len(block)) + block + struct.pack("<I", 0)
    )
    assert lz4_decompress(frame) == b"hello hello hello !"


def test_zstd_decode_with_and_without_frame_content_size():
    """zstd decode (round 9, closing the r8 gate) must handle BOTH frame
    shapes real producers emit: one-shot libzstd frames that carry
    Frame_Content_Size, and kafka-java's streaming ZstdOutputStream
    frames that omit it (RFC 8878 §3.1.1 — FCS is optional). The
    streaming pyarrow path covers both; a one-shot size-demanding
    decompress would fail the second."""
    import pyarrow as pa

    from spark_etl_framework_spark.sources.kcodecs import ZSTD, decompress

    payload = b"zstd record payload " * 300
    # one-shot frame: FCS present (FHD bit 6 range flag set)
    oneshot = bytes(pa.Codec("zstd").compress(payload))
    assert oneshot[:4] == b"\x28\xb5\x2f\xfd"
    assert (oneshot[4] >> 6) != 0 or (oneshot[4] >> 5) & 1  # FCS signalled
    assert decompress(ZSTD, oneshot) == payload
    # streaming frame: no FCS (what kafka-java emits)
    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, "zstd") as w:
        w.write(payload)
    streamed = bytes(sink.getvalue())
    assert (streamed[4] >> 6) == 0 and not ((streamed[4] >> 5) & 1)
    assert decompress(ZSTD, streamed) == payload


def test_zstd_batch_roundtrip_and_crc():
    """attributes codec bits = 4: encode→decode a real v2 batch under
    zstd; the CRC covers the COMPRESSED bytes, so corruption fails before
    any decode."""
    from spark_etl_framework_spark.sources.kcodecs import ZSTD

    batch = encode_record_batch(40, _recs(), compression=ZSTD)
    assert batch[22] & 0x07 == 4
    out = decode_record_batches(batch)
    assert [r["value"] for r in out] == [f"v{i}".encode() for i in range(5)]
    assert [r["offset"] for r in out] == list(range(40, 45))
    corrupted = bytearray(batch)
    corrupted[-3] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batches(bytes(corrupted))


def test_produce_codec_outputs_decode_by_own_decoders():
    """Round-9 produce-side codecs emit formats the INDEPENDENT decoders
    (and real kafka consumers) accept: snappy produce wraps raw blocks in
    xerial framing — decoded by the hand-written snappy path, NOT
    pyarrow — and lz4 produce emits a standard LZ4 frame decoded by the
    hand-written frame walker. Multi-chunk xerial framing is exercised
    by a >32 KiB payload (one chunk per 32 KiB, the xerial default)."""
    from spark_etl_framework_spark.sources import kcodecs as kc

    payload = (b"abcdefgh" * 8192) + b"tail"  # 64 KiB + 4 → 3 xerial chunks
    sn = kc.compress(kc.SNAPPY, payload)
    assert sn.startswith(b"\x82SNAPPY\x00")
    assert kc.snappy_decompress(sn) == payload
    lz = kc.compress(kc.LZ4, payload)
    assert struct.unpack_from("<I", lz, 0)[0] == 0x184D2204
    assert kc.lz4_decompress(lz) == payload


def test_gzip_produce_through_live_broker(broker):
    """Produce gzip batches over the wire; the broker (which decodes
    every produce with CRC verification) must store and re-serve the
    records exactly."""
    from spark_etl_framework_spark.sources.kcodecs import GZIP

    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        base = c.produce("gz_topic", 0, _recs(50), compression=GZIP)
        assert base == 0
        got, hw = c.fetch("gz_topic", 0, 0)
        assert hw == 50
        assert [r["value"] for r in got] == [f"v{i}".encode() for i in range(50)]
    finally:
        c.close()


def test_snappy_and_lz4_extension_paths():
    """Decoder paths the wire roundtrips don't reach: snappy tag-61
    two-byte literal extension and copy kinds 2/3; LZ4 literal/match
    length extensions and the content-size + content-checksum frame
    flags (parsed past, not verified)."""
    from spark_etl_framework_spark.sources import kcodecs as kc

    big = bytes(range(256)) * 20
    lit = bytes([61 << 2, (len(big) - 1) & 0xFF, (len(big) - 1) >> 8]) + big
    varlen = bytearray()
    m = len(big)
    while True:
        b = m & 0x7F
        m >>= 7
        varlen.append(b | 0x80 if m else b)
        if not m:
            break
    assert kc.snappy_decompress(bytes(varlen) + lit) == big

    blk = (bytes([(60 - 1) << 2]) + b"x" * 60
           + bytes([((64 - 1) << 2) | 2]) + struct.pack("<H", 60))
    assert kc.snappy_decompress_block(bytes([124]) + blk) == b"x" * 124
    blk3 = (bytes([(60 - 1) << 2]) + b"y" * 60
            + bytes([((30 - 1) << 2) | 3]) + struct.pack("<I", 60))
    assert kc.snappy_decompress_block(bytes([90]) + blk3) == b"y" * 90

    lits = b"A" * 40
    block = bytes([0xFF, 25]) + lits + struct.pack("<H", 40) + bytes([200])
    frame = (struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
             + struct.pack("<I", len(block)) + block + struct.pack("<I", 0))
    assert kc.lz4_decompress(frame) == b"A" * (40 + 4 + 15 + 200)

    flg = 0x40 | 0x08 | 0x04
    frame2 = (struct.pack("<I", 0x184D2204) + bytes([flg, 0x40])
              + struct.pack("<q", 10) + b"\x00"
              + struct.pack("<I", 0x80000000 | 10) + b"0123456789"
              + struct.pack("<I", 0) + b"\x00\x00\x00\x00")
    assert kc.lz4_decompress(frame2) == b"0123456789"


def test_control_batches_are_skipped():
    """attribute bit 5 = CONTROL batch (transaction COMMIT/ABORT
    markers): a real broker running transactions interleaves these with
    data batches in every fetch, and a consumer must never surface them
    as rows (kafka protocol §record batch / control batches). Build a
    data + control + data concatenation (CRC-valid, attributes patched
    before the CRC recompute) and decode: only the data records come
    back."""
    d1 = encode_record_batch(0, _recs(2))
    d2 = encode_record_batch(5, _recs(3))

    # a control batch: same v2 layout, attributes bit 5 set; its record
    # is a COMMIT marker (key: version i16 + type i16), never data
    plain = encode_record_batch(2, [{
        "key": struct.pack(">hh", 0, 1), "value": b"",
        "timestamp": 1_700_000_000_000,
    }])
    header, records_section = plain[:61], plain[61:]
    crc_region = bytearray(header[21:]) + records_section
    struct.pack_into(">h", crc_region, 0, 0x20)  # attributes: control
    ctl = bytearray()
    ctl += struct.pack(">q", 2)
    ctl += struct.pack(">i", 4 + 1 + 4 + len(crc_region))
    ctl += header[12:16]
    ctl += b"\x02"
    ctl += struct.pack(">I", crc32c(bytes(crc_region)))
    ctl += crc_region

    out = decode_record_batches(d1 + bytes(ctl) + d2)
    assert [r["offset"] for r in out] == [0, 1, 5, 6, 7]
    assert all(r["value"].startswith(b"v") for r in out)


def test_stream_writer_zstd_compression(spark, broker):
    """The stream sink's compressionType flows into the wire produce:
    zstd batches land on the broker (which CRC-verifies and decodes
    every produce), and a reader round-trips them exactly."""
    from spark_etl_framework_spark.streaming.readers import KafkaStreamReader
    from spark_etl_framework_spark.streaming.writers import KafkaStreamWriter

    bootstrap = f"127.0.0.1:{broker.port}"
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        c.produce("zsrc", 0, [
            {"key": str(i).encode(), "value": f"payload-{i}".encode(),
             "timestamp": i}
            for i in range(10)
        ])
    finally:
        c.close()
    sdf = KafkaStreamReader(bootstrapServers=bootstrap, topic="zsrc").run(
        _jctx(spark), spark
    )
    sdf.selectExpr(
        "cast(key as string) as key", "cast(value as string) as value"
    ).createOrReplaceTempView("kafka_zstd_relay")
    KafkaStreamWriter(
        bootstrapServers=bootstrap,
        topic="zdst",
        view="kafka_zstd_relay",
        compressionType="zstd",
        trigger_mode="once",
        test_waittimeMS=30_000,
    ).run(_jctx(spark), spark)
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        vals = set()
        for p in (0, 1):
            recs, _ = c.fetch("zdst", p, 0)
            vals |= {r["value"] for r in recs}
    finally:
        c.close()
    assert vals == {f"payload-{i}".encode() for i in range(10)}
    with pytest.raises(ValueError, match="unknown compressionType"):
        KafkaStreamWriter(
            bootstrapServers=bootstrap, topic="x", view="kafka_zstd_relay",
            compressionType="brotli",
        ).run(_jctx(spark), spark)
