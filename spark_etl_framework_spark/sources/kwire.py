"""Kafka wire protocol in pure Python — the RecordBatch v2 on-disk/on-wire
format plus the Metadata / Produce / Fetch / ListOffsets RPCs.

The reference reaches Kafka through spark-sql-kafka
(etl/source/KafkaReader.scala:9-18, etl/common/KafkaWriteActor.scala:33-70,
etl/source/KafkaStreamReader.scala); this sandbox ships no kafka jar and
no broker. The protocol itself is a PUBLIC specification
(kafka.apache.org/protocol): length-prefixed frames, big-endian
primitives, and — since message format v2 — record batches whose body is
zigzag-varint records guarded by a CRC-32C. This module implements that
format directly, byte-for-byte:

- :func:`crc32c` — Castagnoli CRC (table-driven), validated against the
  published iSCSI test vectors in tests.
- :func:`encode_record_batch` / :func:`decode_record_batches` — magic=2
  batches: 61-byte header (baseOffset, batchLength, leaderEpoch, magic,
  crc, attributes, lastOffsetDelta, base/maxTimestamp, producer ids,
  recordCount) + varint-encoded records (timestampDelta, offsetDelta,
  key, value, headers). The crc covers attributes→end, exactly as the
  spec says — a flipped bit anywhere fails the decode loudly.
- :class:`KafkaWireClient` — Metadata v1, Produce v3 (RecordBatch v2
  payload), Fetch v4, ListOffsets v1, over one blocking socket with
  correlation-id matching. These are the lowest non-flexible versions
  that carry v2 batches — no tagged-field/compact encoding needed.
- :class:`MiniKafkaBroker` — an in-process broker for live e2e: real
  sockets, real frames, auto-created multi-partition topics, an
  append-only in-memory log per partition. The client and broker share
  nothing but the bytes.
- :func:`read_topic` / :func:`write_topic` — the Spark integration:
  driver fetches partition metadata + earliest/latest offsets, executors
  fetch their OWN partition slices over their own connections
  (``mapInPandas``, one task per Kafka partition — the same
  partition→task mapping spark-sql-kafka uses, which is the connector's
  entire scale story). Columns mirror spark-kafka: key/value binary,
  topic, partition, offset, timestamp, timestampType.
- :class:`KafkaStreamSourceReader` — micro-batch streaming source whose
  offsets are per-partition next-fetch positions; each batch is the
  (start, end] slice per partition, one task per partition.

100 TB note: partition count is the parallelism unit; offsets/metadata
are driver-side O(partitions) — identical to the real connector.
"""

from __future__ import annotations

import io
import socket
import struct
import threading
import time

# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli) — reflected polynomial 0x82F63B78, table-driven
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_varint(n: int) -> bytes:
    """Signed zigzag varint (the record-body integer encoding)."""
    u = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: io.BytesIO) -> int:
    u = shift = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        u |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return _zigzag_decode(u)
        shift += 7


class _Writer:
    def __init__(self):
        self.b = bytearray()

    def i8(self, v):
        self.b += struct.pack(">b", v)
        return self

    def i16(self, v):
        self.b += struct.pack(">h", v)
        return self

    def i32(self, v):
        self.b += struct.pack(">i", v)
        return self

    def i64(self, v):
        self.b += struct.pack(">q", v)
        return self

    def u32(self, v):
        self.b += struct.pack(">I", v)
        return self

    def string(self, s: str | None):
        if s is None:
            return self.i16(-1)
        raw = s.encode("utf-8")
        self.i16(len(raw))
        self.b += raw
        return self

    def bytes_(self, raw: bytes | None):
        if raw is None:
            return self.i32(-1)
        self.i32(len(raw))
        self.b += raw
        return self

    def raw(self, raw: bytes):
        self.b += raw
        return self


class _Reader:
    def __init__(self, data: bytes):
        self.buf = io.BytesIO(data)

    def _take(self, n):
        raw = self.buf.read(n)
        if len(raw) != n:
            raise EOFError("truncated frame")
        return raw

    def i8(self):
        return struct.unpack(">b", self._take(1))[0]

    def i16(self):
        return struct.unpack(">h", self._take(2))[0]

    def i32(self):
        return struct.unpack(">i", self._take(4))[0]

    def i64(self):
        return struct.unpack(">q", self._take(8))[0]

    def u32(self):
        return struct.unpack(">I", self._take(4))[0]

    def string(self):
        n = self.i16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def bytes_(self):
        n = self.i32()
        return None if n < 0 else self._take(n)


# ---------------------------------------------------------------------------
# RecordBatch v2 (magic = 2)
# ---------------------------------------------------------------------------


def encode_record_batch(
    base_offset: int,
    records: list[dict],
    base_timestamp: int | None = None,
    compression: int = 0,
) -> bytes:
    """``records``: dicts with key: bytes|None, value: bytes|None,
    timestamp: int (epoch-ms), headers: list[(str, bytes)].
    ``compression``: attribute codec bits (kcodecs.GZIP supported
    produce-side; the records section compresses, the header stays
    plain, exactly per the spec)."""
    if not records:
        raise ValueError("empty record batch")
    base_ts = base_timestamp if base_timestamp is not None else records[0]["timestamp"]
    max_ts = max(r["timestamp"] for r in records)

    body = bytearray()
    for i, r in enumerate(records):
        rec = bytearray()
        rec += b"\x00"  # record attributes
        rec += write_varint(r["timestamp"] - base_ts)
        rec += write_varint(i)  # offsetDelta
        key = r.get("key")
        if key is None:
            rec += write_varint(-1)
        else:
            rec += write_varint(len(key)) + key
        value = r.get("value")
        if value is None:
            rec += write_varint(-1)
        else:
            rec += write_varint(len(value)) + value
        headers = r.get("headers") or []
        rec += write_varint(len(headers))
        for hk, hv in headers:
            hkb = hk.encode("utf-8")
            rec += write_varint(len(hkb)) + hkb
            if hv is None:
                rec += write_varint(-1)
            else:
                rec += write_varint(len(hv)) + hv
        body += write_varint(len(rec)) + rec

    if compression:
        from .kcodecs import compress

        body = bytearray(compress(compression, bytes(body)))

    # crc covers attributes (int16) .. records end
    crcable = _Writer()
    crcable.i16(compression & 0x07)  # attributes: codec bits, CREATE_TIME
    crcable.i32(len(records) - 1)  # lastOffsetDelta
    crcable.i64(base_ts).i64(max_ts)
    crcable.i64(-1).i16(-1).i32(-1)  # producerId/Epoch, baseSequence
    crcable.i32(len(records))
    crcable.raw(bytes(body))
    crc = crc32c(bytes(crcable.b))

    after_length = _Writer()
    after_length.i32(0)  # partitionLeaderEpoch
    after_length.i8(2)  # magic
    after_length.u32(crc)
    after_length.raw(bytes(crcable.b))

    out = _Writer()
    out.i64(base_offset)
    out.i32(len(after_length.b))  # batchLength
    out.raw(bytes(after_length.b))
    return bytes(out.b)


def decode_record_batches(data: bytes) -> list[dict]:
    """Decode a concatenation of v2 batches into flat records:
    dicts with offset, timestamp, key, value, headers. CRC verified."""
    out = []
    r = _Reader(data)
    total = len(data)
    while r.buf.tell() + 12 <= total:
        base_offset = r.i64()
        batch_len = r.i32()
        if r.buf.tell() + batch_len > total:
            break  # partial trailing batch (fetch may truncate) — spec-legal
        body = r._take(batch_len)
        br = _Reader(body)
        br.i32()  # partitionLeaderEpoch
        magic = br.i8()
        if magic != 2:
            raise ValueError(f"unsupported message format magic={magic}")
        crc = br.u32()
        crc_region = body[br.buf.tell():]
        actual = crc32c(crc_region)
        if actual != crc:
            raise ValueError(f"record batch CRC mismatch: {actual:#x} != {crc:#x}")
        attributes = br.i16()
        br.i32()  # lastOffsetDelta
        base_ts = br.i64()
        br.i64()  # maxTimestamp
        br.i64()  # producerId
        br.i16()  # producerEpoch
        br.i32()  # baseSequence
        n = br.i32()
        if attributes & 0x20:
            # CONTROL batch (attribute bit 5): transaction COMMIT/ABORT
            # markers a transactional producer writes into the log.
            # Consumers never surface them as data (kafka.apache.org/
            # protocol §control batches) — a real broker running
            # transactions sends these inline with ordinary fetches, so
            # emitting them would hand marker bytes to decode_kafka as
            # if they were rows.
            continue
        codec = attributes & 0x07
        if codec:
            # the records section (everything after recordCount) is the
            # compressed region per the spec — inflate, then parse as usual
            from .kcodecs import decompress

            br = _Reader(decompress(codec, body[br.buf.tell():]))
        for _ in range(n):
            rec_len = read_varint(br.buf)
            rec = _Reader(br._take(rec_len))
            rec.i8()  # attributes
            ts_delta = read_varint(rec.buf)
            off_delta = read_varint(rec.buf)
            klen = read_varint(rec.buf)
            key = None if klen < 0 else rec._take(klen)
            vlen = read_varint(rec.buf)
            value = None if vlen < 0 else rec._take(vlen)
            hn = read_varint(rec.buf)
            headers = []
            for _h in range(hn):
                hklen = read_varint(rec.buf)
                hk = rec._take(hklen).decode("utf-8")
                hvlen = read_varint(rec.buf)
                hv = None if hvlen < 0 else rec._take(hvlen)
                headers.append((hk, hv))
            out.append(
                {
                    "offset": base_offset + off_delta,
                    "timestamp": base_ts + ts_delta,
                    "key": key,
                    "value": value,
                    "headers": headers,
                }
            )
    return out


# ---------------------------------------------------------------------------
# wire client
# ---------------------------------------------------------------------------

_API_PRODUCE, _API_FETCH, _API_LIST_OFFSETS, _API_METADATA = 0, 1, 2, 3


class KafkaWireError(RuntimeError):
    pass


class KafkaWireClient:
    """One blocking connection speaking framed Kafka RPCs."""

    def __init__(self, host: str, port: int, client_id: str = "spark-etl-framework"):
        self._sock = socket.create_connection((host, port), timeout=30)
        self._client_id = client_id
        self._corr = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def _roundtrip(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        self._corr += 1
        head = _Writer()
        head.i16(api_key).i16(api_version).i32(self._corr).string(self._client_id)
        frame = bytes(head.b) + body
        self._sock.sendall(struct.pack(">i", len(frame)) + frame)
        raw = b""
        while len(raw) < 4:
            chunk = self._sock.recv(4 - len(raw))
            if not chunk:
                raise KafkaWireError("connection closed mid-response")
            raw += chunk
        (size,) = struct.unpack(">i", raw)
        payload = b""
        while len(payload) < size:
            chunk = self._sock.recv(size - len(payload))
            if not chunk:
                raise KafkaWireError("connection closed mid-response")
            payload += chunk
        r = _Reader(payload)
        corr = r.i32()
        if corr != self._corr:
            raise KafkaWireError(f"correlation id mismatch {corr} != {self._corr}")
        return r

    def metadata(self, topics: list[str] | None = None) -> dict:
        """Metadata v1 → {topic: [partition ids]} (single-broker world)."""
        w = _Writer()
        if topics is None:
            w.i32(-1)
        else:
            w.i32(len(topics))
            for t in topics:
                w.string(t)
        r = self._roundtrip(_API_METADATA, 1, bytes(w.b))
        n_brokers = r.i32()
        for _ in range(n_brokers):
            r.i32()
            r.string()
            r.i32()
            r.string()  # node, host, port, rack
        r.i32()  # controller id
        out: dict[str, list[int]] = {}
        n_topics = r.i32()
        for _ in range(n_topics):
            err = r.i16()
            name = r.string()
            r.i8()  # is_internal
            parts = []
            n_parts = r.i32()
            for _p in range(n_parts):
                perr = r.i16()
                idx = r.i32()
                r.i32()  # leader
                for _a in range(r.i32()):
                    r.i32()  # replicas
                for _a in range(r.i32()):
                    r.i32()  # isr
                if perr == 0:
                    parts.append(idx)
            if err == 0:
                out[name] = sorted(parts)
        return out

    def produce(self, topic: str, partition: int, records: list[dict],
                compression: int = 0) -> int:
        """Produce v3 (acks=-1) → base offset assigned by the broker."""
        batch = encode_record_batch(0, records, compression=compression)
        w = _Writer()
        w.string(None)  # transactional_id
        w.i16(-1).i32(30_000)  # acks, timeout
        w.i32(1).string(topic)
        w.i32(1).i32(partition)
        w.bytes_(batch)
        r = self._roundtrip(_API_PRODUCE, 3, bytes(w.b))
        n_topics = r.i32()
        base = -1
        for _ in range(n_topics):
            r.string()
            for _p in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                base = r.i64()
                r.i64()  # log_append_time
                if err != 0:
                    raise KafkaWireError(f"produce error code {err}")
        r.i32()  # throttle
        return base

    def list_offsets(self, topic: str, partition: int, timestamp: int) -> int:
        """ListOffsets v1: timestamp -1 = latest (log end), -2 = earliest."""
        w = _Writer()
        w.i32(-1)  # replica_id
        w.i32(1).string(topic)
        w.i32(1).i32(partition).i64(timestamp)
        r = self._roundtrip(_API_LIST_OFFSETS, 1, bytes(w.b))
        offset = -1
        for _ in range(r.i32()):
            r.string()
            for _p in range(r.i32()):
                r.i32()
                err = r.i16()
                r.i64()  # timestamp
                offset = r.i64()
                if err != 0:
                    raise KafkaWireError(f"list_offsets error code {err}")
        return offset

    def fetch(
        self, topic: str, partition: int, offset: int, max_bytes: int = 1 << 20
    ) -> tuple[list[dict], int]:
        """Fetch v4 → (records from ``offset``, high watermark)."""
        w = _Writer()
        w.i32(-1)  # replica_id
        w.i32(0)  # max_wait_ms — don't block, batch semantics
        w.i32(0)  # min_bytes
        w.i32(max_bytes)
        w.i8(0)  # isolation_level
        w.i32(1).string(topic)
        w.i32(1).i32(partition).i64(offset).i32(max_bytes)
        r = self._roundtrip(_API_FETCH, 4, bytes(w.b))
        r.i32()  # throttle
        records: list[dict] = []
        hw = -1
        for _ in range(r.i32()):
            r.string()
            for _p in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                hw = r.i64()
                r.i64()  # last_stable_offset
                for _a in range(r.i32()):  # aborted txns
                    r.i64()
                    r.i64()
                record_set = r.bytes_() or b""
                if err != 0:
                    raise KafkaWireError(f"fetch error code {err}")
                records.extend(
                    x for x in decode_record_batches(record_set) if x["offset"] >= offset
                )
        return records, hw


# ---------------------------------------------------------------------------
# in-process broker (live e2e without the service)
# ---------------------------------------------------------------------------


class MiniKafkaBroker:
    """Single-node broker: auto-created topics with ``num_partitions``
    partitions, append-only in-memory logs, the four RPCs the client
    speaks. Shares only BYTES with the client — every frame is parsed."""

    def __init__(self, num_partitions: int = 2):
        self._n = num_partitions
        self._logs: dict[tuple[str, int], list[dict]] = {}
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(32)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def shutdown(self) -> None:
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass

    # -- plumbing ----------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, conn: socket.socket) -> None:
        try:
            while True:
                head = b""
                while len(head) < 4:
                    chunk = conn.recv(4 - len(head))
                    if not chunk:
                        return
                    head += chunk
                (size,) = struct.unpack(">i", head)
                payload = b""
                while len(payload) < size:
                    chunk = conn.recv(size - len(payload))
                    if not chunk:
                        return
                    payload += chunk
                resp = self._dispatch(payload)
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _ensure(self, topic: str) -> None:
        with self._lock:
            for p in range(self._n):
                self._logs.setdefault((topic, p), [])

    def _dispatch(self, payload: bytes) -> bytes:
        r = _Reader(payload)
        api_key = r.i16()
        api_version = r.i16()
        corr = r.i32()
        r.string()  # client id
        w = _Writer()
        w.i32(corr)
        if api_key == _API_METADATA:
            self._metadata(r, w)
        elif api_key == _API_PRODUCE:
            self._produce(r, w)
        elif api_key == _API_LIST_OFFSETS:
            self._list_offsets(r, w)
        elif api_key == _API_FETCH:
            self._fetch(r, w)
        else:
            raise KafkaWireError(
                f"mini broker: unsupported api_key={api_key} v{api_version}"
            )
        return bytes(w.b)

    # -- RPCs --------------------------------------------------------------

    def _metadata(self, r: _Reader, w: _Writer) -> None:
        n = r.i32()
        topics = [r.string() for _ in range(n)] if n >= 0 else None
        if topics:
            for t in topics:
                self._ensure(t)
        with self._lock:
            names = (
                topics
                if topics is not None
                else sorted({t for t, _ in self._logs})
            )
        w.i32(1)  # brokers
        w.i32(0).string("127.0.0.1").i32(self.port).string(None)
        w.i32(0)  # controller id
        w.i32(len(names))
        for t in names:
            w.i16(0).string(t).i8(0)
            w.i32(self._n)
            for p in range(self._n):
                w.i16(0).i32(p).i32(0)
                w.i32(1).i32(0)  # replicas
                w.i32(1).i32(0)  # isr
    def _produce(self, r: _Reader, w: _Writer) -> None:
        r.string()  # transactional id
        r.i16()  # acks
        r.i32()  # timeout
        results = []
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                partition = r.i32()
                record_set = r.bytes_() or b""
                records = decode_record_batches(record_set)  # crc verified
                self._ensure(topic)
                with self._lock:
                    log = self._logs[(topic, partition)]
                    base = len(log)
                    for i, rec in enumerate(records):
                        rec["offset"] = base + i
                        log.append(rec)
                results.append((topic, partition, base))
        w.i32(len(results))
        for topic, partition, base in results:
            w.string(topic)
            w.i32(1).i32(partition).i16(0).i64(base).i64(-1)
        w.i32(0)  # throttle

    def _list_offsets(self, r: _Reader, w: _Writer) -> None:
        r.i32()  # replica id
        out = []
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                partition = r.i32()
                ts = r.i64()
                self._ensure(topic)
                with self._lock:
                    n = len(self._logs[(topic, partition)])
                out.append((topic, partition, 0 if ts == -2 else n))
        w.i32(len(out))
        for topic, partition, offset in out:
            w.string(topic)
            w.i32(1).i32(partition).i16(0).i64(-1).i64(offset)

    def _fetch(self, r: _Reader, w: _Writer) -> None:
        r.i32()  # replica
        r.i32()  # max wait
        r.i32()  # min bytes
        r.i32()  # max bytes
        r.i8()  # isolation
        out = []
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                partition = r.i32()
                offset = r.i64()
                part_max = r.i32()
                self._ensure(topic)
                with self._lock:
                    log = list(self._logs[(topic, partition)])
                hw = len(log)
                slice_ = log[offset:]
                size = 0
                bounded = []
                for rec in slice_:
                    size += len(rec.get("key") or b"") + len(rec.get("value") or b"") + 64
                    bounded.append(rec)
                    if size >= part_max:
                        break
                record_set = (
                    encode_record_batch(bounded[0]["offset"], bounded)
                    if bounded
                    else b""
                )
                out.append((topic, partition, hw, record_set))
        w.i32(0)  # throttle
        w.i32(len(out))
        for topic, partition, hw, record_set in out:
            w.string(topic)
            w.i32(1)
            w.i32(partition).i16(0).i64(hw).i64(hw)
            w.i32(0)  # aborted txns
            w.bytes_(record_set)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def _parse_bootstrap(bootstrap: str) -> tuple[str, int]:
    host, _, port = bootstrap.split(",")[0].partition(":")
    return host, int(port or "9092")


#: spark-sql-kafka's exact relation schema
_KAFKA_DDL = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def read_topic(spark, bootstrap: str, topic: str):
    """Batch-read a whole topic. Driver: Metadata + earliest/latest per
    partition. Executors: one task per Kafka partition, each fetching its
    own slice over its own connection — spark-sql-kafka's scale model."""
    import pandas as pd  # noqa: F401

    host, port = _parse_bootstrap(bootstrap)
    c = KafkaWireClient(host, port)
    try:
        parts = c.metadata([topic]).get(topic, [])
        spec = []
        for p in parts:
            lo = c.list_offsets(topic, p, -2)
            hi = c.list_offsets(topic, p, -1)
            if hi > lo:
                spec.append((topic, p, lo, hi))
    finally:
        c.close()

    from pyspark.sql import types as T

    schema = T.StructType.fromDDL(_KAFKA_DDL)
    if not spec:
        return spark.createDataFrame([], schema)
    sdf = spark.createDataFrame(
        spec, "topic string, partition int, lo long, hi long"
    ).repartition(len(spec))

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                client = KafkaWireClient(host, port)
                rows = []
                try:
                    off = row.lo
                    while off < row.hi:
                        recs, _hw = client.fetch(row.topic, row.partition, off)
                        if not recs:
                            break
                        for rec in recs:
                            if rec["offset"] >= row.hi:
                                break
                            rows.append(
                                (
                                    rec["key"],
                                    rec["value"],
                                    row.topic,
                                    row.partition,
                                    rec["offset"],
                                    pd.Timestamp(rec["timestamp"], unit="ms", tz="UTC"),
                                    0,
                                )
                            )
                        off = recs[-1]["offset"] + 1
                finally:
                    client.close()
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "key", "value", "topic", "partition", "offset",
                        "timestamp", "timestampType",
                    ],
                )

    return sdf.mapInPandas(fetch, schema)


def write_topic(df, bootstrap: str, topic: str, compression: int = 0) -> None:
    """Produce key/value(/headers) rows; each task produces its own rows
    to ``partition = hash(key) % n`` over its own connection, batched per
    partition — one Produce RPC per (task, partition). ``compression``:
    kcodecs.GZIP compresses each batch's records section (the common
    wire setting; the reader side also inflates snappy/lz4 batches from
    foreign producers)."""
    host, port = _parse_bootstrap(bootstrap)
    c = KafkaWireClient(host, port)
    try:
        n_parts = len(c.metadata([topic]).get(topic, [])) or 1
    finally:
        c.close()

    cols = df.columns
    has_headers = "headers" in cols

    def send(rows):
        client = KafkaWireClient(host, port)
        try:
            now = int(time.time() * 1000)
            per_part: dict[int, list[dict]] = {}
            for row in rows:
                key = row["key"]
                kb = key if isinstance(key, (bytes, bytearray)) else (
                    str(key).encode("utf-8") if key is not None else None
                )
                value = row["value"]
                vb = value if isinstance(value, (bytes, bytearray)) else (
                    str(value).encode("utf-8") if value is not None else None
                )
                p = (crc32c(kb) % n_parts) if kb is not None else 0
                rec = {"key": kb, "value": vb, "timestamp": now}
                if has_headers and row["headers"]:
                    rec["headers"] = [
                        (h["key"], h["value"]) for h in row["headers"]
                    ]
                per_part.setdefault(p, []).append(rec)
            for p, recs in per_part.items():
                client.produce(topic, p, recs, compression)
        finally:
            client.close()

    df.foreachPartition(send)


# ---------------------------------------------------------------------------
# streaming source
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _TopicSlice(InputPartition):
    def __init__(self, topic: str, partition: int, lo: int, hi: int):
        self.topic = topic
        self.partition = partition
        self.lo = lo
        self.hi = hi


class KafkaStreamSourceReader(DataSourceStreamReader):
    """Micro-batch source: offsets are per-partition next-fetch positions
    (exactly spark-sql-kafka's offset JSON), a batch is the (start, end]
    slice of each partition, one task per partition."""

    def __init__(self, options):
        bootstrap = options.get("kafka.bootstrap.servers") or options.get(
            "bootstrapservers"
        )
        topic = options.get("subscribe") or options.get("topic")
        if not bootstrap or not topic:
            raise ValueError("kafka stream source requires bootstrap servers + topic")
        self._host, self._port = _parse_bootstrap(bootstrap)
        self._topic = topic
        self._starting = (options.get("startingoffsets") or "earliest").lower()

    def _client(self) -> KafkaWireClient:
        return KafkaWireClient(self._host, self._port)

    def initialOffset(self):
        c = self._client()
        try:
            ts = -2 if self._starting == "earliest" else -1
            return {
                "offsets": {
                    str(p): c.list_offsets(self._topic, p, ts)
                    for p in c.metadata([self._topic]).get(self._topic, [])
                }
            }
        finally:
            c.close()

    def latestOffset(self):
        c = self._client()
        try:
            return {
                "offsets": {
                    str(p): c.list_offsets(self._topic, p, -1)
                    for p in c.metadata([self._topic]).get(self._topic, [])
                }
            }
        finally:
            c.close()

    def partitions(self, start, end):
        parts = []
        for p, hi in end["offsets"].items():
            lo = start["offsets"].get(p, 0)
            if hi > lo:
                parts.append(_TopicSlice(self._topic, int(p), lo, hi))
        return parts

    def read(self, partition):
        import datetime as dt

        client = self._client()
        try:
            off = partition.lo
            while off < partition.hi:
                recs, _hw = client.fetch(partition.topic, partition.partition, off)
                if not recs:
                    break
                for rec in recs:
                    if rec["offset"] >= partition.hi:
                        return
                    yield (
                        rec["key"],
                        rec["value"],
                        partition.topic,
                        partition.partition,
                        rec["offset"],
                        dt.datetime.fromtimestamp(
                            rec["timestamp"] / 1000.0, tz=dt.timezone.utc
                        ),
                        0,
                    )
                off = recs[-1]["offset"] + 1
        finally:
            client.close()

    def commit(self, end) -> None:
        return None


class KafkaWireDataSource(DataSource):
    """``spark.readStream.format("kafkawire")`` — options:
    kafka.bootstrap.servers, subscribe, startingOffsets earliest|latest.
    Relation schema identical to spark-sql-kafka."""

    @classmethod
    def name(cls) -> str:
        return "kafkawire"

    def schema(self) -> str:
        return _KAFKA_DDL

    def streamReader(self, schema) -> KafkaStreamSourceReader:
        return KafkaStreamSourceReader(self.options)
