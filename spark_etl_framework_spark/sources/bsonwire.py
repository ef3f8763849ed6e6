"""MongoDB wire protocol in pure Python — BSON plus OP_MSG.

The reference reaches Mongo through the mongo-spark connector
(etl/source/MongoReader.scala:12,20-34, etl/sink/MongoWriter.scala);
this sandbox ships neither the jar nor pymongo nor a mongod. Both
halves of the protocol are PUBLIC specifications: BSON (bsonspec.org —
little-endian sized documents of typed elements) and the MongoDB wire
protocol (OP_MSG, opcode 2013: a 16-byte header, flag bits, kind-0 body
section carrying one command document). This module implements them
directly:

- :func:`encode_bson` / :func:`decode_bson` — the element types a
  DataFrame needs: double, string, embedded document, array, binary,
  bool, UTC datetime (int64 ms), null, int32, int64. Sizes and
  terminators exactly per spec — a mis-sized document fails loudly.
- :class:`MongoWireClient` — ``insert``, ``find``/``getMore`` (cursor
  batching), ``delete``, ``drop``, ``count`` as OP_MSG commands over one
  blocking socket, requestID/responseTo matched.
- :class:`MiniMongoServer` — an in-process server for live e2e: real
  sockets, real OP_MSG frames, per-(db, collection) document stores,
  cursor state with getMore continuation, equality and
  ``$gte``/``$lt``/``$in`` filters. Client and server share only bytes.
- :func:`read_collection` / :func:`write_collection` — the Spark
  integration, mirroring mongo-spark's scale model: the driver samples
  ``_id`` range boundaries and each executor task ``find``s its OWN
  ``{_id: {$gte, $lt}}`` slice over its own connection (range
  partitioning — exactly the jar's default partitioner); writes go
  ``foreachPartition`` with batched inserts.

100 TB note: partition boundaries are driver-side O(tasks); all
document I/O is executor-side and slice-local.
"""

from __future__ import annotations

import datetime as _dt
import io
import socket
import struct
import threading


# ---------------------------------------------------------------------------
# BSON codec
# ---------------------------------------------------------------------------


def _enc_element(name: str, v) -> bytes:
    key = name.encode("utf-8") + b"\x00"
    if v is None:
        return b"\x0a" + key
    if isinstance(v, bool):  # before int — bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + key + struct.pack("<i", v)
        return b"\x12" + key + struct.pack("<q", v)
    if isinstance(v, float):
        return b"\x01" + key + struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8") + b"\x00"
        return b"\x02" + key + struct.pack("<i", len(raw)) + raw
    if isinstance(v, (bytes, bytearray)):
        return b"\x05" + key + struct.pack("<i", len(v)) + b"\x00" + bytes(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        ms = int(v.timestamp() * 1000)
        return b"\x09" + key + struct.pack("<q", ms)
    if isinstance(v, _dt.date):
        return _enc_element(name, v.isoformat())
    if isinstance(v, dict):
        return b"\x03" + key + encode_bson(v)
    if isinstance(v, (list, tuple)):
        doc = {str(i): x for i, x in enumerate(v)}
        return b"\x04" + key + encode_bson(doc)
    raise TypeError(f"BSON: unsupported python type {type(v).__name__}")


def encode_bson(doc: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _dec_cstring(buf: io.BytesIO) -> str:
    out = bytearray()
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("unterminated cstring")
        if b == b"\x00":
            return out.decode("utf-8")
        out += b


def _dec_value(t: int, buf: io.BytesIO):
    if t == 0x0A:
        return None
    if t == 0x08:
        return buf.read(1) == b"\x01"
    if t == 0x10:
        return struct.unpack("<i", buf.read(4))[0]
    if t == 0x12:
        return struct.unpack("<q", buf.read(8))[0]
    if t == 0x01:
        return struct.unpack("<d", buf.read(8))[0]
    if t == 0x02:
        (n,) = struct.unpack("<i", buf.read(4))
        raw = buf.read(n)
        return raw[:-1].decode("utf-8")
    if t == 0x05:
        (n,) = struct.unpack("<i", buf.read(4))
        buf.read(1)  # subtype
        return buf.read(n)
    if t == 0x09:
        (ms,) = struct.unpack("<q", buf.read(8))
        return _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc)
    if t == 0x03:
        return _dec_doc(buf)
    if t == 0x04:
        d = _dec_doc(buf)
        return [d[str(i)] for i in range(len(d))]
    raise ValueError(f"BSON: unsupported element type {t:#04x}")


def _dec_doc(buf: io.BytesIO) -> dict:
    start = buf.tell()
    (size,) = struct.unpack("<i", buf.read(4))
    out = {}
    while True:
        t = buf.read(1)
        if not t:
            raise EOFError("truncated document")
        if t == b"\x00":
            break
        name = _dec_cstring(buf)
        out[name] = _dec_value(t[0], buf)
    if buf.tell() - start != size:
        raise ValueError(
            f"BSON document size mismatch: header {size}, actual {buf.tell() - start}"
        )
    return out


def decode_bson(raw: bytes) -> dict:
    return _dec_doc(io.BytesIO(raw))


# ---------------------------------------------------------------------------
# OP_MSG framing
# ---------------------------------------------------------------------------

_OP_MSG = 2013


def _frame(request_id: int, response_to: int, command: dict) -> bytes:
    body = struct.pack("<I", 0) + b"\x00" + encode_bson(command)  # flags, kind 0
    total = 16 + len(body)
    return (
        struct.pack("<iiii", total, request_id, response_to, _OP_MSG) + body
    )


def _read_exact(sock: socket.socket, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise ConnectionError("mongo connection closed mid-frame")
        out += chunk
    return out


def _read_msg(sock: socket.socket) -> tuple[int, int, dict]:
    head = _read_exact(sock, 16)
    total, request_id, response_to, opcode = struct.unpack("<iiii", head)
    payload = _read_exact(sock, total - 16)
    if opcode != _OP_MSG:
        raise ValueError(f"unsupported opcode {opcode} (only OP_MSG spoken)")
    buf = io.BytesIO(payload)
    buf.read(4)  # flag bits
    kind = buf.read(1)[0]
    if kind != 0:
        raise ValueError(f"unsupported section kind {kind}")
    return request_id, response_to, _dec_doc(buf)


class MongoWireError(RuntimeError):
    pass


class MongoWireClient:
    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port), timeout=30)
        self._req = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def command(self, cmd: dict) -> dict:
        self._req += 1
        self._sock.sendall(_frame(self._req, 0, cmd))
        _rid, response_to, doc = _read_msg(self._sock)
        if response_to != self._req:
            raise MongoWireError(f"responseTo {response_to} != {self._req}")
        if doc.get("ok") != 1.0:
            raise MongoWireError(f"command failed: {doc}")
        return doc

    def insert_many(self, db: str, coll: str, docs: list[dict]) -> int:
        if not docs:
            return 0
        r = self.command({"insert": coll, "$db": db, "documents": list(docs)})
        return int(r.get("n", 0))

    def find(
        self,
        db: str,
        coll: str,
        filter_: dict | None = None,
        batch_size: int = 1000,
        projection: dict | None = None,
        sort: dict | None = None,
    ):
        cmd = {
            "find": coll,
            "$db": db,
            "filter": filter_ or {},
            "batchSize": batch_size,
        }
        if projection:
            cmd["projection"] = projection
        if sort:
            cmd["sort"] = sort
        r = self.command(cmd)
        cur = r["cursor"]
        yield from cur["firstBatch"]
        while cur["id"]:
            r = self.command(
                {"getMore": cur["id"], "collection": coll, "$db": db,
                 "batchSize": batch_size}
            )
            cur = r["cursor"]
            yield from cur["nextBatch"]

    def count(self, db: str, coll: str) -> int:
        return int(self.command({"count": coll, "$db": db})["n"])

    def delete_all(self, db: str, coll: str) -> int:
        r = self.command(
            {"delete": coll, "$db": db, "deletes": [{"q": {}, "limit": 0}]}
        )
        return int(r.get("n", 0))

    def drop(self, db: str, coll: str) -> None:
        self.command({"drop": coll, "$db": db})


# ---------------------------------------------------------------------------
# in-process server
# ---------------------------------------------------------------------------


def _matches(doc: dict, flt: dict) -> bool:
    for k, cond in flt.items():
        v = doc.get(k)
        if isinstance(cond, dict) and any(key.startswith("$") for key in cond):
            for op, arg in cond.items():
                if op == "$gte":
                    if v is None or v < arg:
                        return False
                elif op == "$lt":
                    if v is None or not v < arg:
                        return False
                elif op == "$in":
                    if v not in arg:
                        return False
                else:
                    raise MongoWireError(f"mini mongo: unsupported operator {op}")
        elif v != cond:
            return False
    return True


class MiniMongoServer:
    """Single-node OP_MSG server: insert/find/getMore/count/delete/drop
    over per-(db, collection) in-memory stores. Every frame is parsed
    from bytes — nothing is shared with the client but the socket."""

    def __init__(self):
        self._data: dict[tuple[str, str], list[dict]] = {}
        self._cursors: dict[int, list[dict]] = {}
        self._next_cursor = 1
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

    def collection(self, db: str, coll: str) -> list[dict]:
        with self._lock:
            return list(self._data.get((db, coll), []))

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
                try:
                    request_id, _resp_to, cmd = _read_msg(conn)
                except (ConnectionError, EOFError):
                    return
                reply = self._dispatch(cmd)
                conn.sendall(_frame(0, request_id, reply))
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _dispatch(self, cmd: dict) -> dict:
        op = next(iter(cmd))
        db = cmd.get("$db", "")
        if op == "insert":
            docs = cmd["documents"]
            with self._lock:
                self._data.setdefault((db, cmd["insert"]), []).extend(docs)
            return {"n": len(docs), "ok": 1.0}
        if op == "find":
            coll = cmd["find"]
            flt = cmd.get("filter") or {}
            batch = int(cmd.get("batchSize", 101))
            with self._lock:
                rows = [
                    d for d in self._data.get((db, coll), []) if _matches(d, flt)
                ]
            sort = cmd.get("sort")
            if sort:
                for k, direction in reversed(list(sort.items())):
                    rows.sort(key=lambda d: d.get(k), reverse=direction < 0)
            proj = cmd.get("projection")
            if proj:
                keep = {k for k, v in proj.items() if v}
                rows = [{k: d.get(k) for k in keep if k in d} for d in rows]
            first, rest = rows[:batch], rows[batch:]
            cursor_id = 0
            if rest:
                with self._lock:
                    cursor_id = self._next_cursor
                    self._next_cursor += 1
                    self._cursors[cursor_id] = rest
            ns = f"{db}.{coll}"
            return {
                "cursor": {"id": cursor_id, "ns": ns, "firstBatch": first},
                "ok": 1.0,
            }
        if op == "getMore":
            cid = cmd["getMore"]
            batch = int(cmd.get("batchSize", 101))
            with self._lock:
                rest = self._cursors.get(cid, [])
                out, remaining = rest[:batch], rest[batch:]
                if remaining:
                    self._cursors[cid] = remaining
                else:
                    self._cursors.pop(cid, None)
                    cid = 0
            ns = f"{db}.{cmd['collection']}"
            return {"cursor": {"id": cid, "ns": ns, "nextBatch": out}, "ok": 1.0}
        if op == "count":
            with self._lock:
                n = len(self._data.get((db, cmd["count"]), []))
            return {"n": n, "ok": 1.0}
        if op == "delete":
            coll = cmd["delete"]
            n = 0
            with self._lock:
                for spec in cmd.get("deletes", []):
                    flt = spec.get("q") or {}
                    rows = self._data.get((db, coll), [])
                    keep = [d for d in rows if not _matches(d, flt)]
                    n += len(rows) - len(keep)
                    self._data[(db, coll)] = keep
            return {"n": n, "ok": 1.0}
        if op == "drop":
            with self._lock:
                self._data.pop((db, cmd["drop"]), None)
            return {"ok": 1.0}
        return {"ok": 0.0, "errmsg": f"unsupported command {op}"}


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def read_collection(
    spark,
    host: str,
    port: int,
    database: str,
    collection: str,
    ddl: str | None = None,
    num_partitions: int | None = None,
):
    """Read a collection as a DataFrame with mongo-spark's scale model:
    the driver samples the sorted ``_id`` sequence into range boundaries
    and each executor task ``find``s its own ``{_id: {$gte, $lt}}``
    slice over its own connection. ``ddl`` types the columns (values
    cast from the decoded BSON); without it, columns come from the first
    document as strings."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    c = MongoWireClient(host, port)
    try:
        ids = sorted(
            d["_id"]
            for d in c.find(database, collection, projection={"_id": 1})
        )
        if ddl is None:
            first = next(iter(c.find(database, collection, batch_size=1)), None)
            if first is None:
                raise MongoWireError(
                    f"collection {database}.{collection} is empty and no "
                    "ddlSchemaString was given — cannot infer a schema"
                )
            schema = T.StructType(
                [T.StructField(k, T.StringType()) for k in sorted(first)]
            )
        else:
            schema = T.StructType.fromDDL(ddl)
    finally:
        c.close()
    names = [f.name for f in schema.fields]
    if not ids:
        return spark.createDataFrame([], schema)

    k = num_partitions or max(1, min(16, (len(ids) + 255) // 256))
    step = (len(ids) + k - 1) // k
    bounds = []
    for i in range(0, len(ids), step):
        lo = ids[i]
        hi_idx = i + step
        hi = ids[hi_idx] if hi_idx < len(ids) else None
        bounds.append((lo, hi))
    bdf = spark.createDataFrame(
        [(str(lo), str(hi) if hi is not None else None) for lo, hi in bounds],
        "lo string, hi string",
    ).repartition(len(bounds))
    id_is_int = ids and isinstance(ids[0], int)

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                lo = int(row.lo) if id_is_int else row.lo
                flt: dict = {"_id": {"$gte": lo}}
                if row.hi is not None:
                    flt["_id"]["$lt"] = int(row.hi) if id_is_int else row.hi
                client = MongoWireClient(host, port)
                try:
                    rows = [
                        [
                            None if d.get(n) is None else str(d.get(n))
                            for n in names
                        ]
                        for d in client.find(database, collection, flt)
                    ]
                finally:
                    client.close()
                yield pd.DataFrame(rows, columns=names)

    str_schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    raw = bdf.mapInPandas(fetch, str_schema)
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def write_collection(
    df,
    host: str,
    port: int,
    database: str,
    collection: str,
    mode: str = "append",
    id_column: str | None = None,
) -> None:
    """Write a DataFrame: ``overwrite`` drops the collection first
    (driver-side, one command); every task then inserts its own rows in
    500-document batches over its own connection. ``id_column`` becomes
    ``_id``."""
    if mode == "overwrite":
        c = MongoWireClient(host, port)
        try:
            c.drop(database, collection)
        finally:
            c.close()
    elif mode != "append":
        raise ValueError(f"write_collection: unsupported mode {mode!r}")
    cols = df.columns

    def send(rows):
        client = MongoWireClient(host, port)
        try:
            batch = []
            for row in rows:
                d = {c_: row[c_] for c_ in cols}
                if id_column and id_column in d:
                    d["_id"] = d.pop(id_column)
                batch.append(d)
                if len(batch) >= 500:
                    client.insert_many(database, collection, batch)
                    batch = []
            if batch:
                client.insert_many(database, collection, batch)
        finally:
            client.close()

    df.foreachPartition(send)
