"""Redis wire protocol (RESP2) — a real client, no driver package needed.

The reference reaches Redis through the spark-redis jar (reference:
etl/source/RedisReader.scala:14,49-66, etl/sink/RedisWriter.scala); that
jar is absent here, but Redis' wire protocol is ~200 lines of sockets:
RESP2 encodes every command as an array of bulk strings and replies with
one of five type-tagged frames. This module implements exactly that —
enough for the spark-redis HASH table model (one hash per row at key
``<table>:<id>``, fields = columns) that the reader/writer actors use:

- :class:`RespClient`: connect/auth/select, single commands and
  pipelines (one syscall for N commands — the batch shape the writer
  uses per partition);
- :class:`MiniRedisServer`: an in-process dev/test server speaking the
  same wire (PING/AUTH/SELECT/HSET/HGETALL/SCAN/KEYS/DEL/DBSIZE/
  FLUSHDB), so the connector is e2e-testable against a REAL socket
  without a redis binary. NOT a production server.

Scale: the reader SCANs the keyspace once on the driver (keys only,
cursor-paged), then fans the key list out to executors — each task opens
its own connection and pipelines HGETALLs for its shard. That is the
spark-redis partitioning story with the executor-side fetch made
explicit.
"""

from __future__ import annotations

import socket
import threading


class RespError(Exception):
    pass


def _encode(args: tuple) -> bytes:
    out = [f"*{len(args)}\r\n".encode()]
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out.append(f"${len(b)}\r\n".encode())
        out.append(b)
        out.append(b"\r\n")
    return b"".join(out)


class _Reader:
    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""

    def _recv(self) -> bytes:
        # A peer tearing down mid-read (server stops before client, or
        # vice versa) surfaces as ConnectionResetError/OSError from the
        # blocking recv; in the thread-per-connection server that became
        # an unhandled-thread-exception warning. Normalize to RespError —
        # every reader loop already treats that as clean EOF.
        try:
            return self._sock.recv(65536)
        except (ConnectionResetError, OSError) as e:
            raise RespError(f"connection closed ({e.__class__.__name__})") from e

    def _line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._recv()
            if not chunk:
                raise RespError("connection closed mid-reply")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:
            chunk = self._recv()
            if not chunk:
                raise RespError("connection closed mid-bulk")
            self._buf += chunk
        data, self._buf = self._buf[:n], self._buf[n + 2 :]
        return data

    def reply(self):
        line = self._line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest.decode()
        if t == b"-":
            raise RespError(rest.decode())
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            return None if n == -1 else self._exact(n).decode()
        if t == b"*":
            n = int(rest)
            return None if n == -1 else [self.reply() for _ in range(n)]
        raise RespError(f"bad RESP type byte {t!r}")


class RespClient:
    def __init__(
        self,
        host: str,
        port: int = 6379,
        db: int = 0,
        auth: str | None = None,
        timeout: float = 30.0,
    ):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._reader = _Reader(self._sock)
        if auth:
            self.command("AUTH", auth)
        if db:
            self.command("SELECT", db)

    def command(self, *args):
        self._sock.sendall(_encode(args))
        return self._reader.reply()

    def pipeline(self, commands: list[tuple]):
        """Send N commands in one write, read N replies — the per-
        partition batch shape (one round trip per batch, not per row)."""
        self._sock.sendall(b"".join(_encode(c) for c in commands))
        return [self._reader.reply() for _ in commands]

    def scan_keys(self, pattern: str) -> list[str]:
        """Full cursor-paged SCAN MATCH pattern (keys only)."""
        keys: list[str] = []
        cursor = "0"
        while True:
            cursor, page = self.command("SCAN", cursor, "MATCH", pattern, "COUNT", 512)
            keys.extend(page)
            if cursor == "0":
                return keys

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# dev/test server
# ---------------------------------------------------------------------------


class MiniRedisServer:
    """In-process RESP2 server over 127.0.0.1:<free port> — the live
    endpoint the connector tests (and the redis_read_roundtrip oracle
    query) run against. Hash-focused command set; thread-per-connection;
    16 databases; optional requirepass."""

    def __init__(self, requirepass: str | None = None):
        self._dbs: list[dict[str, dict[str, str]]] = [dict() for _ in range(16)]
        #: Redis Streams: (db, key) -> append-only [(entry_id, fields)]
        self._streams: dict[tuple, list] = {}
        self._lock = threading.Lock()
        self._pass = requirepass
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(64)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

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
        reader = _Reader(conn)
        db = 0
        authed = self._pass is None
        try:
            while True:
                try:
                    args = reader.reply()
                except (RespError, OSError):
                    return
                if not isinstance(args, list) or not args:
                    conn.sendall(b"-ERR protocol\r\n")
                    continue
                cmd, rest = args[0].upper(), args[1:]
                if cmd == "AUTH":
                    if self._pass is not None and rest and rest[0] == self._pass:
                        authed = True
                        conn.sendall(b"+OK\r\n")
                    else:
                        conn.sendall(b"-ERR invalid password\r\n")
                    continue
                if not authed:
                    conn.sendall(b"-NOAUTH Authentication required.\r\n")
                    continue
                conn.sendall(self._dispatch(cmd, rest, lambda: db) or b"+OK\r\n")
                if cmd == "SELECT":
                    db = int(rest[0])
        except OSError:
            return  # peer went away between reply and send — clean EOF
        finally:
            conn.close()

    def _dispatch(self, cmd: str, rest: list, dbref) -> bytes | None:
        store = self._dbs[dbref()]
        with self._lock:
            if cmd == "PING":
                return b"+PONG\r\n"
            if cmd == "SELECT":
                return b"+OK\r\n" if 0 <= int(rest[0]) < 16 else b"-ERR db\r\n"
            if cmd == "FLUSHDB":
                store.clear()
                return b"+OK\r\n"
            if cmd == "DBSIZE":
                return f":{len(store)}\r\n".encode()
            if cmd == "HSET":
                key, fv = rest[0], rest[1:]
                h = store.setdefault(key, {})
                added = sum(1 for f in fv[::2] if f not in h)
                for f, v in zip(fv[::2], fv[1::2]):
                    h[f] = v
                return f":{added}\r\n".encode()
            if cmd == "HGETALL":
                h = store.get(rest[0], {})
                return _multi([x for kv in h.items() for x in kv])
            if cmd == "DEL":
                n = sum(1 for k in rest if store.pop(k, None) is not None)
                return f":{n}\r\n".encode()
            if cmd == "KEYS":
                return _multi(sorted(k for k in store if _match(rest[0], k)))
            if cmd == "XADD":
                key, eid, fv = rest[0], rest[1], rest[2:]
                entries = self._streams.setdefault((dbref(), key), [])
                if eid == "*":
                    last = int(entries[-1][0].split("-")[0]) if entries else 0
                    eid = f"{last + 1}-0"
                entries.append((eid, dict(zip(fv[::2], fv[1::2]))))
                return _bulk(eid)
            if cmd == "XLEN":
                return f":{len(self._streams.get((dbref(), rest[0]), []))}\r\n".encode()
            if cmd in ("XRANGE", "XREVRANGE"):
                key = rest[0]
                lo, hi = (rest[1], rest[2]) if cmd == "XRANGE" else (rest[2], rest[1])
                count = None
                for i in range(3, len(rest) - 1):
                    if rest[i].upper() == "COUNT":
                        count = int(rest[i + 1])
                entries = self._streams.get((dbref(), key), [])

                def _pid(s, default):
                    if s in ("-", "+"):
                        return default
                    s = s.lstrip("(")
                    ms, _, seq = s.partition("-")
                    return (int(ms), int(seq or 0))

                lo_x = lo.startswith("(")
                lo_t = _pid(lo, (0, 0))
                hi_t = _pid(hi, (1 << 62, 1 << 62))
                sel = [
                    (eid, fields)
                    for eid, fields in entries
                    if (lo_t < _pid(eid, None) if lo_x else lo_t <= _pid(eid, None))
                    and _pid(eid, None) <= hi_t
                ]
                if cmd == "XREVRANGE":
                    sel = sel[::-1]
                if count is not None:
                    sel = sel[:count]
                parts = []
                for eid, fields in sel:
                    flat = _multi([x for kv in fields.items() for x in kv])
                    parts.append(b"*2\r\n" + _bulk(eid) + flat)
                return f"*{len(sel)}\r\n".encode() + b"".join(parts)
            if cmd == "SCAN":
                cursor = int(rest[0])
                pattern = "*"
                count = 10
                for i in range(1, len(rest), 2):
                    if rest[i].upper() == "MATCH":
                        pattern = rest[i + 1]
                    elif rest[i].upper() == "COUNT":
                        count = int(rest[i + 1])
                keys = sorted(store.keys())
                page = [
                    k for k in keys[cursor : cursor + count] if _match(pattern, k)
                ]
                nxt = cursor + count
                nxt_s = "0" if nxt >= len(keys) else str(nxt)
                payload = _bulk(nxt_s) + _multi(page)
                return f"*2\r\n".encode() + payload
            return f"-ERR unknown command '{cmd}'\r\n".encode()

    def table(self, db: int = 0) -> dict:
        with self._lock:
            return {k: dict(v) for k, v in self._dbs[db].items()}

    def shutdown(self) -> None:
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass


def _bulk(s: str) -> bytes:
    b = s.encode()
    return f"${len(b)}\r\n".encode() + b + b"\r\n"


def _multi(items: list[str]) -> bytes:
    return f"*{len(items)}\r\n".encode() + b"".join(_bulk(i) for i in items)


def _match(pattern: str, s: str) -> bool:
    import fnmatch

    return fnmatch.fnmatchcase(s, pattern)


# ---------------------------------------------------------------------------
# DataFrame bridge (the spark-redis HASH table model)
# ---------------------------------------------------------------------------


def read_hashes(
    spark,
    host: str,
    port: int,
    table: str,
    db: int = 0,
    auth: str | None = None,
    ddl: str | None = None,
    key_column: str | None = None,
):
    """Read ``<table>:*`` hashes as a DataFrame. Driver: one cursor-paged
    SCAN for the key list. Executors: the key list repartitions across
    tasks; each task opens ONE connection and pipelines HGETALLs for its
    batch (one round trip per Arrow batch, not per key). ``ddl`` gives
    the typed schema (values cast from the wire strings); without it
    every field is a string column inferred from the first hash.
    ``key_column`` surfaces the key suffix as a column (spark-redis'
    ``key.column``)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    c = RespClient(host, port, db, auth)
    try:
        keys = sorted(c.scan_keys(f"{table}:*"))
        if ddl is None:
            if not keys:
                raise RespError(
                    f"redis table {table!r} is empty and no ddlSchemaString "
                    "was given — cannot infer a schema"
                )
            flat = c.command("HGETALL", keys[0])
            fields = sorted(flat[::2])
            if key_column:
                fields = [key_column] + [f for f in fields if f != key_column]
            schema = T.StructType(
                [T.StructField(f, T.StringType()) for f in fields]
            )
        else:
            schema = T.StructType.fromDDL(ddl)
    finally:
        c.close()
    names = [f.name for f in schema.fields]
    str_schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    kdf = spark.createDataFrame([(k,) for k in keys], "__key string")
    n_parts = max(1, min(16, (len(keys) + 63) // 64))

    def fetch(batches):
        import pandas as pd

        client = RespClient(host, port, db, auth)
        try:
            for pdf in batches:
                ks = list(pdf["__key"])
                if not ks:
                    yield pd.DataFrame(columns=names)
                    continue
                replies = client.pipeline([("HGETALL", k) for k in ks])
                rows = []
                for k, flat in zip(ks, replies):
                    d = dict(zip(flat[::2], flat[1::2]))
                    if key_column and key_column not in d:
                        d[key_column] = k.split(":", 1)[1]
                    rows.append([d.get(n) for n in names])
                yield pd.DataFrame(rows, columns=names)
        finally:
            client.close()

    raw = kdf.repartition(n_parts).mapInPandas(fetch, str_schema)
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def write_hashes(
    df,
    host: str,
    port: int,
    table: str,
    db: int = 0,
    auth: str | None = None,
    key_column: str | None = None,
    overwrite: bool = False,
    batch_size: int = 500,
):
    """Write a DataFrame as ``<table>:<id>`` hashes — one connection per
    partition, HSETs pipelined ``batch_size`` at a time. ``key_column``
    names the id column (its VALUE becomes the key suffix and it is not
    duplicated into the hash); without it each row gets a uuid key.
    ``overwrite`` clears the table's existing keys first (driver-side,
    before any task runs — half-failed overwrites never lose the delete)."""
    cols = df.columns
    if key_column is not None and key_column not in cols:
        raise ValueError(
            f"write_hashes: key column {key_column!r} not in {cols}"
        )
    if overwrite:
        c = RespClient(host, port, db, auth)
        try:
            keys = c.scan_keys(f"{table}:*")
            for i in range(0, len(keys), batch_size):
                c.pipeline([("DEL", k) for k in keys[i : i + batch_size]])
        finally:
            c.close()

    def write_partition(rows):
        import uuid as _uuid

        client = RespClient(host, port, db, auth)
        batch: list[tuple] = []
        try:
            for r in rows:
                suffix = (
                    str(r[key_column]) if key_column else _uuid.uuid4().hex
                )
                fields: list[str] = []
                for name in cols:
                    if name == key_column:
                        continue
                    v = r[name]
                    if v is not None:
                        fields += [name, str(v)]
                if not fields:
                    continue  # an all-null row has no hash representation
                batch.append(("HSET", f"{table}:{suffix}", *fields))
                if len(batch) >= batch_size:
                    client.pipeline(batch)
                    batch = []
            if batch:
                client.pipeline(batch)
        finally:
            client.close()

    df.foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# Redis Streams as a Spark streaming source
# ---------------------------------------------------------------------------


from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _StreamPartition(InputPartition):
    def __init__(self, stream: str, lo: str, hi: str):
        self.stream = stream
        self.lo = lo
        self.hi = hi


class RedisStreamSourceReader(DataSourceStreamReader):
    """Micro-batch reader over Redis Streams — the XADD log IS a
    Kafka-shaped offset space: offsets are per-stream last-delivered
    entry ids, a batch is the (start, end] XRANGE of each stream, and
    one task per stream key preserves per-stream order while
    parallelizing across keys (exactly spark-redis' stream model,
    reference: etl/source/RedisStreamReader.scala:15,61-86)."""

    def __init__(self, options):
        host = options.get("host")
        keys = options.get("streamkeys") or options.get("streamKeys")
        if not host or not keys:
            raise ValueError("redis stream source requires host and streamKeys")
        self._host = host
        self._port = int(options.get("port", "6379"))
        self._db = int(options.get("dbnum", options.get("dbNum", "0")))
        self._auth = options.get("auth")
        self._streams = [k.strip() for k in keys.split(",") if k.strip()]
        self._fields = [
            f.strip() for f in (options.get("fields") or "").split(",") if f.strip()
        ]
        if not self._fields:
            raise ValueError("redis stream source requires a fields option")

    def initialOffset(self):
        return {"ids": {s: "0-0" for s in self._streams}}

    def latestOffset(self):
        c = RespClient(self._host, self._port, self._db, self._auth)
        try:
            out = {}
            for s in self._streams:
                last = c.command("XREVRANGE", s, "+", "-", "COUNT", 1)
                out[s] = last[0][0] if last else "0-0"
            return {"ids": out}
        finally:
            c.close()

    def partitions(self, start, end):
        parts = []
        for s in self._streams:
            lo = start["ids"].get(s, "0-0")
            hi = end["ids"].get(s, "0-0")
            if lo != hi:
                parts.append(_StreamPartition(s, lo, hi))
        return parts

    def read(self, partition):
        c = RespClient(self._host, self._port, self._db, self._auth)
        try:
            entries = c.command(
                "XRANGE", partition.stream, f"({partition.lo}", partition.hi
            )
            for eid, flat in entries:
                d = dict(zip(flat[::2], flat[1::2]))
                yield (
                    partition.stream,
                    eid,
                    *[d.get(f) for f in self._fields],
                )
        finally:
            c.close()

    def commit(self, end) -> None:
        return None


class RedisStreamDataSource(DataSource):
    """``spark.readStream.format("redisstream")`` — options: host, port,
    dbNum, auth, streamKeys (comma-separated), fields (comma-separated
    hash field names; every field arrives as a string column, cast
    downstream)."""

    @classmethod
    def name(cls) -> str:
        return "redisstream"

    def schema(self) -> str:
        fields = [
            f.strip()
            for f in (self.options.get("fields") or "").split(",")
            if f.strip()
        ]
        cols = ", ".join(f"`{f}` string" for f in fields)
        return f"__stream string, __entry_id string{', ' + cols if cols else ''}"

    def streamReader(self, schema) -> RedisStreamSourceReader:
        return RedisStreamSourceReader(self.options)


def register_redis_stream_source(spark) -> None:
    from .pysource import register_python_source

    register_python_source(spark, RedisStreamDataSource)
