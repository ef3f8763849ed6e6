"""HBase REST (Stargate) protocol in pure Python.

The reference reaches HBase through the hbase-spark connector's direct
RPC (etl/source/HBaseReader.scala:12,30-37, etl/common/io/
HBaseChannel.scala:26,46-108); that path needs the jar plus a ZooKeeper
quorum. Real HBase deployments also expose the REST server ("Stargate"),
a PUBLIC documented HTTP interface: CellSet JSON documents whose row
keys, column names (``cf:cq``) and values travel base64-encoded, stateful
scanners created with PUT returning a Location header and drained with
GET until 204. This module implements that protocol directly:

- :class:`StargateClient` — row PUT (multi-cell), row GET, row DELETE,
  and the scanner lifecycle (create with startRow/endRow/batch, next,
  delete), over ``http.client`` with keep-alive.
- :class:`MiniStargateServer` — an in-process REST server for live e2e
  (ThreadingHTTPServer): per-table sorted row stores, scanner state with
  batch continuation, 204-at-exhaustion — client and server share only
  HTTP bytes.
- :func:`read_table` / :func:`write_table` — the Spark integration: the
  driver key-scans once to sample row-key range boundaries, then each
  executor task opens its OWN scanner over its OWN ``[start, stop)``
  slice (the same region-parallel scan model the jar gets from HBase
  regions); writes go ``foreachPartition`` with one multi-row PUT per
  batch. ``columnsMapping`` (``col -> cf:cq`` with the ``__:rowKey``
  pseudo-column) and DDL casts mirror the reference's channel contract.

100 TB note: scan parallelism = key ranges (regions); boundaries are
driver-side O(tasks); all cell I/O is executor-side and slice-local.
"""

from __future__ import annotations

import base64
import http.client
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _b64(raw: bytes) -> str:
    return base64.b64encode(raw).decode("ascii")


def _unb64(s: str) -> bytes:
    return base64.b64decode(s)


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class StargateError(RuntimeError):
    pass


class StargateClient:
    def __init__(self, host: str, port: int):
        self._conn = http.client.HTTPConnection(host, port, timeout=30)

    def close(self) -> None:
        try:
            self._conn.close()
        except OSError:
            pass

    def _request(
        self, method: str, path: str, body: bytes | None = None
    ) -> tuple[int, dict, bytes]:
        headers = {"Accept": "application/json"}
        if body is not None:
            headers["Content-Type"] = "application/json"
        self._conn.request(method, path, body=body, headers=headers)
        resp = self._conn.getresponse()
        payload = resp.read()
        return resp.status, dict(resp.getheaders()), payload

    def put_rows(self, table: str, rows: dict[str, dict[str, bytes]]) -> None:
        """One multi-row CellSet PUT: {rowKey: {"cf:cq": value}}."""
        now = int(time.time() * 1000)
        doc = {
            "Row": [
                {
                    "key": _b64(rk.encode("utf-8")),
                    "Cell": [
                        {
                            "column": _b64(col.encode("utf-8")),
                            "timestamp": now,
                            "$": _b64(val),
                        }
                        for col, val in cells.items()
                    ],
                }
                for rk, cells in rows.items()
            ]
        }
        status, _h, body = self._request(
            "PUT", f"/{table}/fakerow", json.dumps(doc).encode("utf-8")
        )
        if status != 200:
            raise StargateError(f"put_rows HTTP {status}: {body[:200]!r}")

    def get_row(self, table: str, row: str) -> dict[str, bytes] | None:
        status, _h, body = self._request("GET", f"/{table}/{row}")
        if status == 404:
            return None
        if status != 200:
            raise StargateError(f"get_row HTTP {status}")
        cells: dict[str, bytes] = {}
        for r in json.loads(body)["Row"]:
            for c in r["Cell"]:
                cells[_unb64(c["column"]).decode("utf-8")] = _unb64(c["$"])
        return cells

    def delete_row(self, table: str, row: str) -> None:
        status, _h, _b = self._request("DELETE", f"/{table}/{row}")
        if status not in (200, 404):
            raise StargateError(f"delete_row HTTP {status}")

    def scanner(
        self,
        table: str,
        start_row: str | None = None,
        end_row: str | None = None,
        batch: int = 1000,
        start_time: int | None = None,
        end_time: int | None = None,
    ):
        """Create a stateful scanner and drain it: yields
        (row_key, {column: value}) in key order until the server's 204."""
        spec: dict = {"batch": batch}
        if start_row is not None:
            spec["startRow"] = _b64(start_row.encode("utf-8"))
        if end_row is not None:
            spec["endRow"] = _b64(end_row.encode("utf-8"))
        if start_time is not None:
            spec["startTime"] = start_time
        if end_time is not None:
            spec["endTime"] = end_time
        status, headers, body = self._request(
            "PUT", f"/{table}/scanner", json.dumps(spec).encode("utf-8")
        )
        if status != 201:
            raise StargateError(f"scanner create HTTP {status}: {body[:200]!r}")
        location = headers.get("Location")
        path = location[location.index("/", 8):] if location.startswith("http") else location
        try:
            while True:
                status, _h, body = self._request("GET", path)
                if status == 204:
                    return
                if status != 200:
                    raise StargateError(f"scanner next HTTP {status}")
                for r in json.loads(body)["Row"]:
                    key = _unb64(r["key"]).decode("utf-8")
                    cells = {
                        _unb64(c["column"]).decode("utf-8"): _unb64(c["$"])
                        for c in r["Cell"]
                    }
                    yield key, cells
        finally:
            self._request("DELETE", path)


# ---------------------------------------------------------------------------
# in-process REST server
# ---------------------------------------------------------------------------


class MiniStargateServer:
    """Stargate endpoints over per-table sorted row stores: multi-row
    CellSet PUT, row GET/DELETE, scanner create/next/delete with batch
    continuation and 204 at exhaustion."""

    def __init__(self):
        #: {table: {row_key: {column: (value, ts)}}}
        self._tables: dict[str, dict[str, dict[str, tuple[bytes, int]]]] = {}
        self._scanners: dict[str, list] = {}
        self._batches: dict[str, int] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # noqa: D102 — silence
                return

            def _send(self, status: int, body: bytes = b"", headers=None):
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length", "0"))
                return self.rfile.read(n)

            def do_PUT(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 2 and parts[1] == "scanner":
                    sid = outer._create_scanner(parts[0], json.loads(self._body()))
                    self._send(
                        201, headers={"Location": f"/{parts[0]}/scanner/{sid}"}
                    )
                    return
                if len(parts) == 2:
                    outer._put(parts[0], json.loads(self._body()))
                    self._send(200)
                    return
                self._send(400)

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 3 and parts[1] == "scanner":
                    chunk = outer._next(parts[2])
                    if chunk is None:
                        self._send(204)
                    else:
                        self._send(200, json.dumps(chunk).encode("utf-8"))
                    return
                if len(parts) == 2:
                    row = outer._get(parts[0], parts[1])
                    if row is None:
                        self._send(404)
                    else:
                        self._send(200, json.dumps(row).encode("utf-8"))
                    return
                self._send(400)

            def do_DELETE(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 3 and parts[1] == "scanner":
                    with outer._lock:
                        outer._scanners.pop(parts[2], None)
                    self._send(200)
                    return
                if len(parts) == 2:
                    outer._delete(parts[0], parts[1])
                    self._send(200)
                    return
                self._send(400)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    def shutdown(self) -> None:
        self._httpd.shutdown()

    def table(self, name: str) -> dict:
        with self._lock:
            return {
                k: {c: v for c, (v, _ts) in cells.items()}
                for k, cells in self._tables.get(name, {}).items()
            }

    # -- handlers ------------------------------------------------------

    def _put(self, table: str, doc: dict) -> None:
        with self._lock:
            t = self._tables.setdefault(table, {})
            for r in doc["Row"]:
                key = _unb64(r["key"]).decode("utf-8")
                cells = t.setdefault(key, {})
                for c in r["Cell"]:
                    col = _unb64(c["column"]).decode("utf-8")
                    ts = int(c.get("timestamp") or time.time() * 1000)
                    cells[col] = (_unb64(c["$"]), ts)

    def _get(self, table: str, row: str) -> dict | None:
        with self._lock:
            cells = self._tables.get(table, {}).get(row)
        if cells is None:
            return None
        return {
            "Row": [
                {
                    "key": _b64(row.encode("utf-8")),
                    "Cell": [
                        {"column": _b64(c.encode("utf-8")), "timestamp": ts,
                         "$": _b64(v)}
                        for c, (v, ts) in sorted(cells.items())
                    ],
                }
            ]
        }

    def _delete(self, table: str, row: str) -> None:
        with self._lock:
            self._tables.get(table, {}).pop(row, None)

    def _create_scanner(self, table: str, spec: dict) -> str:
        start = _unb64(spec["startRow"]).decode("utf-8") if "startRow" in spec else ""
        end = _unb64(spec["endRow"]).decode("utf-8") if "endRow" in spec else None
        t0 = spec.get("startTime")
        t1 = spec.get("endTime")
        with self._lock:
            rows = sorted(self._tables.get(table, {}).items())
            out = []
            for key, cells in rows:
                if key < start or (end is not None and key >= end):
                    continue
                vis = {
                    c: (v, ts)
                    for c, (v, ts) in cells.items()
                    if (t0 is None or ts >= t0) and (t1 is None or ts < t1)
                }
                if vis:
                    out.append((key, vis))
            sid = uuid.uuid4().hex[:12]
            self._scanners[sid] = out
            self._batches[sid] = int(spec.get("batch", 1000))
        return sid

    def _next(self, sid: str) -> dict | None:
        with self._lock:
            rows = self._scanners.get(sid)
            if not rows:
                self._scanners.pop(sid, None)
                return None
            batch = self._batches.get(sid, 1000)
            chunk, self._scanners[sid] = rows[:batch], rows[batch:]
        return {
            "Row": [
                {
                    "key": _b64(k.encode("utf-8")),
                    "Cell": [
                        {"column": _b64(c.encode("utf-8")), "timestamp": ts,
                         "$": _b64(v)}
                        for c, (v, ts) in sorted(cells.items())
                    ],
                }
                for k, cells in chunk
            ]
        }


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def read_table(
    spark,
    host: str,
    port: int,
    table: str,
    columns_mapping: dict[str, str],
    ddl: str | None = None,
    key_start: str | None = None,
    key_stop: str | None = None,
    key_prefix: str | None = None,
    ts_start: int | None = None,
    ts_end: int | None = None,
    num_partitions: int | None = None,
):
    """Scan ``table`` into a DataFrame through ``columnsMapping``
    (``out_col -> cf:cq``, ``__:rowKey`` for the key) with the
    reference's key/timestamp bounds. The driver samples row-key range
    boundaries with one key scan; each executor task drains its own
    scanner over its own ``[start, stop)`` slice."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if key_prefix is not None:
        key_start = key_prefix
        key_stop = key_prefix + "￿"

    c = StargateClient(host, port)
    try:
        keys = [
            k
            for k, _cells in c.scanner(
                table, key_start, key_stop,
                start_time=ts_start, end_time=ts_end,
            )
        ]
    finally:
        c.close()
    names = list(columns_mapping)
    if ddl is None:
        schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    else:
        schema = T.StructType.fromDDL(ddl)
        missing = [n for n in names if n not in schema.fieldNames()]
        if missing:
            raise ValueError(f"ddl lacks mapped columns: {missing}")
    if not keys:
        return spark.createDataFrame([], schema)

    k = num_partitions or max(1, min(16, (len(keys) + 255) // 256))
    step = (len(keys) + k - 1) // k
    bounds = []
    for i in range(0, len(keys), step):
        lo = keys[i]
        hi = keys[i + step] if i + step < len(keys) else (key_stop or None)
        bounds.append((lo, hi))
    bdf = spark.createDataFrame(bounds, "lo string, hi string").repartition(
        len(bounds)
    )
    mapping = dict(columns_mapping)

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                client = StargateClient(host, port)
                rows = []
                try:
                    for key, cells in client.scanner(
                        table, row.lo, row.hi,
                        start_time=ts_start, end_time=ts_end,
                    ):
                        rows.append(
                            [
                                key
                                if mapping[n] == "__:rowKey"
                                else (
                                    cells[mapping[n]].decode("utf-8")
                                    if mapping[n] in cells
                                    else None
                                )
                                for n in names
                            ]
                        )
                finally:
                    client.close()
                yield pd.DataFrame(rows, columns=names)

    str_schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    raw = bdf.mapInPandas(fetch, str_schema)
    return raw.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name in names
        ]
    )


def write_table(
    df,
    host: str,
    port: int,
    table: str,
    columns_mapping: dict[str, str] | None = None,
    truncate: bool = False,
) -> None:
    """Write rows keyed by the ``__rowKey`` column (HBaseWriter attaches
    it). ``columnsMapping`` routes columns to ``cf:cq``; unmapped columns
    default to family ``d`` with the column name as qualifier.
    ``truncate`` deletes every existing row first (driver-side scan +
    row deletes — REST has no one-shot truncate)."""
    if truncate:
        c = StargateClient(host, port)
        try:
            keys = [key for key, _cells in c.scanner(table)]
            for key in keys:
                c.delete_row(table, key)
        finally:
            c.close()
    cols = [c_ for c_ in df.columns if c_ != "__rowKey"]
    mapping = {c_: (columns_mapping or {}).get(c_, f"d:{c_}") for c_ in cols}

    def send(rows):
        client = StargateClient(host, port)
        try:
            batch: dict[str, dict[str, bytes]] = {}
            for row in rows:
                batch[str(row["__rowKey"])] = {
                    mapping[c_]: str(row[c_]).encode("utf-8")
                    for c_ in cols
                    if row[c_] is not None
                }
                if len(batch) >= 500:
                    client.put_rows(table, batch)
                    batch = {}
            if batch:
                client.put_rows(table, batch)
        finally:
            client.close()

    df.foreachPartition(send)
