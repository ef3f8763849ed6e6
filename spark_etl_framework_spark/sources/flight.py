"""Arrow Flight connector — a REAL client, not a gate.

The reference reads/writes Flight endpoints through the external
spark-flight-connector jar (reference: etl/source/FlightReader.scala:10,
18-26, etl/sink/FlightWriter.scala; optional per PipelineTest.scala:
79-98). That jar is absent here — but ``pyarrow.flight`` is not, and
Flight's own contract IS a distributed-scan contract: ``GetFlightInfo``
returns N endpoints, each an independently fetchable stream. This module
maps that 1:1 onto a Spark Python DataSource:

- plan time (driver): one ``GetFlightInfo`` call resolves the schema and
  the endpoint list — each endpoint becomes an ``InputPartition``;
- task time (executor): each task connects to ITS endpoint's location
  (falling back to the origin server when the endpoint names none) and
  streams its ticket's record batches — yielded as Arrow batches straight
  into Spark's columnar ingestion, no pandas hop, no driver bottleneck.

At 100 TB the server shards the dataset across endpoints and the scan
parallelism is exactly the server's sharding; a single-endpoint server
degrades to one task, which is the server's statement about the data,
not a client limitation.

The write path is the same contract reversed: one ``DoPut`` stream per
task (the server sees as many puts as there are partitions), committed
by the engine's task protocol.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _connect(uri: str, user: str | None = None, password: str | None = None):
    import pyarrow.flight as fl

    client = fl.connect(uri)
    opts = None
    if user is not None:
        # basic-auth handshake (the reference's user/password options,
        # FlightReader.scala:18-26)
        token_pair = client.authenticate_basic_token(user, password or "")
        opts = fl.FlightCallOptions(headers=[token_pair])
    return client, opts


class _FlightPartition(InputPartition):
    def __init__(self, locations: list[str], ticket: bytes):
        self.locations = locations
        self.ticket = ticket


class FlightDataSourceReader(DataSourceReader):
    def __init__(self, options):
        host = options.get("host")
        if not host:
            raise ValueError("flight source requires a host option")
        port = int(options.get("port", "32010"))
        table = options.get("table")
        if not table:
            raise ValueError("flight source requires a table option")
        self._uri = f"grpc://{host}:{port}"
        self._user = options.get("user")
        self._password = options.get("password")
        import pyarrow.flight as fl

        client, opts = _connect(self._uri, self._user, self._password)
        try:
            info = client.get_flight_info(
                fl.FlightDescriptor.for_path(table), opts
            )
            self._schema = info.schema
            self._endpoints = [
                (
                    [loc.uri.decode() if isinstance(loc.uri, bytes) else loc.uri
                     for loc in ep.locations],
                    ep.ticket.ticket,
                )
                for ep in info.endpoints
            ]
        finally:
            client.close()

    def arrow_schema(self):
        return self._schema

    def partitions(self):
        return [_FlightPartition(locs, t) for locs, t in self._endpoints]

    def read(self, partition: _FlightPartition) -> Iterator:
        import pyarrow.flight as fl

        # an endpoint naming no location means "fetch from the origin"
        uri = partition.locations[0] if partition.locations else self._uri
        client, opts = _connect(uri, self._user, self._password)
        try:
            reader = client.do_get(fl.Ticket(partition.ticket), opts)
            for chunk in reader:
                yield chunk.data  # Arrow RecordBatch, columnar end-to-end
        finally:
            client.close()


class _FlightCommit(WriterCommitMessage):
    def __init__(self, n_rows: int):
        self.n_rows = n_rows


class FlightDataSourceWriter(DataSourceWriter):
    """One DoPut stream per task; the engine's two-phase task commit
    bounds duplicates to the standard at-least-once of any non-
    transactional sink (the reference's Flight writer has the same
    semantics through the jar)."""

    def __init__(self, options, overwrite: bool):
        self._host = options.get("host")
        self._port = int(options.get("port", "32010"))
        self._table = options.get("table")
        if not self._host or not self._table:
            raise ValueError("flight sink requires host and table options")
        self._user = options.get("user")
        self._password = options.get("password")
        if overwrite:
            raise ValueError(
                "flight sink: overwrite is not part of the DoPut contract; "
                "use append (the server owns replacement semantics)"
            )

    def write(self, rows) -> _FlightCommit:
        import pyarrow as pa
        import pyarrow.flight as fl

        from pyspark.sql.pandas.types import to_arrow_schema

        # rows is an iterator of Rows with a .schema-bearing wrapper only
        # in the arrow path; build batches from tuples against the bound
        # schema provided via the DataSource (set on the instance by
        # FlightDataSource.writer)
        schema = to_arrow_schema(self._spark_schema)
        client, opts = _connect(
            f"grpc://{self._host}:{self._port}", self._user, self._password
        )
        n = 0
        try:
            writer, _ = client.do_put(
                fl.FlightDescriptor.for_path(self._table), schema, opts
            )
            buf: list[tuple] = []
            for r in rows:
                buf.append(tuple(r))
                n += 1
                if len(buf) >= 10_000:
                    writer.write_batch(_to_batch(buf, schema))
                    buf = []
            if buf:
                writer.write_batch(_to_batch(buf, schema))
            writer.close()
        finally:
            client.close()
        return _FlightCommit(n)

    def commit(self, messages) -> None:
        return None

    def abort(self, messages) -> None:
        return None


def _to_batch(rows: list[tuple], schema):
    import pyarrow as pa

    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = [
        pa.array(list(col), type=f.type) for col, f in zip(cols, schema)
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


class FlightDataSource(DataSource):
    """``spark.read.format("flight")`` / ``df.write.format("flight")``
    backed by pyarrow.flight — options: host, port (default 32010),
    table (the flight path), user/password (basic auth)."""

    @classmethod
    def name(cls) -> str:
        return "flight"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        self._reader = FlightDataSourceReader(self.options)
        return from_arrow_schema(self._reader.arrow_schema())

    def reader(self, schema) -> FlightDataSourceReader:
        return getattr(self, "_reader", None) or FlightDataSourceReader(
            self.options
        )

    def writer(self, schema, overwrite: bool) -> FlightDataSourceWriter:
        w = FlightDataSourceWriter(self.options, overwrite)
        w._spark_schema = schema
        return w


def register_flight_source(spark) -> None:
    """Register the Flight Python data source (idempotent).

    Uses the split-registry-safe path (sources/pysource.py:
    register_python_source), and also registers on the ACTIVE session
    when that differs from ``spark``: Spark 4.1's
    ``DataFrameWriter.save`` resolves Python data sources against the
    active session's registry rather than the DataFrame's own (reads
    resolve correctly) — observed with the pipeline runner's per-job
    ``newSession()``, where the read half of a roundtrip succeeded and
    the write half raised DATA_SOURCE_NOT_FOUND until the active session
    knew the source too."""
    from pyspark.sql import SparkSession

    from .pysource import register_python_source

    register_python_source(spark, FlightDataSource)
    active = SparkSession.getActiveSession()
    if active is not None and active is not spark:
        register_python_source(active, FlightDataSource)
