"""Optional-connector source actors: HBase, MongoDB, Redis, Arrow Flight.

The reference treats these as jar-gated optional connectors
(reference: etl/source/{HBaseReader,MongoReader,RedisReader,FlightReader}.
scala; Flight explicitly optional per PipelineTest.scala:79-98). For
HBase/Mongo/Redis no pip-native Spark connector exists in this
environment, so those actors own the full option surface + semantics
contract and raise a single clear "unavailable" error from run() when the
underlying format is missing; a cluster with the proper package installed
gets working actors unchanged. Arrow Flight is NOT gated: pyarrow.flight
ships in the base environment, so FlightReader is a real distributed
client (sources/flight.py) exercised end-to-end against a live gRPC
server in tests and under the oracle gate (flight_read_roundtrip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.base import Actor
from ..plans.context import JobContext
from .connectors import _unavailable


class HBaseReader(Actor):
    """Keyed scan → DataFrame. ``columnsMapping`` maps output columns to
    ``cf:cq`` cells with the ``__:rowKey`` pseudo-column; scan bounded by
    keyStart/keyStop/keyPrefix/tsStart/tsEnd
    (reference: etl/source/HBaseReader.scala:12,30-37;
    common/io/HBaseChannel.scala:26,46-108)."""

    connection_table: str | None = None
    connection_restHost: str | None = None
    connection_restPort: int | None = None
    keyStart: str | None = None
    keyStop: str | None = None
    keyPrefix: str | None = None
    tsStart: str | None = None
    tsEnd: str | None = None
    ddlSchemaString: str | None = None

    def columns_mapping(self) -> dict[str, str]:
        return {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("columnsMapping.")
        }

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.connection_table:
            raise ValueError("HBaseReader: 'connection.table' required")
        try:
            reader = spark.read.format("org.apache.hadoop.hbase.spark").option(
                "hbase.table", self.connection_table
            )
            for k in ("keyStart", "keyStop", "keyPrefix", "tsStart", "tsEnd"):
                v = getattr(self, k)
                if v is not None:
                    reader = reader.option(k, str(v))
            df = reader.load()
            df.schema  # jar absence surfaces lazily — force analysis  # noqa: B018
            return df
        except Exception as e:  # noqa: BLE001
            # jar absent: when connection.restHost points at the
            # deployment's REST (Stargate) server, scan over HTTP —
            # columnsMapping (__:rowKey pseudo-column), key bounds, and
            # ts bounds preserved (sources/stargate.py); range-sliced
            # scanners give the same region-parallel scan model
            if self.connection_restHost:
                from .stargate import read_table

                try:
                    return read_table(
                        spark,
                        self.connection_restHost,
                        int(self.connection_restPort or 8080),
                        self.connection_table,
                        self.columns_mapping(),
                        ddl=self.ddlSchemaString,
                        key_start=self.keyStart,
                        key_stop=self.keyStop,
                        key_prefix=self.keyPrefix,
                        ts_start=int(self.tsStart) if self.tsStart else None,
                        ts_end=int(self.tsEnd) if self.tsEnd else None,
                    )
                except (ConnectionError, OSError) as wire_err:
                    raise _unavailable("hbase", wire_err) from e
            raise _unavailable("hbase", e) from e


class MongoReader(Actor):
    """Load a collection via the mongo-spark connector; uri assembled from
    host/port/database/collection/user/password
    (reference: etl/source/MongoReader.scala:12,20-34).

    The jar stays preferred when a cluster ships it; without it the
    engine speaks the MongoDB wire protocol itself (sources/bsonwire.py:
    BSON + OP_MSG): the driver samples ``_id`` range boundaries and each
    executor task finds its own ``{_id: {$gte, $lt}}`` slice over its
    own connection — mongo-spark's default range partitioner.
    ``ddlSchemaString`` types the columns."""

    host: str | None = None
    port: int | None = None
    database: str | None = None
    collection: str | None = None
    user: str | None = None
    password: str | None = None
    ddlSchemaString: str | None = None

    def uri(self) -> str:
        auth = f"{self.user}:{self.password}@" if self.user else ""
        return f"mongodb://{auth}{self.host}:{self.port or 27017}"

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.host or not self.database or not self.collection:
            raise ValueError("MongoReader: host/database/collection required")
        try:
            df = (
                spark.read.format("mongodb")
                .option("connection.uri", self.uri())
                .option("database", self.database)
                .option("collection", self.collection)
                .load()
            )
            df.schema  # jar absence surfaces lazily — force analysis  # noqa: B018
            return df
        except Exception as jar_err:  # noqa: BLE001
            from .bsonwire import read_collection

            try:
                return read_collection(
                    spark,
                    self.host,
                    int(self.port or 27017),
                    self.database,
                    self.collection,
                    ddl=self.ddlSchemaString,
                )
            except (ConnectionError, OSError) as wire_err:
                raise _unavailable("mongodb", wire_err) from jar_err


class RedisReader(Actor):
    """Redis hash-table read — a REAL connector (reference:
    etl/source/RedisReader.scala:14,49-66 via the spark-redis jar).
    Prefers the jar when a cluster ships it; without it, falls back to
    the engine's own RESP2 wire client (sources/resp.py): one driver-side
    cursor-paged SCAN lists ``<table>:*`` keys, the key list fans out
    across tasks, and each task pipelines HGETALLs over its own
    connection — the spark-redis partitioning story with the
    executor-side fetch made explicit. ``keyColumn`` surfaces the key
    suffix as a column (spark-redis ``key.column``)."""

    host: str | None = None
    port: int | None = None
    dbNum: int | None = None
    auth: str | None = None
    table: str | None = None
    ddlSchemaString: str | None = None
    keyColumn: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.host or not self.table:
            raise ValueError("RedisReader: host/table required")
        try:
            reader = (
                spark.read.format("org.apache.spark.sql.redis")
                .option("host", self.host)
                .option("port", str(self.port or 6379))
                .option("table", self.table)
            )
            if self.dbNum is not None:
                reader = reader.option("dbNum", str(self.dbNum))
            if self.auth:
                reader = reader.option("auth", self.auth)
            if self.keyColumn:
                reader = reader.option("key.column", self.keyColumn)
            if self.ddlSchemaString:
                reader = reader.schema(T.StructType.fromDDL(self.ddlSchemaString))
            return reader.load()
        except Exception as jar_err:  # noqa: BLE001
            if "DATA_SOURCE_NOT_FOUND" not in str(jar_err) and (
                "ClassNotFound" not in str(jar_err)
            ):
                raise _unavailable("redis", jar_err) from jar_err
        from .resp import read_hashes

        try:
            return read_hashes(
                spark,
                self.host,
                int(self.port or 6379),
                self.table,
                db=int(self.dbNum or 0),
                auth=self.auth,
                ddl=self.ddlSchemaString,
                key_column=self.keyColumn,
            )
        except Exception as e:  # noqa: BLE001
            raise _unavailable("redis", e) from e


class FlightReader(Actor):
    """Arrow Flight endpoint read — a REAL connector, not a gate
    (reference: etl/source/FlightReader.scala:10,18-26, which needs the
    external spark-flight-connector jar; here the client is
    pyarrow.flight behind a Python DataSource, sources/flight.py). One
    driver-side GetFlightInfo resolves schema + endpoints; each endpoint
    becomes a scan partition whose task streams its own DoGet — the
    server's sharding IS the scan parallelism."""

    host: str | None = None
    port: int | None = None
    table: str | None = None
    user: str | None = None
    password: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.host or not self.table:
            raise ValueError("FlightReader: host/table required")
        from .flight import register_flight_source

        register_flight_source(spark)
        r = (
            spark.read.format("flight")
            .option("host", self.host)
            .option("port", str(self.port or 32010))
            .option("table", self.table)
        )
        if self.user is not None:
            r = r.option("user", self.user).option("password", self.password or "")
        try:
            return r.load()
        except Exception as e:  # noqa: BLE001
            raise _unavailable("flight", e) from e
