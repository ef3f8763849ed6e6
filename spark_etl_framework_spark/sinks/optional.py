"""Optional-connector sink actors: HBase, MongoDB, Redis, Arrow Flight.

Same gating policy as sources/optional.py. HBaseWriter carries the
reference's behavioral contracts: overwrite = truncate-then-put, rowkey from
concatenated columns or UUID (reference: etl/sink/HBaseWriter.scala:14,20-35;
etl/common/HBaseWriteActor.scala:37-79).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.base import Actor
from ..plans.context import JobContext
from ..sources.connectors import _unavailable


class HBaseWriter(Actor):
    """Jar preferred; with ``connection.restHost`` set, falls back to
    the REST (Stargate) protocol (sources/stargate.py): per-task
    multi-row CellSet PUTs, ``columnsMapping.{col}`` routing to
    ``cf:cq`` (default family ``d``), overwrite = truncate-then-put."""

    mode: str = "merge"  # overwrite = truncate-then-put, merge = put
    connection_table: str | None = None
    connection_restHost: str | None = None
    connection_restPort: int | None = None
    rowKey_columns: str | None = None  # concat source cols; absent → uuid
    rowKey_concatenator: str = ""
    view: str | None = None

    def prepared_df(self, df: DataFrame) -> DataFrame:
        """Attach the ``__:rowKey`` column (concatenated cols or UUID —
        reference: HBaseWriteActor.scala:69-71)."""
        if self.rowKey_columns:
            cols = [c.strip() for c in self.rowKey_columns.split(",")]
            key = F.concat_ws(self.rowKey_concatenator, *[F.col(c).cast("string") for c in cols])
        else:
            key = F.expr("uuid()")
        return df.withColumn("__rowKey", key)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.connection_table or not self.view:
            raise ValueError("HBaseWriter: 'connection.table' and view required")
        df = self.prepared_df(spark.table(self.view))
        ctx.reference(self.view)
        try:
            (
                df.write.format("org.apache.hadoop.hbase.spark")
                .option("hbase.table", self.connection_table)
                .option("hbase.truncate", str(self.mode == "overwrite").lower())
                .save()
            )
        except Exception as e:  # noqa: BLE001
            if self.connection_restHost:
                from ..sources.stargate import StargateClient, write_table

                try:  # probe driver-side so an unreachable server errors clearly
                    StargateClient(
                        self.connection_restHost,
                        int(self.connection_restPort or 8080),
                    )._request("GET", "/version/cluster")
                except (ConnectionError, OSError) as wire_err:
                    raise _unavailable("hbase", wire_err) from e
                mapping = {
                    k.split(".", 1)[1]: str(v)
                    for k, v in self._props.items()
                    if k.startswith("columnsMapping.")
                }
                write_table(
                    df,
                    self.connection_restHost,
                    int(self.connection_restPort or 8080),
                    self.connection_table,
                    columns_mapping=mapping or None,
                    truncate=self.mode == "overwrite",
                )
                return None
            raise _unavailable("hbase", e) from e
        return None


class MongoWriter(Actor):
    """Jar preferred; without it, per-task batched OP_MSG inserts over
    the engine's own wire client (sources/bsonwire.py) — ``overwrite``
    drops the collection first, ``idColumn`` becomes ``_id``."""

    host: str | None = None
    port: int | None = None
    database: str | None = None
    collection: str | None = None
    user: str | None = None
    password: str | None = None
    mode: str = "append"
    view: str | None = None
    idColumn: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.host or not self.database or not self.collection or not self.view:
            raise ValueError("MongoWriter: host/database/collection/view required")
        df = spark.table(self.view)
        ctx.reference(self.view)
        auth = f"{self.user}:{self.password}@" if self.user else ""
        try:
            (
                df.write.format("mongodb")
                .option("connection.uri", f"mongodb://{auth}{self.host}:{self.port or 27017}")
                .option("database", self.database)
                .option("collection", self.collection)
                .mode(self.mode)
                .save()
            )
        except Exception as e:  # noqa: BLE001
            from ..sources.bsonwire import MongoWireClient, write_collection

            try:  # probe driver-side so an unreachable server errors clearly
                MongoWireClient(self.host, int(self.port or 27017)).close()
            except (ConnectionError, OSError) as wire_err:
                raise _unavailable("mongodb", wire_err) from e
            write_collection(
                df,
                self.host,
                int(self.port or 27017),
                self.database,
                self.collection,
                mode=self.mode,
                id_column=self.idColumn,
            )
        return None


class RedisWriter(Actor):
    """Redis hash-table write — a REAL connector (reference:
    etl/sink/RedisWriter.scala via the spark-redis jar). Prefers the jar;
    without it, the RESP2 fallback (sources/resp.py:write_hashes) opens
    one connection per partition and pipelines HSETs in batches;
    ``keyColumn`` names the id column (spark-redis ``key.column``),
    overwrite clears the table's keys driver-side before any task runs."""

    host: str | None = None
    port: int | None = None
    dbNum: int | None = None
    auth: str | None = None
    table: str | None = None
    mode: str = "append"
    view: str | None = None
    keyColumn: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.host or not self.table or not self.view:
            raise ValueError("RedisWriter: host/table/view required")
        if self.mode not in ("append", "overwrite"):
            raise ValueError(f"RedisWriter: mode must be append|overwrite, got {self.mode!r}")
        df = spark.table(self.view)
        ctx.reference(self.view)
        try:
            writer = (
                df.write.format("org.apache.spark.sql.redis")
                .option("host", self.host)
                .option("port", str(self.port or 6379))
                .option("table", self.table)
                .mode(self.mode)
            )
            if self.auth:
                writer = writer.option("auth", self.auth)
            if self.keyColumn:
                writer = writer.option("key.column", self.keyColumn)
            writer.save()
            return None
        except Exception as jar_err:  # noqa: BLE001
            if "DATA_SOURCE_NOT_FOUND" not in str(jar_err) and (
                "ClassNotFound" not in str(jar_err)
            ):
                raise _unavailable("redis", jar_err) from jar_err
        from ..sources.resp import write_hashes

        try:
            write_hashes(
                df,
                self.host,
                int(self.port or 6379),
                self.table,
                db=int(self.dbNum or 0),
                auth=self.auth,
                key_column=self.keyColumn,
                overwrite=self.mode == "overwrite",
            )
        except Exception as e:  # noqa: BLE001
            raise _unavailable("redis", e) from e
        return None


class FlightWriter(Actor):
    """Arrow Flight write — a REAL connector (sources/flight.py): one
    DoPut stream per task, so the sink parallelism is the DataFrame's
    partitioning (reference: etl/sink/FlightWriter.scala via the
    external jar). Only append: replacement semantics belong to the
    server, and the Python DataSource writer rejects overwrite with a
    clear error."""

    host: str | None = None
    port: int | None = None
    table: str | None = None
    mode: str = "append"
    view: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.host or not self.table or not self.view:
            raise ValueError("FlightWriter: host/table/view required")
        df = spark.table(self.view)
        ctx.reference(self.view)
        from ..sources.flight import register_flight_source

        register_flight_source(spark)
        w = (
            df.write.format("flight")
            .option("host", self.host)
            .option("port", str(self.port or 32010))
            .option("table", self.table)
        )
        if getattr(self, "user", None) is not None:
            w = w.option("user", self.user).option(
                "password", getattr(self, "password", "") or ""
            )
        try:
            w.mode(self.mode).save()
        except Exception as e:  # noqa: BLE001
            raise _unavailable("flight", e) from e
        return None
