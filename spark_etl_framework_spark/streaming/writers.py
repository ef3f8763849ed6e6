"""Streaming sink actors (reference: etl/sink/{FileStreamWriter,
KafkaStreamWriter,JdbcStreamWriter}.scala).

Shared contract (reference: FileStreamWriter.scala:35-63): trigger
``continuous|processingTime|once`` (+ interval), ``outputMode``, and a
bounded ``test.waittimeMS`` awaitTermination for deterministic tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter

from ..operators.base import Actor
from ..plans.context import JobContext
from ..sinks.jdbc import rewrite_param_sql


class _StreamWriteBase(Actor):
    trigger_mode: str | None = None  # continuous | processingTime | once
    trigger_interval: str | None = None
    outputMode: str = "append"
    checkpointLocation: str | None = None
    test_waittimeMS: int | None = None
    view: str | None = None

    def apply_trigger(self, writer: DataStreamWriter) -> DataStreamWriter:
        if self.trigger_mode == "continuous":
            return writer.trigger(continuous=self.trigger_interval or "1 second")
        if self.trigger_mode == "processingTime":
            return writer.trigger(processingTime=self.trigger_interval or "0 seconds")
        if self.trigger_mode == "once":
            return writer.trigger(availableNow=True)
        return writer

    def await_(self, query) -> None:
        """Streaming writers are terminal within a job: block until stop or
        the bounded test window elapses (reference: FileStreamWriter.scala:58-61)."""
        if self.test_waittimeMS:
            query.awaitTermination(int(self.test_waittimeMS) / 1000.0)
            query.stop()
        else:
            query.awaitTermination()

    def input_df(self, ctx: JobContext, spark: SparkSession) -> DataFrame:
        if not self.view:
            raise ValueError(f"{type(self).__name__}: input view required")
        return spark.table(self.view)


class FileStreamWriter(_StreamWriteBase):
    format: str = "parquet"
    fileUri: str | None = None
    partitionBy: str | None = None
    DEFERRED_KEYS = ("fileUri",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        df = self.input_df(ctx, spark)
        options = {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("options.")
        }
        writer = df.writeStream.format(self.format).options(**options)
        if self.checkpointLocation:
            writer = writer.option("checkpointLocation", self.checkpointLocation)
        cols = [c.strip() for c in (self.partitionBy or "").split(",") if c.strip()]
        if cols:
            writer = writer.partitionBy(*cols)
        writer = self.apply_trigger(writer).outputMode(self.outputMode)
        self.await_(writer.start(self.fileUri))
        return None


class MemoryStreamWriter(_StreamWriteBase):
    """Write a stream to an in-memory table — the test-bench sink
    (no reference analog; used by our test suite the way the reference uses
    bounded JDBC writes)."""

    queryName: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        df = self.input_df(ctx, spark)
        writer = df.writeStream.format("memory").queryName(self.queryName or self.view)
        writer = self.apply_trigger(writer).outputMode(self.outputMode)
        q = writer.start()
        q.processAllAvailable()
        q.stop()
        return None


class KafkaStreamWriter(_StreamWriteBase):
    """Jar preferred; without it each micro-batch produces over the
    engine's own wire client (sources/kwire.py) via foreachBatch —
    RecordBatch v2 frames, per-task connections."""

    bootstrapServers: str | None = None
    topic: str | None = None
    #: producer batch compression (none/gzip/snappy/lz4/zstd) — same
    #: surface as the batch KafkaWriter (round 9)
    compressionType: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sinks.connectors import KafkaWriter
        from ..sources.connectors import _unavailable

        codec = KafkaWriter._CODECS.get(
            (self.compressionType or "none").lower()
        )
        if codec is None:
            raise ValueError(
                f"KafkaStreamWriter: unknown compressionType "
                f"{self.compressionType!r}"
            )
        df = self.input_df(ctx, spark)
        try:
            writer = (
                df.writeStream.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrapServers or "")
                .option("topic", self.topic or "")
            )
            if codec:
                writer = writer.option(
                    "kafka.compression.type", self.compressionType
                )
            if self.checkpointLocation:
                writer = writer.option("checkpointLocation", self.checkpointLocation)
            writer = self.apply_trigger(writer).outputMode(self.outputMode)
            self.await_(writer.start())
        except Exception as e:  # noqa: BLE001
            bootstrap, topic = self.bootstrapServers, self.topic
            if not bootstrap or not topic:
                raise _unavailable("kafka", e) from e
            from ..sources.kwire import write_topic

            def _produce_batch(batch_df: DataFrame, _batch_id: int) -> None:
                write_topic(batch_df, bootstrap, topic, compression=codec)

            writer = df.writeStream.foreachBatch(_produce_batch)
            if self.checkpointLocation:
                writer = writer.option("checkpointLocation", self.checkpointLocation)
            writer = self.apply_trigger(writer).outputMode(self.outputMode)
            self.await_(writer.start())
        return None


class DeltaStreamWriter(_StreamWriteBase):
    """``writeStream.format("delta")`` (reference: etl/sink/DeltaStreamWriter.
    scala:14,41-66; outputMode complete/append per :36).

    Jar preferred; without it, path sinks run as foreachBatch commits
    through the pure-Python ``_delta_log`` writer with a ``txn``
    (appId=query id, version=batchId) action per batch — Delta's own
    exactly-once recipe, so a replayed micro-batch after checkpoint
    recovery is a no-op instead of a duplicate."""

    path: str | None = None
    table: str | None = None
    partitionBy: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sources.connectors import _unavailable

        df = self.input_df(ctx, spark)
        try:
            writer = df.writeStream.format("delta")
            if self.checkpointLocation:
                writer = writer.option("checkpointLocation", self.checkpointLocation)
            writer = self.apply_trigger(writer).outputMode(self.outputMode)
            q = writer.toTable(self.table) if self.table else writer.start(self.path)
            self.await_(q)
        except Exception as e:  # noqa: BLE001
            if not self.path or self.outputMode != "append":
                raise _unavailable("delta", e) from e
            from ..sources.deltalog import write_delta

            path = self.path
            cols = [
                c.strip() for c in (self.partitionBy or "").split(",") if c.strip()
            ]
            # restart-stable app id: the checkpoint IS the batch ledger,
            # so key the txn to it (falling back to the sink path)
            txn_app = f"deltastream:{self.checkpointLocation or path}"

            def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
                write_delta(
                    batch_df,
                    path,
                    mode="append",
                    partition_by=cols or None,
                    txn=(txn_app, batch_id),
                    operation="STREAMING UPDATE",
                )

            writer = df.writeStream.foreachBatch(_commit_batch)
            if self.checkpointLocation:
                writer = writer.option("checkpointLocation", self.checkpointLocation)
            writer = self.apply_trigger(writer).outputMode("append")
            self.await_(writer.start())
        return None


class IcebergStreamWriter(_StreamWriteBase):
    """``writeStream.format("iceberg")``; explicitly rejects the continuous
    trigger (reference: etl/sink/IcebergStreamWriter.scala:13,51-70).

    Jar preferred; without it, path-shaped tables run as foreachBatch
    snapshot commits through the pure-Python Iceberg writer
    (sources/iceberg.py) — one append snapshot per micro-batch."""

    table: str | None = None
    tablePartitionedBy: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sources.connectors import _unavailable

        if self.trigger_mode == "continuous":
            raise ValueError("IcebergStreamWriter: continuous trigger not supported")
        df = self.input_df(ctx, spark)
        try:
            writer = df.writeStream.format("iceberg")
            if self.checkpointLocation:
                writer = writer.option("checkpointLocation", self.checkpointLocation)
            writer = self.apply_trigger(writer).outputMode(self.outputMode)
            self.await_(writer.toTable(self.table))
        except Exception as e:  # noqa: BLE001
            if not self.table or "/" not in self.table or self.outputMode != "append":
                raise _unavailable("iceberg", e) from e
            from ..sources.iceberg import write_iceberg

            loc = self.table
            cols = [
                c.strip()
                for c in (self.tablePartitionedBy or "").split(",")
                if c.strip()
            ]

            def _commit_batch(batch_df: DataFrame, _batch_id: int) -> None:
                write_iceberg(batch_df, loc, mode="append",
                              partition_by=cols or None)

            writer = df.writeStream.foreachBatch(_commit_batch)
            if self.checkpointLocation:
                writer = writer.option("checkpointLocation", self.checkpointLocation)
            writer = self.apply_trigger(writer).outputMode("append")
            self.await_(writer.start())
        return None


class ForeachBatchConnectorStreamWriter(_StreamWriteBase):
    """Shared foreachBatch shape for Mongo/Redis/HBase stream sinks: each
    micro-batch re-uses the batch writer actor (checkpointLocation mandatory —
    reference: etl/sink/{Mongo,Redis}StreamWriter.scala:76-81)."""

    #: dotted path (or registry alias) of the batch sink actor to apply
    batchWriter: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..plans.registry import resolve_actor

        if not self.checkpointLocation:
            raise ValueError(f"{type(self).__name__}: checkpointLocation mandatory")
        if not self.batchWriter:
            raise ValueError(f"{type(self).__name__}: 'batchWriter' required")
        df = self.input_df(ctx, spark)
        actor_cls = resolve_actor(self.batchWriter)
        props = {
            k.split(".", 1)[1]: v for k, v in self._props.items() if k.startswith("sink.")
        }

        def write_batch(bdf: DataFrame, batch_id: int) -> None:
            view = f"__stream_batch_{batch_id}"
            bdf.createOrReplaceTempView(view)
            actor_cls(**props, view=view).run(ctx, bdf.sparkSession)

        writer = (
            df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", self.checkpointLocation)
        )
        writer = self.apply_trigger(writer).outputMode(self.outputMode)
        self.await_(writer.start())
        return None


class JdbcStreamWriter(_StreamWriteBase):
    """foreachBatch → partition-bounded DBAPI batch upserts with the
    ``@field`` parameterized statement + implicit ``@batchId``
    (reference: etl/sink/JdbcStreamWriter.scala:61-86,
    JdbcMicroBatchWriter.scala:17-34, JdbcContinuousWriter.scala:189-191).

    The reference's per-row continuous ``foreach`` writer is deliberately
    folded into foreachBatch: row-at-a-time DBAPI from Python is the
    non-scalable path; batched upserts preserve the semantics (idempotence
    via batchId) at executor-side batch speed.
    """

    sinkStatement: str | None = None
    numPartitions: int | None = None
    batchSize: int | None = None
    connect: str | None = None
    DEFERRED_KEYS = ("sinkStatement",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..functions.registration import load_class

        df = self.input_df(ctx, spark)
        if not self.sinkStatement or not self.connect:
            raise ValueError("JdbcStreamWriter: 'sinkStatement' and 'connect' required")
        sql, fields = rewrite_param_sql(self.sinkStatement)
        batch = int(self.batchSize or ctx.pipeline.io_batch_size)
        n_conn = int(self.numPartitions or ctx.pipeline.io_connections)
        connect_path = self.connect
        conn_opts = {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("connection.")
        }

        def write_batch(bdf: DataFrame, batch_id: int) -> None:
            def write_partition(rows) -> None:
                connect = load_class(connect_path)
                try:
                    conn = connect(conn_opts)
                except TypeError:
                    conn = connect()
                try:
                    cur = conn.cursor()
                    buf = []
                    for row in rows:
                        d = row.asDict()
                        d["batchId"] = batch_id
                        buf.append(tuple(d.get(f) for f in fields))
                        if len(buf) >= batch:
                            cur.executemany(sql, buf)
                            conn.commit()
                            buf = []
                    if buf:
                        cur.executemany(sql, buf)
                        conn.commit()
                finally:
                    conn.close()

            if bdf.rdd.getNumPartitions() > n_conn:
                bdf = bdf.coalesce(n_conn)
            bdf.foreachPartition(write_partition)

        writer = df.writeStream.foreachBatch(write_batch)
        if self.checkpointLocation:
            writer = writer.option("checkpointLocation", self.checkpointLocation)
        writer = self.apply_trigger(writer).outputMode(self.outputMode)
        self.await_(writer.start())
        return None
