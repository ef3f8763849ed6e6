"""Streaming source actors (reference: etl/source/{FileStreamReader,
FlatStreamReader,KafkaStreamReader}.scala).

Shared semantics all reference stream readers implement
(reference: FileStreamReader.scala:31-46): mandatory schema (no streaming
inference), optional ``__timestamp = current_timestamp()`` ingest column
(``addTimestamp``), optional watermark (``watermark.timeField`` +
``watermark.delayThreshold``) for late-data bounds on stateful aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.base import Actor
from ..plans.context import JobContext
from ..sources.file import parse_positional_ddl


class _StreamDecorators(Actor):
    addTimestamp: bool = False
    watermark_timeField: str | None = None
    watermark_delayThreshold: str | None = None

    def decorate(self, df: DataFrame) -> DataFrame:
        if self.addTimestamp:
            df = df.withColumn("__timestamp", F.current_timestamp())
        if self.watermark_timeField and self.watermark_delayThreshold:
            df = df.withWatermark(self.watermark_timeField, self.watermark_delayThreshold)
        return df


class FileStreamReader(_StreamDecorators):
    """``readStream`` over csv/json/parquet/avro/orc with mandatory DDL schema
    (reference: etl/source/FileStreamReader.scala:12,31-46)."""

    format: str = "parquet"
    fileUri: str | None = None
    ddlSchemaString: str | None = None
    DEFERRED_KEYS = ("fileUri",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.fileUri or not self.ddlSchemaString:
            raise ValueError("FileStreamReader: 'fileUri' and 'ddlSchemaString' required")
        options = {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("options.")
        }
        df = (
            spark.readStream.format(self.format)
            .options(**options)
            .schema(T.StructType.fromDDL(self.ddlSchemaString))
            .load(self.fileUri)
        )
        return self.decorate(df)


class FlatStreamReader(_StreamDecorators):
    """Streaming text + positional-field extraction (substr + cast)
    (reference: etl/source/FlatStreamReader.scala:19,55-80)."""

    fileUri: str | None = None
    ddlFieldsString: str | None = None
    row_valueField: str = "row_value"
    DEFERRED_KEYS = ("fileUri",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.fileUri:
            raise ValueError("FlatStreamReader: 'fileUri' required")
        df = spark.readStream.format("text").load(self.fileUri).withColumnRenamed(
            "value", self.row_valueField
        )
        if self.ddlFieldsString:
            rv = F.col(self.row_valueField)
            df = df.select(
                *[
                    rv.substr(start, length).cast(typ).alias(name)
                    for name, start, length, typ in parse_positional_ddl(
                        self.ddlFieldsString
                    )
                ]
            )
        return self.decorate(df)


class DeltaStreamReader(_StreamDecorators):
    """``readStream`` delta by path (reference: etl/source/DeltaStreamReader.
    scala:14,41-57).

    Jar preferred; without it the engine's own micro-batch source over
    the ``_delta_log`` takes over (sources/deltalog.py:
    DeltaLogStreamReader) — offsets are log versions, each batch reads
    the dataChange add-files of the new commits, one task per file.
    Options pass through (``startingVersion`` int | 'latest';
    ``readChangeFeed=true`` streams TYPED row-level changes —
    ``_change_type``/``_commit_version``/``_commit_timestamp`` — via the
    engine's CDF micro-batch source, delta-spark's streaming
    readChangeFeed surface)."""

    path: str | None = None
    DEFERRED_KEYS = ("path",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.path:
            raise ValueError("DeltaStreamReader: 'path' required")
        cdf = str(
            self._props.get("options.readChangeFeed", "false")
        ).lower() == "true"
        try:
            reader = spark.readStream.format("delta")
            if cdf:
                reader = reader.option("readChangeFeed", "true")
            df = reader.load(self.path)
            df.schema  # jar absence surfaces lazily — force analysis  # noqa: B018
            return self.decorate(df)
        except Exception:  # noqa: BLE001
            from ..sources.deltalog import DeltaLogDataSource
            from ..sources.pysource import register_python_source

            register_python_source(spark, DeltaLogDataSource)
            reader = spark.readStream.format("deltalog").option("path", self.path)
            sv = self._props.get("options.startingVersion")
            if sv is not None:
                reader = reader.option("startingVersion", str(sv))
            if cdf:
                reader = reader.option("readChangeFeed", "true")
            return self.decorate(reader.load())


class IcebergStreamReader(_StreamDecorators):
    """``readStream`` iceberg table (reference: etl/source/IcebergStreamReader.
    scala:12,30-46).

    Jar preferred; without it, path-shaped tables stream through the
    engine's snapshot-log micro-batch source (sources/iceberg.py:
    IcebergLogStreamReader): offsets are snapshot positions, each batch
    reads the data files ADDED by the new snapshots, one task per
    file."""

    table: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sources.connectors import _unavailable

        if not self.table:
            raise ValueError("IcebergStreamReader: 'table' required")
        try:
            df = spark.readStream.format("iceberg").load(self.table)
            df.schema  # jar absence surfaces lazily — force analysis  # noqa: B018
            return self.decorate(df)
        except Exception as e:  # noqa: BLE001
            if "/" not in self.table:
                raise _unavailable("iceberg", e) from e
            from ..sources.iceberg import IcebergLogDataSource
            from ..sources.pysource import register_python_source

            register_python_source(spark, IcebergLogDataSource)
            reader = spark.readStream.format("iceberglog").option(
                "path", self.table
            )
            # pass-through flags: append-only skip options, and
            # readChangeFeed=true (round 12) for the typed row-level
            # change stream — the streaming half of the changelog scan
            for key in (
                "options.readChangeFeed",
                "options.streaming-skip-delete-snapshots",
                "options.streaming-skip-overwrite-snapshots",
            ):
                v = self._props.get(key)
                if v is not None:
                    reader = reader.option(key.split(".", 1)[1], str(v))
            return self.decorate(reader.load())


class RedisStreamReader(_StreamDecorators):
    """``readStream`` a redis stream with DDL schema — a REAL streaming
    source (reference: etl/source/RedisStreamReader.scala:15,61-86 via
    spark-redis; the jar stays preferred). Without the jar, the engine's
    own Redis-Streams micro-batch source takes over
    (sources/resp.py:RedisStreamSourceReader): offsets are per-stream
    last-delivered XADD ids, each batch XRANGEs the (start, end] slice,
    one task per stream key — Kafka's partitioned-log model on the RESP
    wire. The DDL schema names and types the hash fields; wire strings
    cast to the declared types."""

    host: str | None = None
    port: int | None = None
    dbNum: int | None = None
    auth: str | None = None
    streamKey: str | None = None
    ddlSchemaString: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sources.connectors import _unavailable

        if not self.host or not self.streamKey or not self.ddlSchemaString:
            raise ValueError("RedisStreamReader: host/streamKey/ddlSchemaString required")
        try:
            df = (
                spark.readStream.format("redis")
                .option("host", self.host)
                .option("port", str(self.port or 6379))
                .option("stream.keys", self.streamKey)
                .schema(T.StructType.fromDDL(self.ddlSchemaString))
                .load()
            )
            return self.decorate(df)
        except Exception as jar_err:  # noqa: BLE001
            if "DATA_SOURCE_NOT_FOUND" not in str(jar_err) and (
                "ClassNotFound" not in str(jar_err)
            ):
                raise _unavailable("redis", jar_err) from jar_err
        from pyspark.sql import functions as F

        from ..sources.resp import register_redis_stream_source

        register_redis_stream_source(spark)
        schema = T.StructType.fromDDL(self.ddlSchemaString)
        try:
            reader = (
                spark.readStream.format("redisstream")
                .option("host", self.host)
                .option("port", str(self.port or 6379))
                .option("streamKeys", self.streamKey)
                .option("fields", ",".join(f.name for f in schema.fields))
            )
            if self.dbNum is not None:
                reader = reader.option("dbNum", str(self.dbNum))
            if self.auth:
                reader = reader.option("auth", self.auth)
            raw = reader.load()
            df = raw.select(
                "__stream",
                "__entry_id",
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ],
            )
            return self.decorate(df)
        except Exception as e:  # noqa: BLE001
            raise _unavailable("redis", e) from e


class KafkaStreamReader(_StreamDecorators):
    """``readStream`` kafka + payload decode
    (reference: etl/source/KafkaStreamReader.scala:11,24-43).

    Jar preferred; without it the engine's own micro-batch source takes
    over (sources/kwire.py: KafkaStreamSourceReader) — offsets are
    per-partition next-fetch positions exactly like spark-sql-kafka's
    offset JSON, each batch fetches the (start, end] slice with one task
    per Kafka partition, and the relation schema is identical, so
    ``decode_kafka`` applies unchanged."""

    bootstrapServers: str | None = None
    topic: str | None = None
    keySchema: str | None = None
    valueSchema: str | None = None
    #: Avro schema JSON (nested OK — functions/avro.py), like KafkaReader
    keyAvro: str | None = None
    valueAvro: str | None = None
    startingOffsets: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        from ..sources.connectors import decode_kafka

        if not self.bootstrapServers or not self.topic:
            raise ValueError("KafkaStreamReader: bootstrapServers/topic required")
        try:
            df = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrapServers)
                .option("subscribe", self.topic)
                .load()
            )
            df.schema  # jar absence surfaces lazily — force analysis  # noqa: B018
        except Exception:  # noqa: BLE001
            from ..sources.kwire import KafkaWireDataSource
            from ..sources.pysource import register_python_source

            register_python_source(spark, KafkaWireDataSource)
            df = (
                spark.readStream.format("kafkawire")
                .option("kafka.bootstrap.servers", self.bootstrapServers)
                .option("subscribe", self.topic)
                .option("startingOffsets", self.startingOffsets or "earliest")
                .load()
            )
        return self.decorate(
            decode_kafka(
                df,
                self.keySchema,
                self.valueSchema,
                key_avro=self.keyAvro,
                value_avro=self.valueAvro,
            )
        )
