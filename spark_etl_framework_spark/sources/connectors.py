"""Connector source actors: Kafka / Delta / Iceberg (availability-gated).

The semantics are thin over Spark's own connectors (reference delegates the
same way — etl/source/{KafkaReader,DeltaReader,IcebergReader}.scala); what we
own is option plumbing + payload decoding. The container ships none of the
connector jars, so these raise a clear error at run() if the format is
unavailable — the actor contract, option surface, and decode logic are still
unit-testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.base import Actor
from ..plans.context import JobContext


def _unavailable(fmt: str, err: Exception) -> RuntimeError:
    return RuntimeError(
        f"connector format {fmt!r} unavailable (jar not on classpath). "
        f"Add the spark package for it. Underlying: {err}"
    )


def decode_kafka(
    df: DataFrame,
    key_schema: str | None,
    value_schema: str | None,
    key_avro: str | None = None,
    value_avro: str | None = None,
) -> DataFrame:
    """Decode kafka key/value; structs flattened to key.* / value.*, other
    kafka columns prefixed ``__kafka_``
    (reference: etl/common/KafkaReadActor.scala:32-93).

    Spark-JSON DDL schemas decode via from_json (jar-free). Avro schema
    strings prefer spark-avro's ``from_avro`` (reference:
    KafkaReadActor.scala:45,53); when that jar is absent (this sandbox),
    records decode via the pure-Python codec in functions/avro.py — same
    struct shape, same ``key.*``/``value.*`` flatten — including NESTED
    records, arrays, maps, enums and fixed (round 8). Only multi-branch
    non-null unions and recursive named types still need the jar, and
    say so.
    """
    out = df
    meta = [c for c in df.columns if c not in ("key", "value")]
    selects = []
    if key_avro or value_avro:
        def _avro_decode(col, schema_json):
            try:
                from pyspark.sql.avro.functions import from_avro

                c = from_avro(F.col(col), schema_json)
                # the jar's absence surfaces lazily — force analysis now
                df.select(c).schema  # noqa: B018
                return c
            except Exception:  # noqa: BLE001 — AVRO_NOT_LOADED and kin
                from ..functions.avro import py_from_avro

                return py_from_avro(F.col(col), schema_json)

        if key_avro:
            out = out.withColumn("__key", _avro_decode("key", key_avro))
            selects.append(F.col("__key.*"))
        if value_avro:
            out = out.withColumn("__value", _avro_decode("value", value_avro))
            selects.append(F.col("__value.*"))
    if key_schema:
        # a struct DDL ("doc_id bigint" / "a int, b string") decodes via
        # from_json + flatten; a bare type name ("string", "long") means
        # cast-the-raw-key. fromDDL parses BOTH (it returns a plain
        # DataType for a bare type rather than raising), so the dispatch
        # must be an isinstance check, not try/except.
        try:
            kt = T.StructType.fromDDL(key_schema)
        except Exception:  # noqa: BLE001
            kt = None
        if not isinstance(kt, T.StructType):
            kt = None
        if kt is not None:
            out = out.withColumn("__key", F.from_json(F.col("key").cast("string"), kt))
            selects.append(F.col("__key.*"))
        else:
            selects.append(F.col("key").cast(key_schema).alias("key"))
    elif not key_avro:
        selects.append(F.col("key"))
    if value_schema:
        vt = T.StructType.fromDDL(value_schema)
        out = out.withColumn("__value", F.from_json(F.col("value").cast("string"), vt))
        selects.append(F.col("__value.*"))
    elif not value_avro:
        selects.append(F.col("value"))
    selects += [F.col(c).alias(f"__kafka_{c}") for c in meta]
    return out.select(*selects)


class KafkaReader(Actor):
    """Batch-read a topic (reference: etl/source/KafkaReader.scala:9-18).

    The spark-sql-kafka jar stays preferred when a cluster ships it;
    without it the engine speaks the Kafka wire protocol itself
    (sources/kwire.py): Metadata for the partition list, ListOffsets for
    the earliest/latest bounds, and one executor task per Kafka
    partition fetching RecordBatch-v2 frames over its own connection —
    the same relation schema and partition→task scale model as the
    jar."""

    bootstrapServers: str | None = None
    topic: str | None = None
    keySchema: str | None = None
    valueSchema: str | None = None
    #: Avro schema JSON for key/value payloads (reference accepts avro
    #: key/value schemas, KafkaActor.scala:21-46) — decoded by spark-avro
    #: when the jar is present, else the pure-Python codec in
    #: functions/avro.py (nested records/arrays/maps/enums/fixed included)
    keyAvro: str | None = None
    valueAvro: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.bootstrapServers or not self.topic:
            raise ValueError("KafkaReader: 'bootstrapServers' and 'topic' required")
        try:
            df = (
                spark.read.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrapServers)
                .option("subscribe", self.topic)
                .load()
            )
            df.schema  # jar absence surfaces lazily — force analysis  # noqa: B018
        except Exception:  # noqa: BLE001
            from .kwire import read_topic

            df = read_topic(spark, self.bootstrapServers, self.topic)
        return decode_kafka(
            df,
            self.keySchema,
            self.valueSchema,
            key_avro=self.keyAvro,
            value_avro=self.valueAvro,
        )


class DeltaReader(Actor):
    """Read delta by table or path with time-travel options
    (reference: etl/source/DeltaReader.scala:10,18-27).

    The delta jar stays preferred when present; without it (this
    sandbox), path-based reads — including versionAsOf / timestampAsOf —
    go through the engine's own pure-Python transaction-log reader
    (sources/deltalog.py), which replays the REAL ``_delta_log``
    protocol: checkpoint + JSON commits, add/remove reconciliation,
    partition values rebuilt from the log. Catalog-table reads resolve
    ``table=`` through the native warehouse catalog (sources/catalog.py,
    round 8) — the jar's catalog plugin stays preferred when present."""

    table: str | None = None
    path: str | None = None
    #: optional row filter — on the engine-native path simple
    #: ``col <op> literal`` AND-chains also DATA-SKIP: the file list
    #: prunes against each add action's min/max stats before the scan
    #: is planned (deltalog.py:read_delta)
    filter: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        opts = {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("options.")
        }
        try:
            reader = spark.read.format("delta").options(**opts)
            df = reader.table(self.table) if self.table else reader.load(self.path)
            return df.filter(self.filter) if self.filter else df
        except Exception as e:  # noqa: BLE001
            target = self.path
            if not target and self.table:
                from .catalog import resolve_table

                entry = resolve_table(spark, self.table)
                if entry is None or entry["format"] != "delta":
                    raise _unavailable("delta", e) from RuntimeError(
                        f"table {self.table!r} is not in the native catalog "
                        "either — register it (sources/catalog.py:"
                        "register_table) or write it by name first"
                    )
                target = entry["location"]
            if target:
                from .deltalog import read_delta

                v = opts.get("versionAsOf")
                return read_delta(
                    spark,
                    target,
                    version_as_of=int(v) if v is not None else None,
                    timestamp_as_of=opts.get("timestampAsOf"),
                    where=self.filter,
                )
            raise _unavailable("delta", e) from e


class IcebergReader(Actor):
    """Read an iceberg table + optional post-filter
    (reference: etl/source/IcebergReader.scala:12,23-30).

    Jar preferred; without it, path-shaped tables go through the
    engine's pure-Python Iceberg v1 reader (sources/iceberg.py):
    version-hint → metadata JSON → snapshot → Avro manifest list →
    manifests → live parquet files, typed identity-partition values
    broadcast onto the scan. ``options.snapshotId`` /
    ``options.asOfTimestamp`` time-travel like the jar's read options.
    Catalog names resolve through the native warehouse catalog
    (sources/catalog.py, round 8); the jar's SparkCatalog stays
    preferred when present."""

    table: str | None = None
    filter: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.table:
            raise ValueError("IcebergReader: 'table' required")
        opts = {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("options.")
        }
        # branch vs tag exclusivity holds on BOTH paths — checked before
        # either read so a jar session can't silently take both
        if "branch" in opts and "tag" in opts:
            raise ValueError(
                "IcebergReader: pass options.branch OR options.tag, "
                "not both"
            )
        try:
            # every option folds into the jar read exactly as the
            # reference does (etl/source/IcebergReader.scala:26's foldLeft
            # over options) — a ref-pinned or time-travel read must never
            # silently return the current snapshot because the jar path
            # ignored its options
            df = spark.read.format("iceberg").options(**opts).load(self.table)
            df.schema  # jar absence surfaces lazily — force analysis  # noqa: B018
        except Exception as e:  # noqa: BLE001
            target = self.table
            if "/" not in target:
                from .catalog import resolve_table

                entry = resolve_table(spark, target)
                if entry is None or entry["format"] != "iceberg":
                    raise _unavailable("iceberg", e) from RuntimeError(
                        f"table {target!r} is not in the native catalog "
                        "either — register it (sources/catalog.py:"
                        "register_table) or write it by name first"
                    )
                target = entry["location"]
            from .iceberg import read_iceberg

            sid = opts.get("snapshotId")
            ts = opts.get("asOfTimestamp")
            # branch/tag read options (the jar's ref-pinned reads —
            # reference: etl/source/IcebergReader.scala:23-30) resolve
            # through the metadata refs map (iceberg.py:create_ref)
            branch = opts.get("branch")
            tag = opts.get("tag")
            # filter= rides into the native read as `where`, which also
            # DATA-SKIPS: files prune against manifest column bounds
            # before the scan plans (iceberg.py:_prune_files_by_bounds)
            return read_iceberg(
                spark,
                target,
                snapshot_id=int(sid) if sid is not None else None,
                as_of_timestamp=int(ts) if ts is not None else None,
                where=self.filter,
                ref=branch if branch is not None else tag,
            )
        return df.filter(self.filter) if self.filter else df
