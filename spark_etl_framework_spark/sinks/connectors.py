"""Connector sink actors: Kafka / Delta / Iceberg (availability-gated).

(reference: etl/sink/{KafkaWriter,DeltaWriter,IcebergWriter}.scala)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.base import Actor
from ..plans.context import JobContext
from ..sources.connectors import _unavailable


class KafkaWriter(Actor):
    """Produce a view to a topic. Key from field or monotonic id; value from
    field or ``to_json(struct(*))`` (reference: etl/common/KafkaWriteActor.
    scala:33-70)."""

    bootstrapServers: str | None = None
    topic: str | None = None
    keyField: str | None = None
    valueField: str | None = None
    headersField: str | None = None
    view: str | None = None
    #: producer batch compression: none/gzip/snappy/lz4/zstd — the
    #: standard ``compression.type`` producer config on the jar path,
    #: the RecordBatch-v2 attribute codec bits on the wire path
    compressionType: str | None = None

    _CODECS = {"none": 0, "gzip": 1, "snappy": 2, "lz4": 3, "zstd": 4}

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.bootstrapServers or not self.topic or not self.view:
            raise ValueError("KafkaWriter: bootstrapServers/topic/view required")
        codec = self._CODECS.get((self.compressionType or "none").lower())
        if codec is None:
            raise ValueError(
                f"KafkaWriter: unknown compressionType {self.compressionType!r}"
                f" (one of {sorted(self._CODECS)})"
            )
        df = spark.table(self.view)
        ctx.reference(self.view)
        key = (
            F.col(self.keyField).cast("string")
            if self.keyField
            else F.monotonically_increasing_id().cast("string")
        )
        value = (
            F.col(self.valueField).cast("string")
            if self.valueField
            else F.to_json(F.struct(*df.columns))
        )
        cols = [key.alias("key"), value.alias("value")]
        if self.headersField:
            cols.append(F.col(self.headersField).alias("headers"))
        out = df.select(*cols)
        try:
            w = (
                out.write.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrapServers)
                .option("topic", self.topic)
            )
            if codec:
                w = w.option("kafka.compression.type", self.compressionType)
            w.save()
        except Exception as e:  # noqa: BLE001
            # jar absent: produce over the engine's own wire client —
            # per-task connections, RecordBatch v2 frames, one Produce
            # RPC per (task, partition) (sources/kwire.py)
            try:
                from ..sources.kwire import write_topic

                write_topic(out, self.bootstrapServers, self.topic,
                            compression=codec)
            except (ConnectionError, OSError) as wire_err:
                raise _unavailable("kafka", wire_err) from e
        return None


class DeltaWriter(Actor):
    """Delta to table or path; overwrite→saveAsTable, append→insertInto for
    tables — the reference's asymmetric mode contract
    (reference: etl/sink/DeltaWriter.scala:44-47) — plain mode().save for
    paths; partitionBy + bucketBy supported."""

    table: str | None = None
    path: str | None = None
    mode: str = "append"
    partitionBy: str | None = None
    bucketBy_numBuckets: int | None = None
    bucketBy_columns: str | None = None
    view: str | None = None
    #: table-creation option: 'name'|'id' stamps column-mapping metadata
    #: (the delta.columnMapping.mode TBLPROPERTY) — enables metadata-only
    #: RENAME/DROP COLUMN on the created table
    columnMapping: str | None = None
    #: table-creation option (round 11): liquid-clustering columns — the
    #: ``clustering`` writer feature's ``delta.clustering`` domain;
    #: every write range-clusters on these so file stats prune
    clusterBy: str | None = None
    #: table-creation option (round 12): GENERATED ... AS IDENTITY —
    #: ``identityColumn`` names the column (LONG; generated map-side on
    #: the start+k*step lattice, hwm restated per commit); start/step
    #: default 1/1; ``identityAllowExplicit`` makes it BY DEFAULT
    identityColumn: str | None = None
    identityStart: int = 1
    identityStep: int = 1
    identityAllowExplicit: bool = False

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.view or not (self.table or self.path):
            raise ValueError("DeltaWriter: view and table|path required")
        df = spark.table(self.view)
        ctx.reference(self.view)
        ccols = [
            c.strip() for c in (self.clusterBy or "").split(",") if c.strip()
        ]
        cols = [
            c.strip() for c in (self.partitionBy or "").split(",") if c.strip()
        ]
        try:
            if ccols or self.identityColumn:
                # the jar's liquid clustering / identity generation go
                # through v2-writer surfaces not expressible on this v1
                # chain; the native writer owns them
                raise RuntimeError(
                    "clusterBy/identityColumn use the native delta writer"
                )
            writer = df.write.format("delta")
            if self.columnMapping:
                writer = writer.option(
                    "delta.columnMapping.mode", self.columnMapping
                )
            if cols:
                writer = writer.partitionBy(*cols)
            if self.bucketBy_numBuckets and self.bucketBy_columns:
                bcols = [c.strip() for c in self.bucketBy_columns.split(",")]
                writer = writer.bucketBy(int(self.bucketBy_numBuckets), *bcols)
            if self.path:
                writer.mode(self.mode).save(self.path)
            elif self.mode == "overwrite":
                writer.mode("overwrite").saveAsTable(self.table)
            else:
                df.write.format("delta").insertInto(self.table)
        except Exception as e:  # noqa: BLE001
            # jar absent: path writes commit through the pure-Python
            # _delta_log protocol writer (sources/deltalog.py) — real
            # add/remove actions, optimistic-concurrency publish,
            # checkpoints. Table NAMES resolve (or auto-create managed
            # at the warehouse default location) through the native
            # catalog (sources/catalog.py, round 8). bucketBy has no
            # delta-protocol encoding and still needs the jar.
            if self.bucketBy_numBuckets and self.bucketBy_columns:
                raise _unavailable("delta", e) from e
            target = self.path
            if not target:
                from ..sources.catalog import resolve_or_create

                target = resolve_or_create(
                    spark, self.table, "delta", cols or None
                )["location"]
            from ..sources.deltalog import write_delta

            identity = None
            if self.identityColumn:
                identity = {
                    self.identityColumn: {
                        "start": int(self.identityStart),
                        "step": int(self.identityStep),
                        "allow_explicit": bool(self.identityAllowExplicit),
                    }
                }
            write_delta(
                df,
                target,
                mode=self.mode,
                partition_by=cols or None,
                column_mapping=self.columnMapping,
                cluster_by=ccols or None,
                identity_columns=identity,
            )
            return None
        return None


class IcebergWriter(Actor):
    """Iceberg write; ``tablePartitionedBy`` triggers sortWithinPartitions
    before write (reference: etl/sink/IcebergWriter.scala:42-50) so files
    cluster by partition value.

    Jar preferred; without it, path-shaped tables commit through the
    engine's own Iceberg v1 writer (sources/iceberg.py): Avro manifests
    + manifest lists (functions/avro_ocf.py), ``vN.metadata.json`` +
    version-hint flip, identity partitioning from
    ``tablePartitionedBy``. Catalog names resolve (or auto-create
    managed) through the native warehouse catalog (sources/catalog.py,
    round 8); the jar's catalog plugin stays preferred."""

    table: str | None = None
    mode: str = "append"
    tablePartitionedBy: str | None = None
    view: str | None = None
    #: write to a named branch instead of main (round 10 — the spec's
    #: write-audit-publish staging; publish via IcebergDmlActor
    #: fastForward). The jar path maps to its ``branch`` write option.
    branch: str | None = None
    #: STAGE the commit under a wap.id instead of publishing (round 11 —
    #: the spec's session half of write-audit-publish, the jar's
    #: ``spark.wap.id``); publish via IcebergDmlActor cherrypick. The
    #: jar path maps to the session conf.
    wapId: str | None = None
    #: comma-separated WRITE-TIME SORT columns (round 12 — the spec's
    #: sort-orders: rows sort within tasks and the order registers as
    #: the table's default, so footer bounds prune from commit one; the
    #: jar path maps to sortWithinPartitions before the write)
    sortBy: str | None = None

    @staticmethod
    def _split_spec(s: str) -> list[str]:
        """Split on commas OUTSIDE parens — ``tablePartitionedBy`` may
        carry transform expressions like ``bucket(4, id), day(ts)``
        (round 9 hidden partitioning)."""
        out, depth, cur = [], 0, []
        for ch in s:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if "".join(cur).strip():
            out.append("".join(cur).strip())
        return out

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.view or not self.table:
            raise ValueError("IcebergWriter: view and table required")
        df = spark.table(self.view)
        ctx.reference(self.view)
        cols = self._split_spec(self.tablePartitionedBy or "")
        if cols:
            # sort by the SOURCE columns (a transform entry's sort key is
            # its source — transform results cluster with it)
            from ..sources.icetransforms import parse_partition_spec

            sort_cols = [e["source"] for e in parse_partition_spec(cols)]
            df = df.sortWithinPartitions(*sort_cols)
        sort_by = [
            c.strip() for c in (self.sortBy or "").split(",") if c.strip()
        ]
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        try:
            prior_wap = None
            if self.wapId:
                # the jar stages wap.id commits via THIS session conf
                # (plus write.wap.enabled on the table) — set it for the
                # write so a jar session stages instead of publishing.
                # Session conf is shared state: capture any value the
                # user (or a concurrent actor) had set and RESTORE it
                # after the write instead of unconditionally unsetting
                # (round-11 advisor, low).
                prior_wap = spark.conf.get("spark.wap.id", None)
                spark.conf.set("spark.wap.id", str(self.wapId))
            try:
                w = df.write.format("iceberg").mode(self.mode)
                if self.branch:
                    w = w.option("branch", self.branch)
                w.save(self.table)
            finally:
                if self.wapId:
                    if prior_wap is None:
                        spark.conf.unset("spark.wap.id")
                    else:
                        spark.conf.set("spark.wap.id", prior_wap)
        except Exception as e:  # noqa: BLE001
            target = self.table
            if not (os.sep in target or "/" in target):
                # name-shaped: resolve or auto-create managed through the
                # native catalog (sources/catalog.py, round 8)
                from ..sources.catalog import resolve_or_create

                target = resolve_or_create(
                    spark, target, "iceberg", cols or None
                )["location"]
            from ..sources.iceberg import write_iceberg

            write_iceberg(df, target, mode=self.mode,
                          partition_by=cols or None, branch=self.branch,
                          wap_id=self.wapId, sort_by=sort_by or None)
            return None
        return None
