"""File source actors: FileReader, FlatFileReader, BinaryFileReader.

Reference behavior being re-expressed (NOT translated — the physical reading
is Spark's own parquet/csv/json/text/binary scan):
- FileReader: format whitelist, options, optional DDL schema, multi-URI,
  fallback-to-empty on failure (reference: etl/source/FileReader.scala:17,
  73-119; etl/common/FileReadActor.scala:13-52)
- FlatFileReader: text/fixed-length/delimited with header/trailer splitting
  and a per-file row-number (reference: etl/source/FlatFileReader.scala:18,
  165-320)
- BinaryFileReader: fixed-length binary records via binaryRecords, per-field
  byte-slice extraction (reference: etl/source/BinaryFileReader.scala:13,49-160)
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.base import Actor
from ..plans.context import JobContext

_FORMATS = ("csv", "json", "parquet", "avro", "orc", "text")

log = logging.getLogger(__name__)


#: glob metacharacters Hadoop's FileSystem.globStatus expands — a URI
#: containing any of these must NOT be probed with fs.exists() (which
#: treats the pattern as a literal path and reports "missing" even when
#: matching files exist)
_GLOB_CHARS = frozenset("*?[{")


def _hadoop_exists(spark: SparkSession, uri: str) -> bool:
    """Driver-side existence check through the Hadoop FileSystem API —
    works for any scheme the cluster's Hadoop conf resolves (local, HDFS,
    s3a, ...), exactly the resolution ``spark.read.load`` would use. Glob
    URIs go through ``fs.globStatus`` (``fs.exists`` does not expand
    wildcards, so a literal-path probe of ``data/*.parquet`` would report
    "missing" even when matches exist). Any error (bad scheme, auth)
    counts as "might exist": the real load then runs and reports the real
    failure."""
    try:
        jvm = spark.sparkContext._jvm
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if any(c in uri for c in _GLOB_CHARS):
            matches = fs.globStatus(path)
            # globStatus: null for a non-matching literal parent, empty
            # array for a matching-parent/no-match pattern — both "missing"
            return matches is not None and len(matches) > 0
        return bool(fs.exists(path))
    except Exception:
        return True

#: positional DDL "user:1-9 string" → (name, start, length, type)
_POS_FIELD = re.compile(r"^\s*(\w+)\s*:\s*(\d+)\s*-\s*(\d+)\s+(.+?)\s*$")
#: delimited DDL "user:0 string" → (name, index, type)
_IDX_FIELD = re.compile(r"^\s*(\w+)\s*:\s*(\d+)\s+(.+?)\s*$")


def parse_positional_ddl(ddl: str) -> list[tuple[str, int, int, str]]:
    """Reference's positional mini-schema (etl/common/FlatReadActor.scala:98-114)."""
    out = []
    for part in ddl.split(","):
        m = _POS_FIELD.match(part)
        if not m:
            raise ValueError(f"bad positional field spec: {part!r}")
        out.append((m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)))
    return out


def parse_delimited_ddl(ddl: str) -> list[tuple[str, int, str]]:
    """Reference's delimited-index mini-schema (FlatReadActor.scala:124-140)."""
    out = []
    for part in ddl.split(","):
        m = _IDX_FIELD.match(part)
        if not m:
            raise ValueError(f"bad delimited field spec: {part!r}")
        out.append((m.group(1), int(m.group(2)), m.group(3)))
    return out


class FileReader(Actor):
    """Batch file reader with schema/options/multi-URI/fallback semantics."""

    format: str = "parquet"
    fileUri: str | None = None
    uriSeparator: str = ","
    ddlSchemaString: str | None = None
    ddlSchemaFile: str | None = None
    fallbackRead: bool = False
    fallbackSqlString: str | None = None
    DEFERRED_KEYS = ("fileUri",)

    def _schema(self) -> T.StructType | None:
        if self.ddlSchemaString:
            return T.StructType.fromDDL(self.ddlSchemaString)
        if self.ddlSchemaFile:
            from pathlib import Path

            return T.StructType.fromDDL(Path(self.ddlSchemaFile).read_text())
        return None

    def _options(self) -> dict[str, str]:
        return {
            k.split(".", 1)[1]: str(v)
            for k, v in self._props.items()
            if k.startswith("options.")
        }

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if self.format not in _FORMATS:
            raise ValueError(f"FileReader: unsupported format {self.format!r}")
        if not self.fileUri:
            raise ValueError("FileReader: 'fileUri' required")
        uris = [u.strip() for u in self.fileUri.split(self.uriSeparator) if u.strip()]
        reader = spark.read.format(self.format).options(**self._options())
        schema = self._schema()
        if schema is not None:
            reader = reader.schema(schema)
        has_fallback = bool(
            self.fallbackSqlString or (self.fallbackRead and schema is not None)
        )
        if has_fallback:
            # Pre-check existence driver-side so the expected missing-path
            # case falls back with ONE warning line instead of letting the
            # JVM analyzer log a full FileNotFoundException stack trace
            # (log4j WARN from FileStreamSink.hasMetadata) on a green run.
            missing = [u for u in uris if not _hadoop_exists(spark, u)]
            if missing:
                log.warning(
                    "FileReader: %d of %d input path(s) missing (e.g. %s) — "
                    "using configured fallback without attempting the scan",
                    len(missing), len(uris), missing[0],
                )
                return self._fallback(spark, schema)
        try:
            return reader.load(uris)
        except Exception as e:
            # fallback-to-empty semantics (reference: FileReader.scala:92-119)
            if has_fallback:
                log.warning(
                    "FileReader: load failed (%s: %s) — using configured "
                    "fallback", type(e).__name__, str(e).splitlines()[0],
                )
                return self._fallback(spark, schema)
            raise

    def _fallback(self, spark: SparkSession, schema: T.StructType | None):
        if self.fallbackSqlString:
            return spark.sql(self.fallbackSqlString)
        return spark.createDataFrame([], schema)

    def collect_metrics(self, df: DataFrame) -> dict[str, str]:
        """Per-file row counts (reference: FileReader.scala:109-119)."""
        try:
            rows = (
                df.withColumn("__f", F.input_file_name()).groupBy("__f").count().collect()
            )
            return {r["__f"]: str(r["count"]) for r in rows}
        except Exception:
            return {}


class FlatFileReader(Actor):
    """Text / fixed-positional / delimited flat files with header & trailer
    splitting and an optional per-file row number.

    Split modes (header.* and trailer.* symmetric):
      ``rowNo N`` — first/last N rows per file;
      ``matchRegex`` — rows matching a regex;
      ``matchExpr`` — rows matching a SQL boolean expr over ``row_value``.
    Split-off rows are registered as ``<header.view>``/``<trailer.view>``.

    Row numbering uses monotonically_increasing_id ordering within each input
    file (the reference's partition-offset zipWithIndex,
    DataframeHelper.scala:33-62, gives identical per-file ordering).
    """

    fileUri: str | None = None
    ddlFieldsString: str | None = None  # positional "name:start-len type"
    ddlDelimitedString: str | None = None  # "name:idx type"
    delimiter: str = ","
    row_noField: str | None = None  # add row-number column with this name
    row_valueField: str = "row_value"
    header_rowNo: int | None = None
    header_matchRegex: str | None = None
    header_matchExpr: str | None = None
    header_view: str | None = None
    trailer_rowNo: int | None = None
    trailer_matchRegex: str | None = None
    trailer_matchExpr: str | None = None
    trailer_view: str | None = None
    addInputFile: bool = False
    DEFERRED_KEYS = ("fileUri",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.fileUri:
            raise ValueError("FlatFileReader: 'fileUri' required")
        raw = (
            spark.read.text(self.fileUri)
            .withColumnRenamed("value", self.row_valueField)
            .withColumn("__file", F.input_file_name())
            .withColumn("__mid", F.monotonically_increasing_id())
        )
        w = Window.partitionBy("__file").orderBy("__mid")
        raw = raw.withColumn("__rn", F.row_number().over(w))
        n_per_file = Window.partitionBy("__file")
        raw = raw.withColumn("__n", F.count(F.lit(1)).over(n_per_file))

        body = raw
        rv = F.col(self.row_valueField)
        for kind in ("header", "trailer"):
            row_no = getattr(self, f"{kind}_rowNo")
            regex = getattr(self, f"{kind}_matchRegex")
            expr = getattr(self, f"{kind}_matchExpr")
            view = getattr(self, f"{kind}_view")
            cond = None
            if row_no is not None:
                n = int(row_no)
                cond = (F.col("__rn") <= n) if kind == "header" else (
                    F.col("__rn") > F.col("__n") - n
                )
            elif regex:
                cond = rv.rlike(regex)
            elif expr:
                cond = F.expr(expr)
            if cond is not None:
                part = body.filter(cond).select(self.row_valueField)
                if view:
                    ctx.register_view(view, part)
                body = body.filter(~cond)

        cols = self._formalize(body)
        if self.row_noField:
            cols.append(F.col("__rn").alias(self.row_noField))
        if self.addInputFile:
            cols.append(F.col("__file").alias("input_file"))
        return body.select(*cols)

    def _formalize(self, df: DataFrame) -> list:
        """row_value → typed columns (reference: FlatFileReader.scala:294-320)."""
        rv = F.col(self.row_valueField)
        if self.ddlFieldsString:
            return [
                rv.substr(start, length).cast(typ).alias(name)
                for name, start, length, typ in parse_positional_ddl(self.ddlFieldsString)
            ]
        if self.ddlDelimitedString:
            parts = F.split(rv, re.escape(self.delimiter))
            return [
                F.trim(parts.getItem(idx)).cast(typ).alias(name)
                for name, idx, typ in parse_delimited_ddl(self.ddlDelimitedString)
            ]
        return [rv]


class BinaryFileReader(Actor):
    """Fixed-length binary records → typed columns by byte offsets
    (reference: etl/source/BinaryFileReader.scala:49-87).

    ``recordLength`` slices the input into fixed records (binaryRecords);
    ``ddlFieldsString`` gives byte-positional fields "name:start-len type";
    per-field SQL transforms may reference the raw slice as ``$.``
    (reference: BinaryFileReader.scala:89-160). Whole-file mode (no
    recordLength) reads via the ``binaryFile`` format.
    """

    fileUri: str | None = None
    recordLength: int | None = None
    ddlFieldsString: str | None = None
    rowField: str = "row_value"
    DEFERRED_KEYS = ("fileUri",)

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.fileUri:
            raise ValueError("BinaryFileReader: 'fileUri' required")
        if self.recordLength:
            rdd = spark.sparkContext.binaryRecords(self.fileUri, int(self.recordLength))
            df = spark.createDataFrame(
                rdd.map(lambda b: (bytes(b),)),
                T.StructType([T.StructField(self.rowField, T.BinaryType())]),
            )
        else:
            df = (
                spark.read.format("binaryFile")
                .load(self.fileUri)
                .select(F.col("content").alias(self.rowField), "path")
            )
        if not self.ddlFieldsString:
            return df
        rv = self.rowField
        cols = []
        for name, start, length, typ in parse_positional_ddl(self.ddlFieldsString):
            slice_expr = f"substring({rv}, {start}, {length})"
            transform = self.prop(f"transform.{name}")
            if transform:
                cols.append(F.expr(transform.replace("$.", slice_expr)).alias(name))
            elif typ in ("string", "varchar"):
                cols.append(F.decode(F.expr(slice_expr), "utf-8").cast(typ).alias(name))
            else:
                cols.append(F.decode(F.expr(slice_expr), "utf-8").cast(typ).alias(name))
        return df.select(*cols)
