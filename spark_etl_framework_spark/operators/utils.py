"""Utility actors + DataFrame helpers (reference: etl/utils/*.scala,
etl/common/{SparkConfActor,VariableSetter}.scala)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.context import JobContext
from .base import Actor


class ViewPartitioner(Actor):
    """repartition(n[, cols]) a view (reference: etl/utils/ViewPartitioner.
    scala:12,28-38) — the explicit partitioning-control knob pipelines use to
    size shuffles before a heavy stage or a fan-in sink."""

    numPartitions: int | None = None
    partitionBy: str | None = None
    view: str | None = None

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        if not self.view or not self.numPartitions:
            raise ValueError("ViewPartitioner: 'view' and 'numPartitions' required")
        ctx.reference(self.view)
        df = spark.table(self.view)
        cols = [c.strip() for c in (self.partitionBy or "").split(",") if c.strip()]
        n = int(self.numPartitions)
        return df.repartition(n, *cols) if cols else df.repartition(n)


class VariableSetter(Actor):
    """Declare variables mid-job for downstream actions
    (reference: etl/common/VariableSetter.scala:9,27); returns no DataFrame."""

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        for k, v in self._props.items():
            ctx.variables[k] = str(v)
        return None


class SparkConfActor(Actor):
    """Set spark/hadoop conf mid-pipeline (reference: etl/common/
    SparkConfActor.scala:9,22-26)."""

    def run(self, ctx: JobContext, spark: SparkSession) -> DataFrame | None:
        for k, v in self._props.items():
            if k.startswith("configs."):
                spark.conf.set(k.split(".", 1)[1], str(v))
            elif k.startswith("hadoopConfigs."):
                spark.sparkContext._jsc.hadoopConfiguration().set(
                    k.split(".", 1)[1], str(v)
                )
        return None


def split_partitions(df: DataFrame, chunk: int) -> list[DataFrame]:
    """Split a DataFrame into chunks of ≤chunk partitions each using
    spark_partition_id — bounds concurrent sink connections
    (reference: etl/utils/DataframeHelper.scala:21-29)."""
    n = df.rdd.getNumPartitions()
    if n <= chunk:
        return [df]
    tagged = df.withColumn("__pid", F.spark_partition_id())
    return [
        tagged.filter((F.col("__pid") >= i) & (F.col("__pid") < i + chunk)).drop("__pid")
        for i in range(0, n, chunk)
    ]


def zip_with_index(
    df: DataFrame, index_col: str = "__id", partition_by: str | None = None
) -> DataFrame:
    """Row-number column (reference: etl/utils/DataframeHelper.scala:33-62).

    Per-group: row_number over (partitionBy, monotonically_increasing_id).
    Global: the partition-offset algorithm — per-partition counts + running
    offset joined back — which avoids the single-partition window that the
    naive global row_number would force (the at-scale concern)."""
    if partition_by:
        w = Window.partitionBy(partition_by).orderBy(F.monotonically_increasing_id())
        return df.withColumn(index_col, F.row_number().over(w))
    tagged = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    offsets = (
        tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.sum("__cnt").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .fillna({"__offset": 0})
    )
    w_in = Window.partitionBy("__pid").orderBy("__mid")
    return (
        tagged.join(F.broadcast(offsets.select("__pid", "__offset")), "__pid")
        .withColumn(index_col, F.row_number().over(w_in) + F.col("__offset"))
        .drop("__pid", "__mid")
    )
